"""Topic-envelope fixture adapter.

The reference's data model is Kafka-shaped topics with 8 implicit columns
(sql-processor internal/server/server.go:829-841; SURVEY.md §1.2):
``_topic _partition _offset _ts _key _value _headers _segment``.

The driver's test tables are plain TPC-H-ish parquet, so this module
*presents* them as deterministic topic tables (FIXTURES.md §1-2). The
envelope is defined ONCE as SQL generated for two dialects — Spark SQL and
DuckDB — so the correctness oracle reproduces it bit-for-bit. That is a
test-fixture concern only: real ingestion assigns ``_offset`` at write time
(streaming/ingest.py) and never needs the window function used here.

Determinism rules (no randomness; every variant keyed off stable ints):
- ``_partition``   = pk % 4
- ``_offset``      = row_number per partition ordered by pk, minus 1
- ``_key``         = natural key as text; NULL on 5% of events rows
  (pk % 20 == 0) to exercise the join empty-key path (server.go:2410-2424)
- ``_value``       = JSON built by string concatenation (NOT to_json) so
  both engines produce identical text; ~2% invalid JSON on events
  (pk % 53 == 52) to exercise json_exists tri-state (server.go:1719-1729)
- ``_headers``     = rendered-JSON string (the reference renders headers as
  a JSON object on output anyway, server.go:2810-2833)
- ``_segment``     = synthetic S3 key, one "segment" per 1000 offsets
"""

from __future__ import annotations

SPARK = "spark"
DUCK = "duck"

#: pinned "now" for LAST-clause determinism (events span 2024-01-01..01-30)
PINNED_NOW = "2024-01-31 00:00:00"

N_PARTITIONS = 4


def _str_t(dialect: str) -> str:
    return "STRING" if dialect == SPARK else "VARCHAR"


def _amount_str(col: str, dialect: str) -> str:
    # identical 2-dp text on both engines via decimal cast
    return f"CAST(CAST({col} AS DECIMAL(18,2)) AS {_str_t(dialect)})"


def events_envelope_sql(dialect: str, events_rel: str = "events") -> str:
    """Envelope SELECT for the `events` topic.

    `_value` exercises every coercion path of the reference's aggregate
    argument handling (server.go:2095-2109): JSON number (70%), numeric
    string (15%), absent (10%), non-numeric string (3%), invalid JSON (~2%).
    """
    s = _str_t(dialect)
    # both dialects see a micros timestamp: DuckDB natively, Spark via the
    # raw-view normalization in topics._register_raw_views (legacy
    # nanos-as-long fixtures are converted there, current fixtures are
    # timestamp[us] already)
    ts = "CAST(ts AS TIMESTAMP)"
    amount = _amount_str("value", dialect)
    # JSON text of the payload, built with concatenation for cross-engine parity
    value_json = (
        "'{\"event_type\":\"' || event_type || '\",\"user_id\":' || CAST(user_id AS "
        + s
        + ") || "
        "CASE "
        "WHEN event_id % 20 IN (1,2,3) THEN ',\"amount\":\"' || " + amount + " || '\"' "
        "WHEN event_id % 20 IN (4,5) THEN '' "
        "WHEN event_id % 20 = 6 THEN ',\"amount\":\"n/a\"' "
        "ELSE ',\"amount\":' || " + amount + " "
        "END || "
        "',\"props\":{\"page\":\"/p/' || CAST(event_id % 50 AS " + s + ") || "
        "'\",\"depth\":' || CAST(event_id % 7 AS " + s + ") || '}' || "
        "',\"flag\":' || CASE WHEN event_id % 2 = 0 THEN 'true' ELSE 'false' END || '}'"
    )
    return f"""
SELECT
  'events' AS _topic,
  CAST(event_id % {N_PARTITIONS} AS INT) AS _partition,
  CAST(ROW_NUMBER() OVER (PARTITION BY event_id % {N_PARTITIONS} ORDER BY event_id) - 1 AS BIGINT) AS _offset,
  {ts} AS _ts,
  CASE WHEN event_id % 20 = 0 THEN NULL ELSE CAST(user_id AS {s}) END AS _key,
  CASE WHEN event_id % 53 = 52 THEN 'not-json{{' ELSE {value_json} END AS _value,
  CASE WHEN event_id % 10 = 9 THEN '{{}}'
       ELSE '{{"source":"fixture","seq":"' || CAST(event_id AS {s}) || '"}}' END AS _headers,
  's3://topics/events/' || CAST(event_id % {N_PARTITIONS} AS {s}) || '/segment-'
    || CAST(CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY event_id % {N_PARTITIONS} ORDER BY event_id) - 1) / 1000.0) AS BIGINT) * 1000 AS {s})
    || '.kfs' AS _segment,
  event_id, ts AS raw_ts, user_id, event_type, value, props
FROM {events_rel}
""".strip()


def orders_envelope_sql(dialect: str, orders_rel: str = "orders") -> str:
    """Envelope for the `orders` topic (join-left side, FIXTURES.md §2.1)."""
    s = _str_t(dialect)
    amount = _amount_str("o_totalprice", dialect)
    spread = "o_orderkey % 86400"  # spread order rows across the day
    if dialect == SPARK:
        ts = f"timestampadd(SECOND, CAST({spread} AS INT), o_orderdate)"
    else:
        ts = f"o_orderdate + INTERVAL ({spread}) SECOND"
    value_json = (
        "'{\"order_id\":\"' || CAST(o_orderkey AS " + s + ") || "
        "'\",\"cust_id\":\"' || CAST(o_custkey AS " + s + ") || "
        "'\",\"status\":\"' || o_orderstatus || "
        "'\",\"amount\":' || " + amount + " || "
        "',\"priority\":\"' || o_orderpriority || "
        "'\",\"nested\":{\"clerk\":\"clerk#' || CAST(o_orderkey % 1000 AS " + s + ") || "
        "'\",\"ship\":{\"mode\":\"RAIL\"}}}'"
    )
    return f"""
SELECT
  'orders' AS _topic,
  CAST(o_orderkey % {N_PARTITIONS} AS INT) AS _partition,
  CAST(ROW_NUMBER() OVER (PARTITION BY o_orderkey % {N_PARTITIONS} ORDER BY o_orderkey) - 1 AS BIGINT) AS _offset,
  {ts} AS _ts,
  CAST(o_orderkey AS {s}) AS _key,
  {value_json} AS _value,
  '{{"source":"fixture","seq":"' || CAST(o_orderkey AS {s}) || '"}}' AS _headers,
  's3://topics/orders/' || CAST(o_orderkey % {N_PARTITIONS} AS {s}) || '/segment-0.kfs' AS _segment,
  o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM {orders_rel}
""".strip()


def payments_envelope_sql(dialect: str, orders_rel: str = "orders") -> str:
    """Envelope for the derived `payments` topic (join-right side,
    FIXTURES.md §2.2): one payment for 80% of orders (o_orderkey % 5 > 0),
    a duplicate-key second payment for 5% (o_orderkey % 20 = 1, exercising
    hash-join fanout server.go:2426-2447), none for the rest (left-join NULL
    extension). `_ts` = order `_ts` + (o_orderkey % 1800) - 900 seconds so a
    `WITHIN 10m` band drops a deterministic subset (server.go:2644-2650).
    """
    s = _str_t(dialect)
    amount = _amount_str("o_totalprice", dialect)
    spread = "o_orderkey % 86400"
    skew = "((o_orderkey % 1800) - 900 + dup.off)"
    if dialect == SPARK:
        ts = f"timestampadd(SECOND, CAST({spread} + {skew} AS INT), o_orderdate)"
        dup_src = "(SELECT 0 AS off UNION ALL SELECT 300 AS off) dup"
    else:
        ts = f"o_orderdate + INTERVAL ({spread} + {skew}) SECOND"
        dup_src = "(SELECT 0 AS off UNION ALL SELECT 300 AS off) dup"
    value_json = (
        "'{\"order_id\":\"' || CAST(o_orderkey AS " + s + ") || "
        "'\",\"amount\":' || " + amount + " || "
        "',\"method\":\"' || CASE o_orderkey % 3 WHEN 0 THEN 'CARD' WHEN 1 THEN 'WIRE' ELSE 'CASH' END || '\"}'"
    )
    return f"""
SELECT
  'payments' AS _topic,
  CAST(o_orderkey % {N_PARTITIONS} AS INT) AS _partition,
  CAST(ROW_NUMBER() OVER (PARTITION BY o_orderkey % {N_PARTITIONS} ORDER BY o_orderkey, dup.off) - 1 AS BIGINT) AS _offset,
  {ts} AS _ts,
  CAST(o_orderkey AS {s}) AS _key,
  {value_json} AS _value,
  '{{"source":"fixture","seq":"' || CAST(o_orderkey AS {s}) || '"}}' AS _headers,
  's3://topics/payments/' || CAST(o_orderkey % {N_PARTITIONS} AS {s}) || '/segment-0.kfs' AS _segment,
  o_orderkey
FROM {orders_rel}
CROSS JOIN {dup_src}
WHERE o_orderkey % 5 > 0 AND (dup.off = 0 OR o_orderkey % 20 = 1)
""".strip()


# -- passthrough topics: every driver table presented as a topic ------------
# (FIXTURES.md §2.4: key = primary key, `_value` = flat JSON of all columns)

#: per-table (pk_expr, [(column, kind)]) where kind ∈ int|double|string|date
PASSTHROUGH_TABLES: dict[str, tuple[str, list[tuple[str, str]]]] = {
    "customer": (
        "c_custkey",
        [
            ("c_custkey", "int"),
            ("c_name", "string"),
            ("c_nationkey", "int"),
            ("c_acctbal", "double"),
            ("c_mktsegment", "string"),
        ],
    ),
    "supplier": (
        "s_suppkey",
        [
            ("s_suppkey", "int"),
            ("s_name", "string"),
            ("s_nationkey", "int"),
            ("s_acctbal", "double"),
        ],
    ),
    "part": (
        "p_partkey",
        [
            ("p_partkey", "int"),
            ("p_name", "string"),
            ("p_brand", "string"),
            ("p_type", "string"),
            ("p_size", "int"),
            ("p_retailprice", "double"),
        ],
    ),
    "nation": (
        "n_nationkey",
        [("n_nationkey", "int"), ("n_name", "string"), ("n_regionkey", "int")],
    ),
    "region": ("r_regionkey", [("r_regionkey", "int"), ("r_name", "string")]),
    "lineitem": (
        "l_orderkey * 10 + l_linenumber",
        [
            ("l_orderkey", "int"),
            ("l_partkey", "int"),
            ("l_suppkey", "int"),
            ("l_linenumber", "int"),
            ("l_quantity", "double"),
            ("l_extendedprice", "double"),
            ("l_discount", "double"),
            ("l_tax", "double"),
            ("l_returnflag", "string"),
            ("l_linestatus", "string"),
            ("l_shipdate", "date"),
        ],
    ),
}


def passthrough_envelope_sql(dialect: str, table: str, rel: str | None = None) -> str:
    """Generic topic envelope: `_key` = pk, `_value` = flat JSON of all
    columns, `_ts` = 2024-01-01 + (pk % 30d) seconds (inside the pinned
    LAST window; FIXTURES.md §1 timestamp rule).

    ``rel`` substitutes the FROM relation (e.g. a repartitioned staging
    view for the materialize path) without changing the emitted columns;
    the default keeps the canonical SQL byte-stable for version hashing
    and the DuckDB oracle twin.

    `_offset`'s ROW_NUMBER orders by (pk, _value) — the `_value`
    tiebreak (r15) makes the order TOTAL when a synthetic pk collides
    (the lineitem fixture carries duplicate ``l_orderkey*10 +
    l_linenumber`` values): without it, offsets among tied rows follow
    physical arrival order, which changes with scan split count — i.e.
    the materialized topic was only deterministic while the source
    scanned as one split. Rows whose pk AND rendered payload are both
    equal remain interchangeable (swapping them is output-identical).
    Both dialect twins share this expression, so Spark and the DuckDB
    oracle stay in lockstep by construction."""
    s = _str_t(dialect)
    pk, cols = PASSTHROUGH_TABLES[table]
    parts = []
    for name, kind in cols:
        if kind == "int":
            parts.append(f"'\"{name}\":' || CAST({name} AS {s})")
        elif kind == "double":
            parts.append(f"'\"{name}\":' || {_amount_str(name, dialect)}")
        elif kind == "date":
            if dialect == SPARK:
                d = f"date_format({name}, 'yyyy-MM-dd HH:mm:ss')"
            else:
                d = f"strftime({name}, '%Y-%m-%d %H:%M:%S')"
            parts.append(f"'\"{name}\":\"' || {d} || '\"'")
        else:
            parts.append(f"'\"{name}\":\"' || {name} || '\"'")
    value_json = "'{' || " + " || ',' || ".join(parts) + " || '}'"
    spread = f"({pk}) % 2592000"
    if dialect == SPARK:
        ts = f"timestampadd(SECOND, CAST({spread} AS INT), TIMESTAMP '2024-01-01 00:00:00')"
    else:
        ts = f"TIMESTAMP '2024-01-01 00:00:00' + INTERVAL ({spread}) SECOND"
    return f"""
SELECT
  '{table}' AS _topic,
  CAST(({pk}) % {N_PARTITIONS} AS INT) AS _partition,
  CAST(ROW_NUMBER() OVER (PARTITION BY ({pk}) % {N_PARTITIONS} ORDER BY {pk}, {value_json}) - 1 AS BIGINT) AS _offset,
  {ts} AS _ts,
  CAST({pk} AS {s}) AS _key,
  {value_json} AS _value,
  '{{"source":"fixture","seq":"' || CAST({pk} AS {s}) || '"}}' AS _headers,
  's3://topics/{table}/' || CAST(({pk}) % {N_PARTITIONS} AS {s}) || '/segment-0.kfs' AS _segment
FROM {rel or table}
""".strip()


def _passthrough_builder(table: str):
    def build(dialect: str, rel: str | None = None) -> str:
        return passthrough_envelope_sql(dialect, table, rel)

    return build


ENVELOPE_BUILDERS = {
    "events": events_envelope_sql,
    "orders": orders_envelope_sql,
    "payments": payments_envelope_sql,
    **{t: _passthrough_builder(t) for t in PASSTHROUGH_TABLES},
}


def envelope_cte(dialect: str) -> str:
    """A WITH-clause body defining all topic views (for oracle SQL)."""
    parts = []
    for name, builder in ENVELOPE_BUILDERS.items():
        parts.append(f"t_{name} AS (\n{builder(dialect)}\n)")
    return ",\n".join(parts)
