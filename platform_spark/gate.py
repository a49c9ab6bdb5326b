"""Correctness-gate query roster.

Each entry pairs a query run through the real engine stack (KAFSQL text →
parser → compiler → DataFrame, or a DataFrame/Spark-SQL program for the
extension operators) with a DuckDB oracle twin. `__spark_entry__.py`
exposes these to the driver.

LAST-clause determinism: the engine clock is pinned to 2024-01-31 00:00:00
UTC (the events table spans 2024-01-01..01-30; FIXTURES.md §3 pins "now").
Orders/payments carry 1992-1998 timestamps, so their windows use LAST 15000d.
"""

from __future__ import annotations

from collections.abc import Callable
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession

from platform_spark import oracles as orc
from platform_spark.sql.engine import KafSqlEngine
from platform_spark.topics import TopicCatalog

NOW = datetime(2024, 1, 31)

_ENGINES: dict[tuple[int, str], KafSqlEngine] = {}


def engine_for(spark: SparkSession, sf_dir: str) -> KafSqlEngine:
    key = (id(spark), sf_dir)
    if key not in _ENGINES:
        catalog = TopicCatalog(spark, sf_dir)
        _ENGINES[key] = KafSqlEngine(catalog, now=NOW)
    return _ENGINES[key]


def catalog_for(spark: SparkSession, sf_dir: str) -> TopicCatalog:
    return engine_for(spark, sf_dir).catalog


def kafsql(stmt: str) -> Callable[[SparkSession, str], DataFrame]:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return engine_for(spark, sf_dir).sql(stmt)

    fn.__doc__ = stmt
    return fn


def _last_lo(days: int) -> str:
    return (NOW - timedelta(days=days)).strftime("%Y-%m-%d %H:%M:%S")


_NOW_S = NOW.strftime("%Y-%m-%d %H:%M:%S")

# ---------------------------------------------------------------------------
# KAFSQL dialect gate (SURVEY.md §2.1-2.8): (query fn, oracle SQL)
# ---------------------------------------------------------------------------

GATE: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def _add(name: str, fn: Callable, oracle: str | None) -> None:
    GATE[name] = (fn, oracle)


# P1/P2/P3 + F4/F5: full star expansion incl. schema-on-read columns
_add(
    "kafsql_select_star",
    kafsql("SELECT * FROM events WHERE _partition = 2 AND _ts <= '2024-01-31 00:00:00' LIMIT 100000"),
    orc.with_topics(
        f"""
SELECT _topic, _partition, _offset,
  {orc.ts('_ts')} AS _ts, {orc.bytea('_key')} AS _key, {orc.bytea('_value')} AS _value,
  _headers, _segment,
  {orc.jval('_value', '$.event_type')} AS event_type,
  {orc.jval('_value', '$.user_id')} AS user_id,
  TRY_CAST({orc.jval('_value', '$.amount')} AS DOUBLE) AS amount,
  TRY_CAST({orc.jval('_value', '$.props.depth')} AS INT) AS depth,
  {orc.jval('_value', '$.props.page')} AS page,
  TRY_CAST({orc.jval('_value', '$.flag')} AS BOOLEAN) AS flag
FROM t_events WHERE _partition = 2"""
    ),
)

# P1 projection + aliasing + schema column as plain field
_add(
    "kafsql_select_project",
    kafsql(
        "SELECT _topic, _partition, _offset, _ts, _key, "
        "json_value(_value, '$.event_type') AS et, depth "
        "FROM events WHERE _partition = 1 AND _ts <= '2024-01-31 00:00:00' LIMIT 100000"
    ),
    orc.with_topics(
        f"""
SELECT _topic, _partition, _offset, {orc.ts('_ts')} AS _ts, {orc.bytea('_key')} AS _key,
  {orc.jval('_value', '$.event_type')} AS et,
  TRY_CAST({orc.jval('_value', '$.props.depth')} AS INT) AS depth
FROM t_events WHERE _partition = 1"""
    ),
)

# P5: offset range filter
_add(
    "kafsql_where_offset",
    kafsql(
        "SELECT _partition, _offset, _key FROM events "
        "WHERE _offset >= 100 AND _offset <= 180 SCAN FULL LIMIT 100000"
    ),
    orc.with_topics(
        f"""
SELECT _partition, _offset, {orc.bytea('_key')} AS _key
FROM t_events WHERE _offset >= 100 AND _offset <= 180"""
    ),
)

# P6: BETWEEN time filter
_add(
    "kafsql_where_ts_between",
    kafsql(
        "SELECT _partition, _offset, _ts FROM events "
        "WHERE _ts BETWEEN '2024-01-05 00:00:00' AND '2024-01-07 12:00:00.500' "
        "LIMIT 100000"
    ),
    orc.with_topics(
        f"""
SELECT _partition, _offset, {orc.ts('_ts')} AS _ts
FROM t_events
WHERE _ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-07 12:00:00.500'"""
    ),
)

# P7: LAST sugar with pinned now
_add(
    "kafsql_last",
    kafsql("SELECT _partition, _offset, _ts FROM events LAST 3d LIMIT 100000"),
    orc.with_topics(
        f"""
SELECT _partition, _offset, {orc.ts('_ts')} AS _ts
FROM t_events
WHERE _ts >= TIMESTAMP '{_last_lo(3)}' AND _ts <= TIMESTAMP '{_NOW_S}'"""
    ),
)

# W1: TAIL in scan order (partition, offset)
_add(
    "kafsql_tail",
    kafsql("SELECT _partition, _offset, _key FROM events TAIL 50"),
    orc.with_topics(
        f"""
SELECT _partition, _offset, {orc.bytea('_key')} AS _key
FROM t_events ORDER BY _partition DESC, _offset DESC LIMIT 50"""
    ),
)

# O1/O3: ORDER BY _ts DESC + LIMIT top-k
_add(
    "kafsql_orderby_topk",
    kafsql(
        "SELECT _offset, _partition, _ts FROM events "
        "WHERE _ts <= '2024-01-31 00:00:00' ORDER BY _ts DESC LIMIT 25"
    ),
    orc.with_topics(
        f"""
SELECT _offset, _partition, {orc.ts('_ts')} AS _ts
FROM t_events WHERE _ts <= TIMESTAMP '2024-01-31 00:00:00'
ORDER BY _ts DESC LIMIT 25"""
    ),
)

# A1/A5/A7/A8: group by partition with typed min/max on _ts
_add(
    "kafsql_agg_partition",
    kafsql(
        "SELECT _partition, count(*) AS cnt, min(_ts) AS earliest, max(_ts) AS latest "
        "FROM events LAST 30d GROUP BY _partition LIMIT 100000"
    ),
    orc.with_topics(
        f"""
SELECT _partition, COUNT(*) AS cnt,
  {orc.ts('MIN(_ts)')} AS earliest, {orc.ts('MAX(_ts)')} AS latest
FROM t_events
WHERE _ts >= TIMESTAMP '{_last_lo(30)}' AND _ts <= TIMESTAMP '{_NOW_S}'
GROUP BY _partition"""
    ),
)

# A2: count(col) counts resolvable values only
_add(
    "kafsql_agg_counts",
    kafsql(
        "SELECT count(*) AS n, count(amount) AS n_amount, count(_key) AS n_key "
        "FROM events LAST 30d"
    ),
    orc.with_topics(
        f"""
SELECT COUNT(*) AS n,
  COUNT(TRY_CAST({orc.jval('_value', '$.amount')} AS DOUBLE)) AS n_amount,
  COUNT(_key) AS n_key
FROM t_events
WHERE _ts >= TIMESTAMP '{_last_lo(30)}' AND _ts <= TIMESTAMP '{_NOW_S}'"""
    ),
)

# A3/A4/A6: SUM/AVG over json_value with numeric-string coercion
_add(
    "kafsql_agg_json_sum",
    kafsql(
        "SELECT event_type, count(*) AS n, "
        "sum(json_value(_value, '$.amount')) AS total, "
        "avg(json_value(_value, '$.amount')) AS av "
        "FROM events LAST 30d GROUP BY event_type LIMIT 100000"
    ),
    orc.with_topics(
        f"""
SELECT {orc.jval('_value', '$.event_type')} AS event_type, COUNT(*) AS n,
  {orc.dsum(orc.jval('_value', '$.amount'))} AS total,
  {orc.davg(orc.jval('_value', '$.amount'))} AS av
FROM t_events
WHERE _ts >= TIMESTAMP '{_last_lo(30)}' AND _ts <= TIMESTAMP '{_NOW_S}'
GROUP BY 1"""
    ),
)

# A5 on a declared double schema column, grouped by a schema string column
_add(
    "kafsql_agg_minmax_schema",
    kafsql(
        "SELECT status, min(amount) AS mn, max(amount) AS mx, count(*) AS n "
        "FROM orders LAST 15000d GROUP BY status LIMIT 100000"
    ),
    orc.with_topics(
        f"""
SELECT {orc.jval('_value', '$.status')} AS status,
  MIN(TRY_CAST({orc.jval('_value', '$.amount')} AS DOUBLE)) AS mn,
  MAX(TRY_CAST({orc.jval('_value', '$.amount')} AS DOUBLE)) AS mx,
  COUNT(*) AS n
FROM t_orders
WHERE _ts >= TIMESTAMP '{_last_lo(15000)}' AND _ts <= TIMESTAMP '{_NOW_S}'
GROUP BY 1"""
    ),
)

# A7 multi-column group key (boolean + string), \\x1f-ordered emit
_add(
    "kafsql_agg_multi_group",
    kafsql(
        "SELECT event_type, flag, count(*) AS n FROM events LAST 30d "
        "GROUP BY event_type, flag LIMIT 100000"
    ),
    orc.with_topics(
        f"""
SELECT {orc.jval('_value', '$.event_type')} AS event_type,
  TRY_CAST({orc.jval('_value', '$.flag')} AS BOOLEAN) AS flag, COUNT(*) AS n
FROM t_events
WHERE _ts >= TIMESTAMP '{_last_lo(30)}' AND _ts <= TIMESTAMP '{_NOW_S}'
GROUP BY 1, 2"""
    ),
)

# F1/F2/F3: JSON helpers incl. json_exists tri-state on invalid JSON
_add(
    "kafsql_json_helpers",
    kafsql(
        "SELECT _offset, _partition, json_value(_value, '$.props.page') AS page, "
        "json_query(_value, '$.props') AS props_json, "
        "json_exists(_value, '$.amount') AS has_amount "
        "FROM events WHERE _partition = 0 AND _ts <= '2024-01-31 00:00:00' LIMIT 100000"
    ),
    orc.with_topics(
        f"""
SELECT _offset, _partition,
  {orc.jval('_value', '$.props.page')} AS page,
  {orc.jquery('_value', '$.props')} AS props_json,
  {orc.jexists('_value', '$.amount')} AS has_amount
FROM t_events WHERE _partition = 0"""
    ),
)

# C2: SHOW PARTITIONS
_add(
    "kafsql_show_partitions",
    lambda spark, sf_dir: engine_for(spark, sf_dir).sql("SHOW PARTITIONS FROM events"),
    "SELECT DISTINCT CAST(event_id % 4 AS INT) AS _partition FROM events",
)

# ---------------------------------------------------------------------------
# Joins (J1-J6)
# ---------------------------------------------------------------------------

_JOIN_LO = _last_lo(15000)

# J1/J3/J4: inner hash equi-join on _key with WITHIN band
_add(
    "kafsql_join_inner",
    kafsql(
        "SELECT o._key AS okey, o._offset AS ooffset, "
        "json_value(o._value, '$.amount') AS oamt, "
        "json_value(p._value, '$.method') AS method, p._offset AS poffset "
        "FROM orders o JOIN payments p ON o._key = p._key WITHIN 10m LAST 15000d "
        "LIMIT 100000"
    ),
    orc.with_topics(
        f"""
SELECT {orc.bytea('o._key')} AS okey, o._offset AS ooffset,
  {orc.jval('o._value', '$.amount')} AS oamt,
  {orc.jval('p._value', '$.method')} AS method, p._offset AS poffset
FROM (SELECT * FROM t_orders
      WHERE _ts >= TIMESTAMP '{_JOIN_LO}' AND _ts <= TIMESTAMP '{_NOW_S}') o
JOIN t_payments p
  ON o._key = p._key
 AND abs(epoch_us(o._ts) - epoch_us(p._ts)) <= 600000000"""
    ),
)

# J2: left outer with NULL right extension
_add(
    "kafsql_join_left",
    kafsql(
        "SELECT o._key AS okey, p._key AS pkey, "
        "json_value(p._value, '$.method') AS method "
        "FROM orders o LEFT JOIN payments p ON o._key = p._key WITHIN 10m "
        "LAST 15000d LIMIT 100000"
    ),
    orc.with_topics(
        f"""
SELECT {orc.bytea('o._key')} AS okey, {orc.bytea('p._key')} AS pkey,
  {orc.jval('p._value', '$.method')} AS method
FROM (SELECT * FROM t_orders
      WHERE _ts >= TIMESTAMP '{_JOIN_LO}' AND _ts <= TIMESTAMP '{_NOW_S}') o
LEFT JOIN t_payments p
  ON o._key = p._key
 AND abs(epoch_us(o._ts) - epoch_us(p._ts)) <= 600000000"""
    ),
)

# J3: JSON-path equality join keys
_add(
    "kafsql_join_json",
    kafsql(
        "SELECT json_value(o._value, '$.order_id') AS oid, "
        "json_value(p._value, '$.method') AS method, p._partition AS ppart "
        "FROM orders o JOIN payments p "
        "ON json_value(o._value, '$.order_id') = json_value(p._value, '$.order_id') "
        "WITHIN 10m LAST 15000d LIMIT 100000"
    ),
    orc.with_topics(
        f"""
SELECT {orc.jval('o._value', '$.order_id')} AS oid,
  {orc.jval('p._value', '$.method')} AS method, p._partition AS ppart
FROM (SELECT * FROM t_orders
      WHERE _ts >= TIMESTAMP '{_JOIN_LO}' AND _ts <= TIMESTAMP '{_NOW_S}') o
JOIN t_payments p
  ON {orc.jval('o._value', '$.order_id')} = {orc.jval('p._value', '$.order_id')}
 AND abs(epoch_us(o._ts) - epoch_us(p._ts)) <= 600000000"""
    ),
)
