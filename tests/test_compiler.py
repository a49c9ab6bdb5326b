"""Compiler semantics tests (modeled on the reference's server_test.go
cases: TestHandleSelectTail:248, TestHandleSelectOrderBy:623,
TestHandleAggregateGroupBy:1393, TestHandleSelectRejectsUnbounded:658)."""

from __future__ import annotations

from datetime import datetime

import pytest

from platform_spark.errors import ValidationError
from platform_spark.sql.engine import KafSqlEngine

NOW = datetime(2024, 1, 31)


@pytest.fixture(scope="module")
def engine(catalog):
    return KafSqlEngine(catalog, now=NOW)


def test_rejects_unbounded(engine):
    with pytest.raises(ValidationError, match="unbounded"):
        engine.sql("SELECT * FROM events")


def test_scan_full_allows_unbounded(engine):
    assert engine.sql("SELECT _offset FROM events SCAN FULL").count() > 0


def test_scan_full_row_cap(engine):
    # SCAN FULL rows cap at max_unbounded_scan=1000 (server.go:1344-1346)
    assert engine.sql("SELECT _offset FROM events SCAN FULL LIMIT 5000").count() == 1000


def test_default_limit(engine):
    n = engine.sql("SELECT _offset FROM events LAST 30d").count()
    assert n == min(1000, 1000)


def test_order_by_only_ts(engine):
    with pytest.raises(ValidationError):
        engine.sql("SELECT _offset FROM events ORDER BY _offset LAST 1d")


def test_tail_conflicts(engine):
    with pytest.raises(ValidationError):
        engine.sql("SELECT count(*) FROM events TAIL 10")


def test_aggregate_bare_column_needs_group_by(engine):
    with pytest.raises(ValidationError):
        engine.sql("SELECT _partition, count(*) FROM events LAST 1d")


def test_star_with_aggregate_rejected(engine):
    with pytest.raises(ValidationError):
        engine.sql("SELECT *, count(*) FROM events LAST 1d")


def test_join_requires_within_and_last(engine):
    with pytest.raises(ValidationError):
        engine.sql("SELECT o._key FROM orders o JOIN payments p LAST 1h")
    with pytest.raises(ValidationError):
        engine.sql("SELECT o._key FROM orders o JOIN payments p WITHIN 5m")


def test_join_rejects_partition_filter(engine):
    with pytest.raises(ValidationError):
        engine.sql(
            "SELECT o._key FROM orders o JOIN payments p WITHIN 5m LAST 1h "
            "WHERE _partition = 1"
        )


def test_tail_returns_scan_order_tail(engine):
    rows = engine.sql("SELECT _partition, _offset FROM events TAIL 5").collect()
    assert len(rows) == 5
    # tail of scan order = highest (partition, offset) pairs
    assert all(r["_partition"] == 3 for r in rows)
    offs = [r["_offset"] for r in rows]
    assert offs == sorted(offs)


def test_order_by_ts_desc(engine):
    rows = engine.sql(
        "SELECT _ts FROM events ORDER BY _ts DESC LIMIT 5 LAST 30d"
    ).collect()
    vals = [r["_ts"] for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_group_output_sorted_by_group_key_string(engine):
    rows = engine.sql(
        "SELECT event_type, count(*) AS n FROM events LAST 30d GROUP BY event_type"
    ).collect()
    keys = [(r["event_type"] if r["event_type"] is not None else "<nil>") for r in rows]
    assert keys == sorted(keys)


def test_sum_numeric_string_coercion(engine, catalog):
    # numeric strings participate in SUM; non-numeric are skipped
    row = engine.sql(
        "SELECT count(*) AS n, count(amount) AS na, "
        "sum(json_value(_value, '$.amount')) AS s FROM events LAST 30d"
    ).collect()[0]
    assert row["n"] > row["na"] > 0  # absent/non-numeric/invalid rows exist
    assert row["s"] is not None and row["s"] > 0


def test_json_exists_tristate(engine):
    rows = engine.sql(
        "SELECT json_exists(_value, '$.event_type') AS e, _value FROM events "
        "WHERE _partition = 0 SCAN FULL LIMIT 1000"
    ).collect()
    vals = {r["e"] for r in rows}
    assert None in vals  # invalid JSON rows → NULL
    assert True in vals


def test_describe_lists_schema_columns(engine):
    rows = engine.sql("DESCRIBE events").collect()
    cols = {r["column"] for r in rows}
    assert {"_topic", "_offset", "event_type", "amount", "flag"} <= cols


def test_result_cache_hits(engine):
    stmt = "SELECT _offset FROM events LAST 2d LIMIT 10"
    engine.cache.hits = engine.cache.misses = 0
    engine.sql(stmt)
    engine.sql(stmt)
    assert engine.cache.hits >= 1


def test_explain_reports_plan(engine):
    lines = [r["plan"] for r in engine.sql("EXPLAIN SELECT * FROM events LAST 1d").collect()]
    assert any("scan topic=events" in l for l in lines)
    assert any("time_bounds" in l for l in lines)


def test_collect_with_timeout_normal(engine):
    df = engine.sql("SELECT _offset FROM events LAST 2d LIMIT 5")
    rows = engine.collect_with_timeout(df, timeout=60)
    assert len(rows) <= 5


def test_collect_with_timeout_cancels(engine, spark):
    import time
    from platform_spark.errors import GovernanceError
    import pyspark.sql.functions as F
    import pytest as _pytest

    # a deliberately slow job: big cross product (large enough that a warm
    # whole-stage-codegen JVM still needs multiple seconds)
    slow = (
        spark.range(2_000_000)
        .crossJoin(spark.range(40_000).withColumnRenamed("id", "id2"))
        .agg(F.sum(F.col("id") * F.col("id2")))
    )
    t0 = time.time()
    with _pytest.raises(GovernanceError, match="timeout"):
        engine.collect_with_timeout(slow, timeout=1.0)
    assert time.time() - t0 < 60


def test_minmax_first_kind_wins(catalog):
    from platform_spark.sql.compiler import CompilerOptions
    from platform_spark.sql.engine import EngineOptions

    opts = EngineOptions()
    opts.compiler = CompilerOptions(first_kind_wins=True)
    eng = KafSqlEngine(catalog, options=opts, now=NOW)
    # first scan-order amount is a JSON number → numeric kind → numeric
    # min/max over parseable values ('n/a' ignored)
    row = eng.sql(
        "SELECT min(json_value(_value, '$.amount')) AS mn, "
        "max(json_value(_value, '$.amount')) AS mx FROM events LAST 30d"
    ).collect()[0]
    assert isinstance(row["mn"], float) and isinstance(row["mx"], float)
    assert 0 <= row["mn"] <= row["mx"]
    # static rule (default) treats JSON paths as strings → lexicographic
    static = KafSqlEngine(catalog, now=NOW)
    srow = static.sql(
        "SELECT min(json_value(_value, '$.amount')) AS mn FROM events LAST 30d"
    ).collect()[0]
    assert isinstance(srow["mn"], str)


def test_join_applies_limit(engine):
    # reference enforces LIMIT on joins (handleJoinSelect stops at
    # sent >= limit); a small LIMIT must bound the result
    n = engine.sql(
        "SELECT o.order_id FROM orders o "
        "JOIN payments p ON o._key = p._key "
        "WITHIN 15000d LAST 15000d LIMIT 7"
    ).count()
    assert n == 7


def test_join_default_limit_applies(engine):
    # no explicit LIMIT → default_limit caps join output too
    n = engine.sql(
        "SELECT o.order_id FROM orders o "
        "JOIN payments p ON o._key = p._key "
        "WITHIN 15000d LAST 15000d"
    ).count()
    assert n <= engine.opt.compiler.default_limit


def test_join_topic_name_qualifier_resolves(engine):
    # topic NAME works as a qualifier even when an alias is declared
    # (reference resolveJoinSide accepts both); unknown qualifiers fall
    # back to the left side rather than erroring
    rows = engine.sql(
        "SELECT orders._key, payments._offset FROM orders o "
        "JOIN payments p ON o._key = p._key "
        "WITHIN 15000d LAST 15000d LIMIT 3"
    ).collect()
    assert len(rows) == 3


def test_collect_with_timeout_preserves_real_errors(engine, spark):
    # a genuine failure must NOT be masked as a timeout
    import pyspark.sql.functions as F
    from pyspark.sql.types import LongType

    from platform_spark.errors import GovernanceError

    @F.udf(returnType=LongType())
    def boom(x):
        raise ValueError("genuine failure")

    df = spark.range(4).select(boom(F.col("id")))
    try:
        engine.collect_with_timeout(df, timeout=120)
        raise AssertionError("expected the job to fail")
    except GovernanceError:
        raise AssertionError("real error masked as timeout")
    except Exception:
        pass  # original Spark error surfaced — correct


def test_result_cache_serves_rows_without_scan(engine):
    # a hit returns a LOCAL relation — no file scan, no cluster job
    stmt = "SELECT _offset FROM events LAST 3d LIMIT 10"
    engine.sql(stmt)
    hit = engine.sql(stmt)
    plan = hit._jdf.queryExecution().executedPlan().toString()
    assert (
        "LocalTableScan" in plan
        or "LocalRelation" in plan
        or "ExistingRDD" in plan  # createDataFrame(rows) local relation
    )
    assert "FileScan" not in plan and "parquet" not in plan.lower()
    assert hit.count() == 10


def test_result_cache_first_execution_stays_lazy(engine):
    # collect-on-repeat: a statement's FIRST execution must not trigger a
    # driver-side collect — it returns the lazy scan plan untouched
    stmt = "SELECT _offset FROM events LAST 5d LIMIT 10"
    df = engine.sql(stmt)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" not in plan and "ExistingRDD" not in plan
    # second execution inside the TTL window materializes rows
    hit = engine.sql(stmt)
    plan2 = hit._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan2
    assert hit.count() == 10


def test_result_cache_max_rows_not_eagerly_collected(engine):
    # effective limit above cache_max_rows → stays a lazy plan (not cached)
    stmt = "SELECT _offset FROM events LAST 4d LIMIT 99000"
    df = engine.sql(stmt)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" not in plan


def test_set_reset_session_vars(catalog):
    from platform_spark.errors import GovernanceError

    eng = KafSqlEngine(catalog, now=NOW)
    eng.sql("SET default_limit = 5")
    assert eng.opt.compiler.default_limit == 5
    assert eng.sql("SELECT _offset FROM events LAST 30d").count() == 5
    eng.sql("RESET default_limit")
    assert eng.opt.compiler.default_limit == 1000
    # dotted names go to spark.conf
    eng.sql("SET spark.sql.shuffle.partitions = 7")
    assert eng.spark.conf.get("spark.sql.shuffle.partitions") == "7"
    eng.sql("SET spark.sql.shuffle.partitions = 8")
    rows = eng.sql("SET enable_cache = false").collect()
    assert rows[0]["name"] == "enable_cache" and eng.opt.enable_cache is False
    eng.sql("RESET enable_cache")
    with pytest.raises(GovernanceError, match="unknown setting"):
        eng.sql("SET bogus_knob = 1")


def test_set_clears_result_cache(catalog):
    eng = KafSqlEngine(catalog, now=NOW)
    stmt = "SELECT _offset FROM events LAST 6d"
    first = eng.sql(stmt).count()
    assert first > 5  # cached at default_limit sizing
    eng.sql("SET default_limit = 5")
    # same statement must NOT serve the stale cached result
    assert eng.sql(stmt).count() == 5
    eng.sql("RESET default_limit")


def test_materialize_prunes_only_aged_versions(spark, tmp_path):
    # stale v= dirs inside the grace period survive (another process may be
    # mid-query on them); aged-out ones are collected
    import os
    import time

    from platform_spark.topics import TopicCatalog

    root = str(tmp_path / "c")
    cat = TopicCatalog(spark, "/root/testdata/sf0.001", cache_root=root)
    topic_dir = os.path.join(root, "topic=events")
    recent = os.path.join(topic_dir, "v=recentfake")
    aged = os.path.join(topic_dir, "v=agedfake")
    os.makedirs(recent)
    os.makedirs(aged)
    old = time.time() - cat.PRUNE_GRACE_SECONDS - 10
    os.utime(aged, (old, old))
    cat.materialize("events", root)
    assert not os.path.isdir(aged)
    assert os.path.isdir(recent)


def test_explain_never_materializes(spark, tmp_path):
    from platform_spark.topics import TopicCatalog

    cat = TopicCatalog(spark, "/root/testdata/sf0.001", cache_root=str(tmp_path / "c"))
    eng = KafSqlEngine(cat, now=NOW)
    lines = [r["plan"] for r in eng.sql("EXPLAIN SELECT _offset FROM events LAST 5d").collect()]
    assert cat._materialized == {}  # introspection ran no write job
    assert any("raw-parquet-estimate" in l and "candidate_files=" in l for l in lines)


def test_compile_pins_clock_for_last_windows(catalog, monkeypatch):
    # ADVICE r10: metadata pruning and the row filters each call
    # time_bounds(); with a wall clock they'd take different `now`s and a
    # LAST window's prune ts_max would trail the filter ts_max. compile()
    # pins one clock for the whole compile — every time_bounds() call in
    # one compile must return the SAME tuple even when utcnow advances.
    from datetime import timedelta

    import platform_spark.sql.compiler as compiler_mod
    from platform_spark.sql import parser
    from platform_spark.sql.compiler import Compiler

    ticks = iter(range(10_000))

    class SteppingDatetime(datetime):
        @classmethod
        def utcnow(cls):
            return NOW + timedelta(seconds=next(ticks))

    monkeypatch.setattr(compiler_mod, "datetime", SteppingDatetime)
    comp = Compiler(catalog)  # no pinned now: wall clock
    seen = []
    orig = Compiler.time_bounds

    def spy(self, q):
        out = orig(self, q)
        seen.append(out)
        return out

    monkeypatch.setattr(Compiler, "time_bounds", spy)
    comp.compile(parser.parse("SELECT _offset FROM events LAST 1h"))
    assert len(seen) >= 2  # pruning + row filters both consulted bounds
    assert len(set(seen)) == 1  # ...and agreed on one window
    assert comp.now is None  # the pin does not outlive the compile


def test_budget_prices_join_right_side_with_widened_frame(catalog, monkeypatch):
    # ADVICE r10: the compiled WITHIN join scans the RIGHT topic without
    # the partition filter and with bounds widened by ±within; the budget
    # estimate must price that same frame, not the left one
    from datetime import timedelta

    from platform_spark.governance import ScanEstimate
    from platform_spark.sql import parser

    eng = KafSqlEngine(catalog, now=NOW)
    calls = []

    def fake_estimate(
        topic, partition=None, ts_min=None, ts_max=None,
        offset_min=None, offset_max=None,
    ):
        calls.append((topic, partition, ts_min, ts_max))
        return ScanEstimate(files=1, bytes=1, rows=1)

    monkeypatch.setattr(
        catalog, "estimate_topic_scan", fake_estimate, raising=False
    )
    q = parser.parse(
        "SELECT o.order_id FROM orders o JOIN payments p "
        "ON o._key = p._key WITHIN 60s LAST 1h"
    )
    eng._check_budget(q)
    assert [c[0] for c in calls] == ["orders", "payments"]
    (_, _, lmin, lmax), (_, rpart, rmin, rmax) = calls
    assert rpart is None
    w = timedelta(seconds=60)
    assert rmin == lmin - w and rmax == lmax + w


def test_key_in_cap_only_when_unbounded(engine):
    """MAX_KEY_IN enforcement lives in _validate, not the parser (r14
    ADVICE): a LAST-bounded batch fetch may exceed 100 keys (its files
    are already time-pruned), while the same list without a time bound
    is rejected with the JOIN alternative — on the unbounded path >100
    random keys cover every bucket, so the union prunes nothing."""
    from platform_spark.sql.parser import MAX_KEY_IN

    over = ", ".join(f"'k{i}'" for i in range(MAX_KEY_IN + 1))
    # bounded: valid (parses AND compiles; zero matching rows is fine)
    df = engine.sql(
        f"SELECT _offset FROM events WHERE _key IN ({over}) LAST 30d"
    )
    assert df.count() == 0
    # unbounded: loud rejection naming the cap and the alternative
    with pytest.raises(ValidationError, match="JOIN against a topic"):
        engine.sql(f"SELECT _offset FROM events WHERE _key IN ({over})")
    # SCAN FULL with an over-cap list: also time-unbounded -> rejected
    with pytest.raises(ValidationError, match="max 100"):
        engine.sql(
            f"SELECT _offset FROM events WHERE _key IN ({over}) SCAN FULL"
        )
