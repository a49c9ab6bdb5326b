"""Physical-plan assertions: the scale contract.

These tests pin the properties that make the engine viable at 100 TB —
partition pruning, filter pushdown, column pruning, broadcast of the small
join side — by inspecting executed plans on the real partitioned-parquet
topic layout. A regression here is a performance bug even if results stay
correct.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from platform_spark.governance import ScanBudget, estimate_scan
from platform_spark.errors import GovernanceError
from platform_spark.sql.engine import KafSqlEngine
from platform_spark.topics import TopicCatalog

NOW = datetime(2024, 1, 31)


def _no_cache_opts():
    # plan tests inspect the real scan plan; the row-level result cache
    # would otherwise serve small results as local relations
    from platform_spark.sql.engine import EngineOptions

    opts = EngineOptions()
    opts.enable_cache = False
    return opts


@pytest.fixture(scope="module")
def mat_engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("topics"))
    cat = TopicCatalog(spark, "/root/testdata/sf0.001", materialized_root=root)
    return KafSqlEngine(cat, options=_no_cache_opts(), now=NOW)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partition_pruning_and_pushdown(mat_engine):
    df = mat_engine.sql(
        "SELECT _offset, _ts FROM events WHERE _partition = 2 AND _offset >= 100 "
        "AND _ts >= '2024-01-15 00:00:00' LIMIT 100000"
    )
    plan = _plan(df)
    assert "PartitionFilters" in plan and "_partition" in plan
    assert "_offset" in plan.split("DataFilters")[1].split("]")[0]
    assert "Batched: true" in plan  # vectorized parquet reader


def test_column_pruning(mat_engine):
    df = mat_engine.sql("SELECT _offset FROM events LAST 5d LIMIT 10")
    plan = _plan(df)
    scan = plan.split("FileScan parquet")[1].split("]")[0]
    # the scan schema must not include the wide payload columns
    assert "_value" not in scan and "_headers" not in scan


def test_join_broadcasts_and_pushes_derived_bounds(mat_engine):
    df = mat_engine.sql(
        "SELECT o._key AS k FROM orders o JOIN payments p ON o._key = p._key "
        "WITHIN 10m LAST 15000d LIMIT 100000"
    )
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    # the WITHIN band appears as a join condition, not a post-filter
    assert "unix_micros" in plan.split("Join")[1].split("\n")[0]
    # derived right-side time bound (window ± within) reaches the scan
    right_scan = plan.split("BroadcastExchange")[1]
    assert "23:50:00" in right_scan or "_ts" in right_scan


def test_scan_estimate_prunes_partitions_and_time(mat_engine):
    path = mat_engine.catalog._materialized["events"]
    full = estimate_scan(path)
    one_part = estimate_scan(path, partition=1)
    assert one_part.rows < full.rows
    # at this tiny SF each partition is a single row group spanning the
    # whole month, so a partial window can at best tie; the disjoint window
    # below proves min/max pruning actually fires
    late = estimate_scan(path, ts_min=datetime(2024, 1, 29))
    assert late.rows <= full.rows
    none = estimate_scan(path, ts_min=datetime(2030, 1, 1))
    assert none.rows == 0 and none.files == 0


def test_scan_budget_rejection(mat_engine):
    est = estimate_scan(mat_engine.catalog._materialized["events"])
    tight = ScanBudget(max_scan_bytes=10)
    with pytest.raises(GovernanceError, match="max_scan_bytes"):
        tight.check(est)
    ok = ScanBudget()
    ok.check(est)  # defaults pass


def test_engine_budget_preflight(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("topics2"))
    cat = TopicCatalog(spark, "/root/testdata/sf0.001", materialized_root=root)
    from platform_spark.sql.engine import EngineOptions

    opts = EngineOptions()
    opts.budget = ScanBudget(max_scan_bytes=10)
    eng = KafSqlEngine(cat, options=opts, now=NOW)
    with pytest.raises(GovernanceError):
        eng.sql("SELECT _offset FROM events LAST 5d")


def test_lazy_cache_root_plan_has_no_window(spark, tmp_path_factory):
    # engine_for-style lazy materialization: a _ts-bounded query must scan
    # partitioned parquet (FileScan, footer stats) — no Window, no global
    # sort of the base table per query
    root = str(tmp_path_factory.mktemp("lazycache"))
    cat = TopicCatalog(spark, "/root/testdata/sf0.001", cache_root=root)
    eng = KafSqlEngine(cat, options=_no_cache_opts(), now=NOW)
    df = eng.sql(
        "SELECT _offset, _ts FROM events "
        "WHERE _ts BETWEEN '2024-01-05 00:00:00' AND '2024-01-07 00:00:00' "
        "LIMIT 100000"
    )
    plan = _plan(df)
    assert "Window" not in plan
    assert "FileScan parquet" in plan
    # same engine: EXPLAIN reports real estimates, never a placeholder
    lines = [r["plan"] for r in eng.sql("EXPLAIN SELECT _offset FROM events LAST 5d").collect()]
    assert any("candidate_files=" in l for l in lines)
    assert not any("envelope-view" in l for l in lines)


def test_q21_plans_semi_and_anti_join(spark):
    # the EXISTS / correlated NOT EXISTS pair must decorrelate into
    # LeftSemi + LeftAnti hash joins on l_orderkey — a BroadcastNestedLoop
    # here would explode at scale
    from platform_spark.gate import GATE

    plan = _plan(GATE["analytics_q21_waiting_suppliers"][0](spark, "/root/testdata/sf0.001"))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoop" not in plan


def test_q8_broadcasts_all_dimensions(spark):
    # the 8-table market-share join: every dim side broadcasts; only the
    # fact-fact (lineitem-orders) equi-join may shuffle
    from platform_spark.gate import GATE

    plan = _plan(GATE["analytics_q8_market_share"][0](spark, "/root/testdata/sf0.001"))
    assert plan.count("BroadcastHashJoin") >= 6
    assert "BroadcastNestedLoop" not in plan


def test_decontamination_broadcasts_bench_index(spark):
    # the eval-set shingle index must broadcast: the training-side shingle
    # stream is the 100 TB side and may not shuffle for the probe join
    from pyspark.sql import functions as F

    from platform_spark.gate import catalog_for
    from platform_spark.llmdata.decontam import contamination

    docs = catalog_for(spark, "/root/testdata/sf0.001").table("documents")
    bench = docs.limit(20).select(F.col("doc_id").alias("bench_id"), "text")
    plan = _plan(contamination(docs, bench, k=8))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dsir_scoring_broadcasts_weight_table(spark):
    # the per-bucket log-ratio table is <= n_buckets rows; the raw corpus
    # must be scored map-side (broadcast), never shuffled on the bucket
    from pyspark.sql import functions as F

    from platform_spark.gate import catalog_for
    from platform_spark.llmdata.selection import dsir_scores

    docs = catalog_for(spark, "/root/testdata/sf0.001").table("documents")
    plan = _plan(dsir_scores(docs, docs.filter(F.col("lang") == "de")))
    assert "BroadcastHashJoin" in plan


def test_interval_join_is_bucketized_not_nested_loop(spark):
    # the overlap theta-condition must ride an equi-join on the bucket —
    # a BroadcastNestedLoopJoin here is the quadratic plan the operator
    # exists to avoid
    from platform_spark.gate import GATE

    plan = _plan(GATE["analytics_interval_join"][0](spark, "/root/testdata/sf0.001"))
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_chunking_has_no_exchange(spark):
    # chunking must expand rows in place: any Exchange here would make a
    # pure per-row operator cost a full shuffle of the corpus
    from platform_spark.gate import catalog_for
    from platform_spark.llmdata.chunking import chunk_documents

    docs = catalog_for(spark, "/root/testdata/sf0.001").table("documents")
    plan = _plan(chunk_documents(docs, chunk_size=32, overlap=8))
    assert "Exchange" not in plan
    assert "Generate" in plan


def test_embedding_gates_are_probe_free(spark, monkeypatch):
    # the configured vector dim (topics.VECTOR_DIMS) must reach every
    # embedding operator: a 1-row .first() probe inside query construction
    # is a hidden driver job per query at 100 TB
    from pyspark.sql import DataFrame

    from platform_spark import gate as g

    def _boom(self, *a, **k):  # pragma: no cover - should never run
        raise AssertionError("dim probe: DataFrame.first() during gate build")

    monkeypatch.setattr(DataFrame, "first", _boom)
    for name in (
        "llm_ann_ivf_topk",
        "llm_embedding_neardup",
        "llm_embedding_rep_pairs",
        "llm_ann_pca_topk",
        "llm_semdedup",
    ):
        g.GATE[name][0](spark, "/root/testdata/sf0.001")


def test_vector_dim_config_matches_fixture(spark):
    # VECTOR_DIMS is config, not inference — pin it to the actual fixture
    # so a dim change fails loudly here instead of corrupting LSH planes
    from pyspark.sql import functions as F

    from platform_spark.gate import catalog_for
    from platform_spark.topics import vector_dim

    emb = catalog_for(spark, "/root/testdata/sf0.001").table("embeddings")
    dims = emb.select(F.size("embedding").alias("d")).distinct().collect()
    assert [r.d for r in dims] == [vector_dim("embeddings", "embedding")]


def test_zorder_key_spec(spark):
    from pyspark.sql import functions as F

    from platform_spark.operators.layout import zorder_key

    df = spark.createDataFrame([(0b11, 0b01)], "x: long, y: long")
    # x bits land at positions b*2+0, y bits at b*2+1:
    # x=11 -> bits 0,2 set; y=01 -> bit 1 set  =>  z = 0b0111 = 7
    z = df.select(
        zorder_key([F.col("x"), F.col("y")], bits=2).alias("z")
    ).collect()[0]["z"]
    assert z == 7
    import pytest as _pytest

    with _pytest.raises(ValueError):
        zorder_key([F.col("x"), F.col("y")], bits=32)


def _rowgroup_spans(path: str, col: str) -> list[tuple]:
    import glob

    import pyarrow.parquet as pq

    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    spans.append((c.statistics.min, c.statistics.max))
    return spans


def test_optimize_layout_narrows_rowgroup_stats(spark, tmp_path):
    """The point of the layout pass: after range-partition + local sort,
    each file/row-group covers a narrow disjoint slice of the sort key,
    so parquet min/max stats prune scans (the footer IS the time index).
    """
    from platform_spark.operators.layout import optimize_layout

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    base, opt = str(tmp_path / "plain"), str(tmp_path / "sorted")
    ev.repartition(4).write.parquet(base)
    optimize_layout(ev, ["ts"], n_partitions=4).write.parquet(opt)

    def total_span(spans):
        return sum((hi - lo).total_seconds() for lo, hi in spans)

    plain, tidy = _rowgroup_spans(base, "ts"), _rowgroup_spans(opt, "ts")
    assert len(tidy) >= 4
    # unsorted: every row group spans ~the full month; sorted: disjoint
    # quarters — at least a 2x reduction in summed span, and no overlap
    assert total_span(tidy) < 0.5 * total_span(plain)
    tidy.sort()
    for (_, hi), (lo, _) in zip(tidy, tidy[1:]):
        assert hi <= lo


def test_optimize_layout_zorder_bounds_both_dims(spark, tmp_path):
    """Single-column sort leaves the other column's stats useless (full
    range in every file); the Z-order key bounds BOTH dimensions."""
    import itertools

    from platform_spark.operators.layout import (
        optimize_layout,
        optimize_layout_zorder,
    )

    rows = [(x, y) for x, y in itertools.product(range(32), range(32))]
    df = spark.createDataFrame(rows, "x: long, y: long")
    xs, zs = str(tmp_path / "xsort"), str(tmp_path / "zsort")
    optimize_layout(df, ["x"], n_partitions=4).write.parquet(xs)
    optimize_layout_zorder(df, ["x", "y"], bits=5, n_partitions=4).write.parquet(zs)

    def max_span(path, col):
        return max(hi - lo for lo, hi in _rowgroup_spans(path, col))

    # x-sorted: x tight but y spans the full 0..31 in every file
    assert max_span(xs, "x") <= 15 and max_span(xs, "y") == 31
    # z-ordered: EVERY dimension's per-file span is a strict subset
    assert max_span(zs, "x") <= 15 and max_span(zs, "y") <= 15
    # schema untouched (the __z helper column is dropped)
    assert spark.read.parquet(zs).columns == ["x", "y"]


def test_optimize_layout_plan_is_one_range_exchange(spark):
    from platform_spark.operators.layout import optimize_layout

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = (
        optimize_layout(ev, ["ts"], n_partitions=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    low = plan.lower()
    assert "rangepartitioning" in low
    assert low.count("exchange") == 1  # one shuffle: the range repartition
