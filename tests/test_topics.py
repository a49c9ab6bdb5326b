"""Scalable offset assignment: materialize() replaces the envelope's
per-partition ROW_NUMBER window (one sort task per `_partition` value —
external-sort spill at scale; the r8 sf10 rehearsal measured 17.9x wall
at 10x rows on the ingest leg) with a chunked two-phase rank. These tests
pin the bit-identical-output contract the swap rests on."""

from __future__ import annotations

import pytest

from platform_spark import envelope as env
from platform_spark.topics import (
    IMPLICIT_COLUMNS,
    TopicCatalog,
    assign_partition_offsets,
    materialize_envelope,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def raw_views(spark):
    # TopicCatalog registers the raw fixture views the envelope SQL reads
    return TopicCatalog(spark, SF_DIR)


@pytest.mark.parametrize("name", sorted(env.ENVELOPE_BUILDERS))
def test_chunked_rank_matches_window(spark, raw_views, name):
    """For every topic, the chunked rank (forced to MANY chunks, so the
    base+local-rank composition is really exercised) reproduces the
    window's _offset and _segment bit-for-bit."""
    ref = (
        spark.sql(env.ENVELOPE_BUILDERS[name](env.SPARK))
        .select(*IMPLICIT_COLUMNS)
        .collect()
    )
    got = (
        materialize_envelope(
            name,
            spark.sql(env.ENVELOPE_BUILDERS[name](env.SPARK)),
            rows_per_chunk=50,  # tiny → dozens of chunks at sf0.001
        )
        .select(*IMPLICIT_COLUMNS)
        .collect()
    )
    key = lambda r: (r["_partition"], r["_offset"])  # noqa: E731
    assert sorted(got, key=key) == sorted(ref, key=key)


def test_chunked_rank_no_window_spill_shape(spark, raw_views):
    """The materialize path must not contain the whole-partition Window:
    the plan's only sort groups are (chunk, partition) slices."""
    df = materialize_envelope(
        "events",
        spark.sql(env.ENVELOPE_BUILDERS["events"](env.SPARK)),
        rows_per_chunk=50,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "__chunk" in plan  # rank runs per chunk slice
    assert "row_number" in plan.lower()


def test_assign_offsets_edge_cases(spark):
    """Single chunk degenerates to the plain window; empty input yields
    an empty frame; offsets are dense 0..n-1 per partition."""
    from pyspark.sql import functions as F

    df = spark.range(97).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("int").alias("_partition")
    )
    for chunks in (1, 5, 64):
        out = assign_partition_offsets(df, "k", ("k",), chunks)
        rows = out.groupBy("_partition").agg(
            F.count("*").alias("n"),
            F.min("_offset").alias("lo"),
            F.max("_offset").alias("hi"),
            F.countDistinct("_offset").alias("d"),
        ).collect()
        for r in rows:
            assert (r["lo"], r["hi"], r["d"]) == (0, r["n"] - 1, r["n"])
        # rank order follows the key order within each partition
        got = {
            (r["_partition"], r["k"]): r["_offset"] for r in out.collect()
        }
        for (p, k), off in got.items():
            expected = sum(1 for (p2, k2) in got if p2 == p and k2 < k)
            assert off == expected
    empty = assign_partition_offsets(df.filter("k < 0"), "k", ("k",), 4)
    assert empty.count() == 0


@pytest.mark.parametrize("name", ["events", "payments", "lineitem"])
def test_rr_staged_envelope_matches_canonical(spark, raw_views, name):
    """The repartitioned staging view (r15: parallelizes the `_value`
    render when a small source scans as 1-3 splits) must leave the
    envelope output bit-identical — the RR exchange only changes WHERE
    rows are rendered, and the ROW_NUMBER order keys are total."""
    rel = raw_views._rr_source_rel(name, min_rows_per_task=10)
    assert rel is not None  # the gate fires once the rows/task floor allows
    ref = spark.sql(env.ENVELOPE_BUILDERS[name](env.SPARK)).collect()
    got = spark.sql(env.ENVELOPE_BUILDERS[name](env.SPARK, rel)).collect()
    key = lambda r: (r["_partition"], r["_offset"])  # noqa: E731
    assert sorted(got, key=key) == sorted(ref, key=key)


def test_rr_source_gate_stays_off_at_scale_or_tiny(spark, raw_views):
    """No staging shuffle when the source already scans wide (bytes >>
    split size) or is too small to benefit (rows/task floor)."""
    # tiny: sf0.001 sources are ~1k rows — the default 20k-rows/task
    # floor yields n_rr < 2 for every topic
    for name in ("events", "lineitem", "customer"):
        assert raw_views._rr_source_rel(name) is None


def test_assign_offsets_sizing_df_equivalence(spark):
    """Sizing jobs may run over a physically different (but row-equal)
    frame; ranks must match the single-frame result exactly."""
    from pyspark.sql import functions as F

    df = spark.range(500).select(
        (F.col("id") * 7 % 501).alias("k"),
        (F.col("id") % 4).cast("int").alias("_partition"),
    )
    ref = {
        (r["_partition"], r["k"]): r["_offset"]
        for r in assign_partition_offsets(df, "k", ("k",), 8).collect()
    }
    got = {
        (r["_partition"], r["k"]): r["_offset"]
        for r in assign_partition_offsets(
            df.repartition(32), "k", ("k",), 8, sizing_df=df.coalesce(1)
        ).collect()
    }
    assert got == ref


def test_assign_offsets_null_chunk_key_fails_loudly(spark):
    """A chunk key that casts to NULL (e.g. a string _key under the
    default CAST(_key AS BIGINT)) must raise, not silently drop the
    NULL-keyed rows through the inner base join."""
    from pyspark.sql import functions as F

    df = spark.range(10).select(
        F.when(F.col("id") % 2 == 0, F.concat(F.lit("u"), F.col("id")))
        .otherwise(F.col("id").cast("string"))
        .alias("_key"),
        (F.col("id") % 2).cast("int").alias("_partition"),
    )
    with pytest.raises(ValueError, match="NULL for 5 of 10 rows"):
        assign_partition_offsets(df, "CAST(_key AS BIGINT)", ("_key",), 4)
