"""Heavy-operator scale rehearsal: run ingest + the most expensive
operator family at a large derived SF (gen_scale.py output) and record
wall times with linearity ratios vs a smaller reference run.

This substantiates the "plans survive 100×" claim with measurements: the
sf10 dir is 100× the sf0.1 gate fixture, so an operator whose wall grows
super-linearly IN ROWS (not in output size) shows up as ratio >> copies.

Usage:
  python tools/gen_scale.py --src /root/testdata/sf0.1 --dest .bench/sf10 --copies 100
  SPARK_DRIVER_MEMORY=48g python tools/scale_rehearsal.py --sf-dir .bench/sf10 \
      --ref .bench/bench_detail_sf1.json --copies 10 \
      --out .bench/bench_sf10.json [--curation]

(In local mode the driver JVM is the executor; the 8g default that fits
the gate fixtures can AGGREGATE_OUT_OF_MEMORY under 32 concurrent tasks
at sf10 — size the heap to the rehearsal, the machine has plenty.)

`--curation` additionally runs the batch curation pipeline AND its
streaming twin over the documents table and checks the curated content
sets agree (the stream dedups on exact text hash, so the batch expected
set is computed with the same row-wise twins + exact-hash collapse —
arrival order decides WHICH duplicate id wins, content decides WHAT
survives; the check compares content).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: the operator family that dominates the suite wall at sf1 (BENCH_sf1),
#: plus one representative per relational shape class
HEAVY = [
    "llm_dedup_ngram_jaccard",
    "llm_embedding_neardup",
    "llm_ngram_rep_pairs",
    "llm_embedding_rep_pairs",
    "llm_dedup_clusters",
    "llm_dedup_clusters_fast",
    "llm_embedding_clusters_fast",
    "llm_minhash_lsh_pairs",
    "llm_minhash_rep_pairs",
    # the simhash DELIVERABLE at scale is the rep leg: the full-pair leg is
    # already computed rep-first (expand_pairs over simhash_rep_graph) but
    # its OUTPUT is quadratic in copy counts by definition (gen_scale = N
    # identical copies -> C(N,2) expanded rows per dup content; 108.5 s at
    # sf10 in r6 vs 5.5 s for the rep leg), so rehearsing it measures the
    # fixture's output size, not the machinery. The expansion-equality
    # oracle (llm_simhash_pairs, full DuckDB pair list) stays pytest-checked.
    "llm_simhash_rep_pairs",
    "llm_ann_ivf_kmeans",
    "llm_duplicate_spans",
    "llm_bpe_pair_counts",
    "llm_winnow_fingerprints",
    "llm_lang_id_multi",
    "llm_strip_html",
    # kfs measured as explicit write/read legs below, NOT via the
    # kfs_segment_roundtrip gate: the gate caches its export write-once,
    # so its wall silently flips between write+read (cold cache, r6's
    # 55.9 s) and read-only depending on scratch state
    "llm_tfidf_keywords",
    "llm_decontaminate",
    "analytics_q21_waiting_suppliers",
    "analytics_q5_nation_revenue",
    "analytics_q1_pricing_summary",
    "llm_heavy_hitters",
    "llm_edit_distance_pairs",
    "llm_mix_temperature",
    "llm_ann_pq_topk",
    "llm_ann_ivfpq_topk",
    "llm_dedup_incremental",
    "llm_snapshot_diff",
    "analytics_session_window_native",
    "analytics_pivot_event_counts",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _plan(tbl, spark, kind: str):
    """Time scan_files in a specific mode: 'serial' = driver decode,
    'spark' = the manifest fan-out FORCED below its entry threshold (the
    rehearsal's 10k files sit under the 100k production cutover, but the
    record must show both modes' walls so the crossover claim is
    measured, not asserted)."""
    from platform_spark.iceberg import table as tbl_mod

    if kind == "serial":
        return tbl.scan_files()
    saved = tbl_mod._PARALLEL_PLAN_MIN
    tbl_mod._PARALLEL_PLAN_MIN = 0
    try:
        return tbl.scan_files(spark=spark)
    finally:
        tbl_mod._PARALLEL_PLAN_MIN = saved


def run_curation_twins(spark, sf_dir: str, scratch: str) -> dict:
    """Batch curate_corpus + streaming curate_stream over the documents
    table; returns walls and the content-set equality verdict."""
    from pyspark.sql import functions as F

    from platform_spark.llmdata.cleaning import (
        _line_ok,
        quality_passes_expr,
        redact_pii,
    )
    from platform_spark.llmdata.pipeline import curate_corpus
    from platform_spark.streaming.curate import bench_shingle_hashes, curate_stream
    from platform_spark.topics import TopicCatalog

    cat = TopicCatalog(spark, sf_dir)
    docs = cat.table("documents")
    bench = (
        docs.orderBy("doc_id")
        .limit(20)
        .select(F.col("doc_id").alias("bench_id"), "text")
    )

    out = {}
    t0 = time.time()
    stages = curate_corpus(docs, bench)
    n_curated = stages["curated"].count()
    n_packed = stages["packed"].count()
    out["batch_curate_sec"] = round(time.time() - t0, 3)
    out["batch_curated_rows"] = n_curated
    out["batch_packed_rows"] = n_packed

    # expected stream survivors, computed in batch with the SAME row-wise
    # twins the stream uses (clean -> redact -> quality -> decontam) and
    # exact-hash dedup; compare CONTENT (arrival order picks the id)
    hashes = bench_shingle_hashes(bench, k=8)
    base = docs.select(
        "doc_id",
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("_ts"),
        "text",
    )
    src = os.path.join(scratch, "curate_stream_src")
    shutil.rmtree(src, ignore_errors=True)
    t0 = time.time()
    base.write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    curated = curate_stream(stream, bench_hashes=hashes, watermark="10 minutes")
    spark.sql("DROP TABLE IF EXISTS rehearsal_curated_stream")
    q = (
        curated.writeStream.format("memory")
        .queryName("rehearsal_curated_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out["stream_curate_sec"] = round(time.time() - t0, 3)

    from platform_spark.llmdata.dedup import md5_int, shingles_from_tokens
    from platform_spark.llmdata.text import tokens

    cleaned = base.withColumn(
        "text",
        F.array_join(
            F.filter(F.split(F.col("text"), "\n"), lambda l: _line_ok(l, 4)),
            "\n",
        ),
    )
    cleaned = redact_pii(cleaned).select(
        "doc_id", F.col("text_redacted").alias("text")
    )
    passing = cleaned.filter(quality_passes_expr(F.col("text")))
    doc_sh = F.transform(
        shingles_from_tokens(tokens(F.lower(F.col("text"))), 8),
        lambda s: md5_int(s),
    )
    expected = (
        passing.filter(
            ~F.coalesce(
                F.arrays_overlap(doc_sh, F.lit(hashes).cast("array<bigint>")),
                F.lit(False),
            )
        )
        .select("text")
        .distinct()
    )
    got = spark.table("rehearsal_curated_stream").select("text").distinct()
    n_expected = expected.count()
    n_got = got.count()
    n_common = expected.intersect(got).count()
    out["stream_curated_rows"] = n_got
    out["twin_equal_content"] = bool(n_expected == n_got == n_common)
    out["twin_expected_rows"] = n_expected
    if not out["twin_equal_content"]:
        print(
            f"TWIN MISMATCH: expected={n_expected} got={n_got} common={n_common}",
            file=sys.stderr,
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--ref", help="bench detail JSON of a smaller run to ratio against")
    ap.add_argument(
        "--copies", type=float, default=10.0,
        help="row multiple of this run vs --ref (linearity denominator)",
    )
    ap.add_argument("--queries", nargs="*", default=HEAVY)
    ap.add_argument("--curation", action="store_true")
    ap.add_argument("--skip-ingest", action="store_true")
    ap.add_argument(
        "--upserts", type=int, default=400,
        help="micro-upsert commits for the delete-maintenance leg "
        "(cost is O(commits), SF-independent)",
    )
    args = ap.parse_args()

    from platform_spark.gate import GATE
    from platform_spark.session import get_spark
    from platform_spark.topics import TopicCatalog

    spark = get_spark("scale-rehearsal")
    scratch = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench"
    )
    os.makedirs(scratch, exist_ok=True)

    timings: dict[str, float] = {}
    result: dict = {"sf_dir": args.sf_dir, "queries": timings}

    if not args.skip_ingest:
        cat = TopicCatalog(spark, args.sf_dir)
        topic_root = os.path.join(scratch, "topics_rehearsal")
        shutil.rmtree(topic_root, ignore_errors=True)
        t0 = time.time()
        cat.materialize_all(topic_root)
        ingest = time.time() - t0
        n_rows = sum(
            cat.topic(t, with_schema_columns=False).count()
            for t in cat.topic_names()
        )
        timings["ingest_topics"] = round(ingest, 3)
        result["ingest_rows_per_sec"] = round(n_rows / max(ingest, 1e-9))

    def cleanup() -> None:
        """Clean-slate session state between timed ops: localCheckpoint
        blocks (clusters/sketch ops) are only released when the driver
        GCs, and with a 48g rehearsal heap full GCs are rare — without
        this, retained blocks squeeze execution memory and a late 6 s
        aggregate measures as 30+ s of spill (observed on q1 in the first
        r8 runs)."""
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    for name in args.queries:
        fn, _oracle = GATE[name]
        t0 = time.time()
        force(fn(spark, args.sf_dir))
        timings[name] = round(time.time() - t0, 3)
        print(f"{name}: {timings[name]} s", flush=True)
        cleanup()

    # kfs segment legs, timed separately and always from a cold scratch
    # dir so the record is reproducible (the roundtrip gate's write-once
    # cache made r6's number write+read on the first run, read-only after)
    from platform_spark import kfs as _kfs

    ev = TopicCatalog(spark, args.sf_dir).topic(
        "events", with_schema_columns=False
    )
    kroot = os.path.join(scratch, "kfs_rehearsal")
    shutil.rmtree(kroot, ignore_errors=True)
    t0 = time.time()
    _kfs.write_kfs(ev, kroot, "events", segment_rows=1000).collect()
    timings["kfs_write_segments"] = round(time.time() - t0, 3)
    print(f"kfs_write_segments: {timings['kfs_write_segments']} s", flush=True)
    cleanup()
    t0 = time.time()
    force(_kfs.read_kfs(spark, kroot, "events"))
    timings["kfs_read_segments"] = round(time.time() - t0, 3)
    print(f"kfs_read_segments: {timings['kfs_read_segments']} s", flush=True)
    cleanup()

    # iceberg legs: cold-scratch create+append (3 snapshots, incl. an
    # add-column evolution) then a metadata-planned scan — same
    # cold-scratch discipline as the kfs legs above
    from pyspark.sql import functions as F

    from platform_spark.iceberg.table import IcebergTable, append_dataframe

    docs = TopicCatalog(spark, args.sf_dir).table("documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    iroot = os.path.join(scratch, "iceberg_rehearsal")
    shutil.rmtree(iroot, ignore_errors=True)
    t0 = time.time()
    itbl = IcebergTable.create(iroot, docs.schema, partition_by=("lang",))
    append_dataframe(itbl, docs.filter(F.col("doc_id") % 3 == 0))
    append_dataframe(itbl, docs.filter(F.col("doc_id") % 3 == 1))
    append_dataframe(
        itbl,
        docs.filter(F.col("doc_id") % 3 == 2).withColumn(
            "quality", F.col("n_chars") * F.lit(2)
        ),
    )
    timings["iceberg_commit"] = round(time.time() - t0, 3)
    print(f"iceberg_commit: {timings['iceberg_commit']} s", flush=True)
    cleanup()
    t0 = time.time()
    force(itbl.to_spark(spark))
    timings["iceberg_scan"] = round(time.time() - t0, 3)
    print(f"iceberg_scan: {timings['iceberg_scan']} s", flush=True)
    cleanup()

    # row-level legs over the SAME table: a position delete (one
    # distributed filter + sorted delete-file write), the merge-on-read
    # scan it induces (broadcast anti-join — the delete set is KBs
    # against the whole corpus), and a copy-on-write merge whose cost
    # must track the AFFECTED file count, not the table
    from platform_spark.iceberg.table import merge_into

    t0 = time.time()
    itbl.delete_where(spark, "doc_id % 97 = 0")
    timings["iceberg_delete_commit"] = round(time.time() - t0, 3)
    print(f"iceberg_delete_commit: {timings['iceberg_delete_commit']} s", flush=True)
    cleanup()
    t0 = time.time()
    force(itbl.to_spark(spark))
    timings["iceberg_mor_scan"] = round(time.time() - t0, 3)
    print(f"iceberg_mor_scan: {timings['iceberg_mor_scan']} s", flush=True)
    cleanup()
    t0 = time.time()
    merge_into(
        itbl,
        itbl.to_spark(spark).filter("doc_id % 1013 = 5").withColumn(
            "source", F.lit("merged")
        ),
        ["doc_id"],
        spark,
    )
    timings["iceberg_merge_commit"] = round(time.time() - t0, 3)
    print(f"iceberg_merge_commit: {timings['iceberg_merge_commit']} s", flush=True)
    cleanup()
    # atomic CDC upsert: O(batch) by construction — data + equality-delete
    # in one snapshot, no existing file read; its wall must track the
    # BATCH size (fixed here), not the table
    from platform_spark.iceberg.table import upsert_dataframe

    t0 = time.time()
    upsert_dataframe(
        itbl,
        docs.filter("doc_id % 509 = 7").withColumn("source", F.lit("upserted")),
        ["doc_id"],
    )
    timings["iceberg_upsert_commit"] = round(time.time() - t0, 3)
    print(f"iceberg_upsert_commit: {timings['iceberg_upsert_commit']} s", flush=True)
    cleanup()

    # continuous-CDC endurance: N micro-upsert commits accumulate N live
    # equality-delete files; the scan pays for them until rewrite_deletes
    # folds everything into one consolidated position-delete set. The
    # artifact records scan wall BEFORE vs AFTER maintenance — after must
    # be flat (~the clean-table scan), and the whole leg is O(commits),
    # independent of SF, so its cross-SF ratio must sit near 1x.
    from platform_spark.iceberg.table import rewrite_deletes

    uroot = os.path.join(scratch, "iceberg_cdc_rehearsal")
    shutil.rmtree(uroot, ignore_errors=True)
    useed = spark.range(0, 200_000).select(
        F.col("id").alias("key"),
        F.lit("base").alias("val"),
        F.col("id").alias("n"),
    )
    utbl = IcebergTable.create(uroot, useed.schema)
    append_dataframe(utbl, useed)
    # baseline a derived aggregate at the SEED snapshot so the post-upsert
    # refresh below measures a genuine wide-window incremental fold
    from platform_spark.iceberg.matview import IncrementalAggregate

    mv_state = os.path.join(scratch, "cdc_mv_state")
    shutil.rmtree(mv_state, ignore_errors=True)  # stale state from a prior run
    mv = IncrementalAggregate(mv_state, group_cols=["val"], sum_cols=["n"])
    mv.refresh(spark, utbl)
    seed_snap = utbl.current_snapshot()["snapshot-id"]
    n_up = args.upserts
    t0 = time.time()
    for c in range(n_up):
        lo = (c * 37) % 199_000
        batch = spark.range(lo, lo + 50).select(
            F.col("id").alias("key"),
            F.lit(f"u{c}").alias("val"),
            (F.col("id") + c).alias("n"),
        )
        upsert_dataframe(utbl, batch, ["key"])
    timings[f"iceberg_micro_upserts_{n_up}"] = round(time.time() - t0, 3)
    print(
        f"iceberg_micro_upserts_{n_up}: {timings[f'iceberg_micro_upserts_{n_up}']} s "
        f"({len(utbl.scan_deletes())} live delete files)",
        flush=True,
    )
    cleanup()
    # wide-window CDC consumer: fold the WHOLE N-commit window through
    # changelog() and an IncrementalAggregate refresh — the daily-matview
    # shape a 1-commit/min table produces (~1,440 snapshots/refresh).
    # Plan width must be O(1) in the window length (the relational fast
    # path: one insert leaf + one kill-candidate join), and fold wall
    # must track CHANGED ROWS, not window length × table size.
    t0 = time.time()
    # the CONSUMER window: everything after the seed baseline — the same
    # window the matview refresh below folds
    cl = utbl.changelog(spark, from_snapshot_id=seed_snap)
    n_leaves = (
        cl._jdf.queryExecution().optimizedPlan().toString().count("Relation")
    )
    n_events = cl.count()
    timings["iceberg_changelog_wide_fold"] = round(time.time() - t0, 3)
    t0 = time.time()
    n_folded = mv.refresh(spark, utbl)
    assert n_folded == n_events, (n_folded, n_events)
    timings["iceberg_matview_wide_refresh"] = round(time.time() - t0, 3)
    n_mv_groups = mv.read(spark, utbl).count()
    # folded state must equal the full aggregate of the live table
    full = (
        utbl.to_spark(spark)
        .groupBy("val")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n").alias("sum_n"))
    )
    n_mismatch = (
        mv.read(spark, utbl)
        .withColumnRenamed("n", "mv_n")
        .withColumnRenamed("sum_n", "mv_sum_n")
        .join(full, "val", "full_outer")
        .filter(
            "mv_n IS DISTINCT FROM n OR mv_sum_n IS DISTINCT FROM sum_n"
        )
        .count()
    )
    assert n_mismatch == 0, f"{n_mismatch} matview groups diverged"
    print(
        f"iceberg_changelog_wide_fold: {timings['iceberg_changelog_wide_fold']} s "
        f"({n_events} events over {n_up + 1} snapshots, {n_leaves} plan leaves); "
        f"matview_wide_refresh: {timings['iceberg_matview_wide_refresh']} s "
        f"({n_mv_groups} groups)",
        flush=True,
    )
    cleanup()
    t0 = time.time()
    n_pre = utbl.to_spark(spark).count()
    timings["iceberg_cdc_scan_pre_maint"] = round(time.time() - t0, 3)
    print(
        f"iceberg_cdc_scan_pre_maint: {timings['iceberg_cdc_scan_pre_maint']} s",
        flush=True,
    )
    cleanup()
    t0 = time.time()
    maint = rewrite_deletes(utbl, spark)
    timings["iceberg_rewrite_deletes"] = round(time.time() - t0, 3)
    print(
        f"iceberg_rewrite_deletes: {timings['iceberg_rewrite_deletes']} s "
        f"({maint['retired_delete_files']} -> {maint['new_delete_files']} files)",
        flush=True,
    )
    cleanup()
    t0 = time.time()
    n_post = utbl.to_spark(spark).count()
    timings["iceberg_cdc_scan_post_maint"] = round(time.time() - t0, 3)
    print(
        f"iceberg_cdc_scan_post_maint: {timings['iceberg_cdc_scan_post_maint']} s",
        flush=True,
    )
    assert n_pre == n_post == 200_000, (n_pre, n_post)
    # second maintenance axis: the manifest LIST grew by ~2 per commit
    # (N upserts → ~2N+1 manifests), so planning pays per commit until
    # rewrite_manifests folds the list; time it and the plan before/after
    from platform_spark.iceberg import avro as _avro

    t0 = time.time()
    n_files_pre = len(utbl.scan_files())
    timings["iceberg_cdc_plan_pre_mfrewrite"] = round(time.time() - t0, 3)
    n_mf_pre = len(
        _avro.read_container(utbl.current_snapshot()["manifest-list"])[2]
    )
    t0 = time.time()
    mres = utbl.rewrite_manifests()
    timings["iceberg_rewrite_manifests"] = round(time.time() - t0, 3)
    t0 = time.time()
    n_files_post = len(utbl.scan_files())
    timings["iceberg_cdc_plan_post_mfrewrite"] = round(time.time() - t0, 3)
    assert n_files_post == n_files_pre, (n_files_pre, n_files_post)
    print(
        f"iceberg_rewrite_manifests: {timings['iceberg_rewrite_manifests']} s "
        f"({n_mf_pre} -> {mres['manifests_created']} manifests; "
        f"plan {timings['iceberg_cdc_plan_pre_mfrewrite']} -> "
        f"{timings['iceberg_cdc_plan_post_mfrewrite']} s, "
        f"{n_files_pre} files)",
        flush=True,
    )
    # third maintenance axis: bin-pack the per-commit small data files
    # (one per touched partition per batch) and time the steady scan the
    # table settles into — the full maintenance cadence a continuous-CDC
    # deployment runs (rewrite_deletes -> rewrite_manifests -> compact)
    from platform_spark.iceberg.table import compact_table

    t0 = time.time()
    compact_table(utbl, spark, files_per_partition=32)
    timings["iceberg_cdc_compact"] = round(time.time() - t0, 3)
    t0 = time.time()
    n_final = utbl.to_spark(spark).count()
    timings["iceberg_cdc_scan_post_compact"] = round(time.time() - t0, 3)
    assert n_final == 200_000, n_final
    print(
        f"iceberg_cdc_compact: {timings['iceberg_cdc_compact']} s; "
        f"scan_post_compact: {timings['iceberg_cdc_scan_post_compact']} s",
        flush=True,
    )
    result["cdc_maintenance"] = {
        "upsert_commits": n_up,
        "retired_delete_files": maint["retired_delete_files"],
        "new_delete_files": maint["new_delete_files"],
        "scan_pre_s": timings["iceberg_cdc_scan_pre_maint"],
        "scan_post_s": timings["iceberg_cdc_scan_post_maint"],
        "manifests_replaced": mres["manifests_replaced"],
        "manifests_created": mres["manifests_created"],
        "plan_pre_s": timings["iceberg_cdc_plan_pre_mfrewrite"],
        "plan_post_s": timings["iceberg_cdc_plan_post_mfrewrite"],
        "live_files": n_files_post,
        "compact_s": timings["iceberg_cdc_compact"],
        "scan_post_compact_s": timings["iceberg_cdc_scan_post_compact"],
        "changelog_wide_fold_s": timings["iceberg_changelog_wide_fold"],
        "changelog_events": n_events,
        "changelog_plan_leaves": n_leaves,
        "matview_wide_refresh_s": timings["iceberg_matview_wide_refresh"],
        "matview_groups": n_mv_groups,
    }
    shutil.rmtree(uroot, ignore_errors=True)
    cleanup()

    # metadata-planning leg at high file count: 10k one-row data files
    # across 100 append commits (the final snapshot carries 100 data
    # manifests), timing scan_files both serial (driver decode) and with
    # the Spark manifest-decode fan-out — the path a ~10^5-file 100 TB
    # table's per-query planning takes. Also timed at half size so
    # linearity in manifests is in the artifact itself.
    import pyarrow as pa
    import pyarrow.parquet as pq

    proot = os.path.join(scratch, "iceberg_plan_rehearsal")
    shutil.rmtree(proot, ignore_errors=True)
    from pyspark.sql import types as T

    plan_schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    ptbl = IcebergTable.create(proot, plan_schema)
    os.makedirs(os.path.join(proot, "data"), exist_ok=True)
    n_commits, files_per = 100, 100
    t0 = time.time()
    half_marks: dict[str, float] = {}
    for c in range(n_commits):
        paths = []
        for i in range(files_per):
            p = os.path.join(proot, "data", f"b{c:03d}_{i:03d}.parquet")
            pq.write_table(
                pa.table({"id": [c * files_per + i], "v": [0.5]}), p
            )
            paths.append(p)
        ptbl.append_files(paths, spark=spark)
        if c + 1 == n_commits // 2:
            for kind in ("serial", "spark"):
                t1 = time.time()
                n = len(_plan(ptbl, spark, kind))
                half_marks[kind] = round(time.time() - t1, 3)
                assert n == (c + 1) * files_per
    timings["iceberg_plan_commits_10k"] = round(time.time() - t0, 3)
    for kind in ("serial", "spark"):
        t1 = time.time()
        n_planned = len(_plan(ptbl, spark, kind))
        timings[f"iceberg_plan_{kind}_10k"] = round(time.time() - t1, 3)
        timings[f"iceberg_plan_{kind}_5k"] = half_marks[kind]
        assert n_planned == n_commits * files_per
        print(
            f"iceberg_plan_{kind}: 5k={half_marks[kind]} s "
            f"10k={timings[f'iceberg_plan_{kind}_10k']} s",
            flush=True,
        )
    shutil.rmtree(proot, ignore_errors=True)
    cleanup()

    # semantic decontam at rehearsal scale runs the VECTORIZED probe (the
    # expression mode is the oracle reference and interpreted-HOF-bound:
    # at sf10 its 200k x ~4.9k pair fold would dominate the whole run)
    # against a FIXED-size eval set: without the cap, gen_scale grows the
    # %41 bench with the corpus and the r8 first run measured a by-design
    # quadratic (rows x bench = 100x work at 10x copies, 216 s)
    from platform_spark.gate import semantic_decontam_vec_probe

    SDV_BENCH_CAP = 400  # must bind at EVERY rehearsal scale (see above)

    # bench cap 400 (r12, was 4096): the r12 counters showed the old cap
    # binding at sf10 (pre-cap 4878) but NOT at sf1 (pre-cap 488), so the
    # cross-SF ratio measured the fixture's bench growth (8.4x more
    # per-row hash work at sf10), not corpus linearity — the very thing
    # the cap exists to hold constant. 400 binds at every rehearsal
    # scale >= sf1, so the ratio is rows-only again.
    # best-of-2: this leg's single-shot wall spans cold 27 s / warm 18 s
    # at sf1 (Arrow+codegen warmup of the probe shape), and that spread
    # alone pushed the r10 first-cut cross-SF ratio past the 1.25x flag
    # line (12.7x vs a true ~10x) — min-of-2 compares warm vs warm
    runs = []
    for _ in range(2):
        t0 = time.time()
        force(semantic_decontam_vec_probe(spark, args.sf_dir, bench_limit=SDV_BENCH_CAP))
        runs.append(time.time() - t0)
        cleanup()
    timings["llm_semantic_decontam_vec"] = round(min(runs), 3)
    print(f"llm_semantic_decontam_vec: {timings['llm_semantic_decontam_vec']} s", flush=True)

    # attribution counters (r11 verdict #2): the leg's cost model is
    # rows x bench x dim, map-only — record the actual candidate-pair
    # count, the executed plan's Exchange count (must stay 0: any
    # shuffle appearing here IS the regression), and the scan partition
    # count, so a future cross-SF drift is attributable to pair growth
    # vs skew vs a plan change instead of being re-litigated from wall
    # clocks alone.
    from pyspark.sql import functions as F

    from platform_spark.gate import _emb_table

    emb = _emb_table(spark, args.sf_dir)
    n_rows = emb.count()
    n_bench = emb.filter(F.col("vec_id") % 41 == 0).limit(SDV_BENCH_CAP).count()
    probe_df = semantic_decontam_vec_probe(spark, args.sf_dir, bench_limit=SDV_BENCH_CAP)
    plan_str = probe_df._jdf.queryExecution().executedPlan().toString()
    pairs = n_rows * n_bench
    result["semantic_decontam_vec_counters"] = {
        "rows": n_rows,
        "bench": n_bench,
        "candidate_pairs": pairs,
        "n_exchanges": plan_str.count("Exchange"),
        "scan_partitions": emb.rdd.getNumPartitions(),
        "pairs_per_sec": round(pairs / max(min(runs), 1e-9)),
    }
    print(
        "semantic_decontam_vec_counters: "
        f"{result['semantic_decontam_vec_counters']}",
        flush=True,
    )

    if args.curation:
        result["curation"] = run_curation_twins(spark, args.sf_dir, scratch)

    if args.ref and os.path.exists(args.ref):
        ref = json.load(open(args.ref))["queries"]
        result["linearity_vs_ref"] = {
            k: round(v / ref[k], 2)
            for k, v in timings.items()
            if k in ref and ref[k] > 0.05
        }
        result["copies_vs_ref"] = args.copies
        # the assertion commit messages must not be able to drift from:
        # any wall growing meaningfully faster than the row multiple
        # (>1.25x headroom — a perfectly linear op measures ratio ~= copies
        # +- run noise, so the bare multiple would flag noise) is
        # super-linear and gets named in the artifact (empty = linear-ish)
        result["super_linear"] = sorted(
            k
            for k, v in result["linearity_vs_ref"].items()
            if v > 1.25 * max(args.copies, 1.0)
        )
        if result["super_linear"]:
            print(
                f"SUPER-LINEAR at {args.copies}x rows: {result['super_linear']}",
                file=sys.stderr,
            )

    result["total_sec"] = round(sum(timings.values()), 2)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
