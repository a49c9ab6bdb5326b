"""Regenerate PLANS.md: formatted physical plans for the hot paths, with
the scale-critical properties called out (pruning, pushdown, broadcast,
codegen, no Window on the topic scan path).

    python tools/plan_audit.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from platform_spark.gate import catalog_for, engine_for
    from platform_spark.llmdata import dedup
    from platform_spark.operators.sessionize import sessionize
    from platform_spark.session import get_spark

    spark = get_spark("plan-audit")
    eng = engine_for(spark, args.sf)
    eng.opt.enable_cache = False  # audit real scan plans, not cache hits
    cat = catalog_for(spark, args.sf)

    sections: list[tuple[str, str, list[str], str]] = []

    def add(title: str, note: str, checks: list[str], df) -> None:
        sections.append((title, note, checks, formatted(df)))

    add(
        "Filtered topic scan",
        "Partition pruning (`_partition=2` → one directory) and `_ts`/`_offset` "
        "predicate pushdown into the parquet scan; vectorized reader.",
        ["PartitionFilters", "PushedFilters", "Batched: true"],
        eng.sql(
            "SELECT _offset, _ts FROM events WHERE _partition = 2 "
            "AND _ts >= '2024-01-15 00:00:00' LIMIT 100000"
        ),
    )
    add(
        "Aggregate with JSON coercion",
        "Partial (map-side) HashAggregate before the exchange; one shuffle on "
        "the group key; whole-stage codegen end to end.",
        ["HashAggregate", "Exchange"],
        eng.sql(
            "SELECT event_type, count(*) AS n, sum(json_value(_value, '$.amount')) AS s "
            "FROM events LAST 30d GROUP BY event_type LIMIT 100000"
        ),
    )
    add(
        "WITHIN join",
        "Small side broadcast (no shuffle of the big side); the WITHIN band is "
        "a join condition; the derived right-side `_ts` bound reaches the right "
        "scan (the reference scans the right side unfiltered).",
        ["BroadcastHashJoin", "PushedFilters"],
        eng.sql(
            "SELECT o._key AS k FROM orders o JOIN payments p ON o._key = p._key "
            "WITHIN 10m LAST 15000d LIMIT 100000"
        ),
    )
    add(
        "MinHash signatures",
        "One explode + two md5s per shingle (KM permutations h1+j*h2), one "
        "shuffle for the 32-way min aggregate — map-side partial aggregation "
        "keeps the exchange narrow.",
        ["HashAggregate", "Generate"],
        dedup.minhash_signatures(cat.table("documents")),
    )
    add(
        "Sessionization",
        "lag + running sum in one window (single hash-partition exchange on the "
        "key), then the session aggregate.",
        ["Window", "Exchange"],
        sessionize(cat.topic("events"), key_col="user_id", gap_seconds=21600),
    )
    from platform_spark.operators.asof import asof_join

    pays = cat.topic("payments", with_schema_columns=False).select(
        "_key", "_offset", "_ts"
    )
    ords = cat.topic("orders", with_schema_columns=False).select(
        "_key", "_offset", "_ts"
    )
    add(
        "As-of join",
        "Union-window formulation: ONE exchange on the key, a linear window "
        "pass — no range-join candidate explosion, no BroadcastNestedLoop.",
        ["Window", "Union"],
        asof_join(pays, ords, "_key", "_ts", ["_offset"], tiebreak_col="_offset"),
    )

    from platform_spark.llmdata.sampling import kmv_distinct, weighted_mix

    add(
        "KMV distinct sketch",
        "Distinct on (group, hash) partial-aggregates map-side; the per-group "
        "top-k touches only k survivors per group — two narrow exchanges, "
        "no wide state.",
        ["HashAggregate", "Exchange", "WindowGroupLimit"],
        kmv_distinct(cat.table("documents"), "text", ("lang",), k=16),
    )
    add(
        "Weighted dataset mixing",
        "Pure per-row hash filter — NO exchange at all: the scan stays "
        "embarrassingly parallel and the filter sits directly on the "
        "vectorized parquet read.",
        ["Filter", "Batched: true"],
        weighted_mix(
            cat.table("documents"), "source", {"src0": 1.0, "src1": 0.5}
        ),
    )

    from platform_spark.llmdata.chunking import chunk_documents
    from platform_spark.llmdata.decontam import contamination

    docs = cat.table("documents")
    bench = docs.limit(50).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    add(
        "Benchmark decontamination",
        "The benchmark shingle index broadcasts, so the (100 TB) training-side "
        "shingle stream is probed map-side — the only exchanges are the "
        "per-doc aggregates of the (tiny) hit set.",
        ["BroadcastHashJoin", "HashAggregate", "Generate"],
        contamination(docs, bench, k=8),
    )
    from platform_spark.llmdata.dedup import dedup_incremental_report

    docs_full = cat.table("documents")
    newb = docs_full.filter(F.col("doc_id") % 10 == 1).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    add(
        "Incremental snapshot dedup",
        "Exact layer: the (small) delta's 16-byte content hashes broadcast "
        "against the corpus scan. Near layer: minhash_join's banding — "
        "candidates from one (band, bucket) equi-join; nothing pairwise "
        "touches non-candidate rows.",
        ["BroadcastHashJoin", "HashAggregate"],
        dedup_incremental_report(newb, docs_full, threshold=0.4),
    )

    from platform_spark.llmdata.snapshots import snapshot_diff

    old_snap = docs_full.filter(F.col("doc_id") % 9 != 0)
    new_snap = docs_full.filter(F.col("doc_id") % 7 != 0)
    add(
        "Snapshot diff (full-outer)",
        "One shuffle per side on the id, map-side 16-byte hashes (text "
        "never rides the exchange), SortMergeJoin FullOuter, then a "
        "filter that drops the unchanged majority so the result stays "
        "delta-sized.",
        ["FullOuter", "SortMergeJoin"],
        snapshot_diff(old_snap, new_snap),
    )

    from platform_spark.operators.sessionize import sessionize_native

    add(
        "Native session windows",
        "Spark's built-in session aggregate: partial merge map-side, one "
        "exchange on the key, sessions merged in the sort-based "
        "aggregation — no lag/cumsum window chain, streaming-ready.",
        ["Exchange", "session_window"],
        sessionize_native(
            cat.table("events"), key_col="user_id", ts_col="ts", gap="6 hours"
        ),
    )

    from platform_spark.llmdata.decontam import semantic_contamination

    emb = cat.table("embeddings")
    add(
        "Semantic decontamination",
        "The eval vector set rides as ONE literal matrix; scoring is a "
        "map-only fold over the scan — no join, no shuffle, no exchange. "
        "The fold appears twice (filter + project), a constant factor on "
        "an embarrassingly-parallel stage.",
        ["Filter", "Batched: true"],
        semantic_contamination(
            emb,
            emb.limit(20).selectExpr("vec_id AS bench_id", "embedding"),
            threshold=0.35,
        ),
    )
    add(
        "Token-window chunking",
        "sequence+transform+explode directly over the vectorized scan: NO "
        "exchange anywhere — rows expand in place at scan parallelism.",
        ["Generate", "Batched: true"],
        chunk_documents(docs, chunk_size=32, overlap=8),
    )

    from platform_spark.gate import GATE

    add(
        "TPC-H q21 semi/anti join",
        "The EXISTS subquery plans as a left-SEMI join and the correlated "
        "NOT EXISTS as a left-ANTI join — both on `l_orderkey`, no "
        "BroadcastNestedLoop; the small dims (supplier, nation) broadcast.",
        ["LeftSemi", "LeftAnti", "BroadcastHashJoin"],
        GATE["analytics_q21_waiting_suppliers"][0](spark, args.sf),
    )
    add(
        "TPC-H q8 eight-table join",
        "Every dimension (part, supplier, customer, nation×2, region) "
        "broadcasts, so the fact tables (lineitem, orders) shuffle only for "
        "their own equi-join; the CASE-ratio aggregate partial-aggregates "
        "map-side.",
        ["BroadcastHashJoin", "HashAggregate"],
        GATE["analytics_q8_market_share"][0](spark, args.sf),
    )
    add(
        "TPC-H q9 through derived partsupp",
        "partsupp is derived inline (part scan × 4 with a broadcast 1-row "
        "supplier count — no shuffle added by the derivation); part, "
        "supplier, nation and the derived partsupp all broadcast against "
        "the lineitem scan; profit aggregate partial-aggregates map-side.",
        ["BroadcastHashJoin", "HashAggregate"],
        GATE["analytics_q9_product_profit"][0](spark, args.sf),
    )
    add(
        "IVF ANN (k-means centroids)",
        "Corpus→bucket assignment is a pure projection over one nested-array "
        "centroid Literal (NO exchange — the scan stays embarrassingly "
        "parallel; at 100 TB the bucket id becomes the partitioning key); "
        "queries broadcast into the bucket join; per-query top-k is a "
        "window over the (small) probed candidate set.",
        ["BroadcastHashJoin", "Window", "Batched: true"],
        GATE["llm_ann_ivf_kmeans"][0](spark, args.sf),
    )

    from platform_spark.llmdata.clusters import dedup_clusters_fast

    add(
        "Fast dedup clusters (exact-collapse)",
        "Exact duplicates collapse through ONE hash aggregate on a 16-byte "
        "content hash before any similarity work, so candidate generation "
        "and label propagation run on distinct contents only — pair volume "
        "is linear in docs, not in O(copies²). The plan below is the "
        "expansion join back to all docs (content-hash equi-join); the "
        "propagation loop itself is the audited llm_dedup_clusters shape.",
        ["HashAggregate", "Exchange"],
        dedup_clusters_fast(cat.table("documents")),
    )

    from platform_spark import kfs as kfsmod
    from platform_spark.gate import _ensure_kfs_export

    add(
        "Native .kfs segment scan",
        "binaryFile source (one task per segment object — the reference's "
        "one-GET-per-segment parallelism) feeding an Arrow-batched "
        "mapInPandas decode; no exchange anywhere — the scan is "
        "embarrassingly parallel and offset bounds prune whole record "
        "batches inside the decoder before any record is touched.",
        ["MapInPandas", "Scan binaryFile"],
        kfsmod.read_kfs(spark, _ensure_kfs_export(spark, args.sf), "events"),
    )

    from platform_spark.llmdata.bpe import bpe_pair_counts
    from platform_spark.llmdata.dedup import duplicate_spans

    add(
        "BPE pair counts",
        "The corpus collapses to a word-frequency table first (token-keyed "
        "partial aggregate), so the pair explode + aggregate below runs on "
        "|vocab|-sized data — every BPE merge round shares this shape. Both "
        "aggregates partial-aggregate map-side.",
        ["HashAggregate", "Exchange"],
        bpe_pair_counts(cat.table("documents"), top_k=200),
    )
    add(
        "Exact-substring duplicate spans",
        "Positional k-token windows shuffle as 8-byte md5 ints (not span "
        "text): one span-keyed partial aggregate for occurrence counts, one "
        "span-keyed join back, one doc-keyed aggregate. No window function, "
        "no global sort.",
        ["HashAggregate", "Exchange"],
        duplicate_spans(cat.table("documents")),
    )

    from platform_spark.llmdata.selection import dsir_scores

    add(
        "DSIR importance scoring",
        "The per-bucket log-ratio weight table (≤ n_buckets rows) broadcasts, "
        "so the raw corpus is scored map-side — the big side shuffles only on "
        "doc_id for the final mean. Distribution builds are bucket-keyed "
        "partial aggregates.",
        ["BroadcastHashJoin", "HashAggregate"],
        dsir_scores(
            cat.table("documents"),
            cat.table("documents").filter(F.col("lang") == "de"),
        ),
    )
    from platform_spark.operators.ranges import interval_join

    ev = spark.table("events")
    _ep = F.unix_timestamp(F.col("ts"))
    add(
        "Interval-overlap join",
        "The overlap theta-condition rides a bucket equi-join (explode to "
        "covered buckets, keep each pair only in max(lo)'s bucket) — an "
        "Exchange-based hash join, never BroadcastNestedLoop/Cartesian.",
        ["Exchange"],
        interval_join(
            ev.filter(F.col("event_type") == "click").select(
                "event_id", "user_id", _ep.alias("lo_a"), (_ep + 600).alias("hi_a")
            ),
            ev.filter(F.col("event_type") == "purchase").select(
                F.col("event_id").alias("b_id"), "user_id",
                (_ep - 300).alias("lo_b"), (_ep + 300).alias("hi_b"),
            ),
            "lo_a", "hi_a", "lo_b", "hi_b", bucket_width=900.0, key_col="user_id",
        ),
    )
    from platform_spark.llmdata.dedup import remove_duplicate_spans

    add(
        "Exact-substring removal",
        "Same span-hash aggregate/join front as the metrics leg; covered "
        "positions then collapse to ONE array per doc (collect_list of span "
        "starts) and tokens drop via an array filter — no per-token "
        "explode/shuffle, the wide exchanges carry span hashes and one row "
        "per doc.",
        ["HashAggregate", "Exchange"],
        remove_duplicate_spans(cat.table("documents")),
    )
    from platform_spark.llmdata.similarity import semantic_dedup, sq_topk

    add(
        "SemDeDup semantic dedup",
        "Centroid assignment is a shuffle-free map over one literal matrix; "
        "ranking shuffles once on the bucket; the predecessor scan is a "
        "bucket-keyed equi-join (pairwise work bounded by cluster size, "
        "never a cartesian product).",
        ["Exchange", "Window"],
        semantic_dedup(cat.table("embeddings"), n_clusters=8, dim=64),
    )

    from platform_spark.llmdata.sketches import heavy_hitters

    add(
        "Heavy hitters (Misra-Gries screen + exact verify)",
        "The token stream never shuffles raw: the MG screen is a narrow "
        "mapInPandas whose output is bounded by capacity × partitions, the "
        "candidate set broadcasts into a semi-join, and only candidate "
        "tokens reach the count aggregate. The 1-row total broadcasts.",
        ["BroadcastHashJoin", "HashAggregate"],
        heavy_hitters(cat.table("documents"), "text", 1, 500),
    )
    from platform_spark.llmdata.er import edit_distance_rep_pairs

    add(
        "Edit-distance rep pairs (PassJoin blocking)",
        "Candidates come from a hash equi-join on (length, segment-index, "
        "segment-text) — never a cartesian product; the probe side's "
        "(2d+1)²(d+1) enumeration is ONE literal-array explode; levenshtein "
        "runs only on the post-distinct candidate pairs. Everything before "
        "the join is whole-stage codegen over the distinct-value rep table.",
        ["Exchange", "HashAggregate"],
        edit_distance_rep_pairs(
            cat.table("part").select(F.col("p_name").alias("name")), "name"
        ),
    )
    from platform_spark.llmdata.pq_pinned import PQ_CODEBOOK_SF001
    from platform_spark.llmdata.similarity import pq_topk

    add(
        "Product-quantized ANN (ADC screen + exact rerank)",
        "The codebook is one nested Literal; each subspace's argmin is "
        "inlined exactly once in the dequantize expression (routing it "
        "through a codes column is a CollapseProject trap that multiplies "
        "the assignment m-fold after pruning — measured 2 s → 17 s). The "
        "query side broadcasts; the screen emits scalars into the per-query "
        "top-k window.",
        ["BroadcastNestedLoopJoin", "Window"],
        pq_topk(
            cat.table("embeddings"),
            cat.table("embeddings").filter(F.col("vec_id") < 8),
            k=5, codebook=PQ_CODEBOOK_SF001, rerank=4,
        ),
    )
    from platform_spark.llmdata.sampling import mix_temperature

    add(
        "Temperature mixture (UniMax alpha=0.5)",
        "The group-count aggregate collapses to one row per group, "
        "broadcasts back (BroadcastHashJoin — the corpus side never "
        "re-shuffles for the quota), and selection is one window per group "
        "partition. Integer quota math end to end.",
        ["BroadcastHashJoin", "Window"],
        mix_temperature(cat.table("documents"), 200, group_col="lang"),
    )

    from platform_spark.llmdata.similarity import ivfpq_topk

    add(
        "IVF+PQ composed ANN",
        "The bucket equi-join bounds what each query touches (n_probe of "
        "n_centroids buckets — a broadcast hash join on the bucket key, "
        "never a full cross join); the PQ screen and rerank run only on "
        "bucket-matched candidates.",
        ["BroadcastHashJoin", "Window"],
        ivfpq_topk(
            cat.table("embeddings"),
            cat.table("embeddings").filter(F.col("vec_id") < 8),
            k=5, n_centroids=16, n_probe=4,
            codebook=PQ_CODEBOOK_SF001, rerank=4, dim=64,
        ),
    )
    from platform_spark.llmdata.cleaning import calibrate_scores, normalize_text

    add(
        "Unicode NFC normalization",
        "The one legitimate pandas-UDF map (no JVM Unicode-normalization "
        "expression exists): ArrowEvalPython directly over the scan — "
        "ZERO exchanges, fully pipelined.",
        ["ArrowEvalPython"],
        normalize_text(cat.table("documents"), "text"),
    )
    from platform_spark.gate import _ensure_iceberg_table
    from platform_spark.iceberg.table import IcebergTable

    _itbl = IcebergTable.load(_ensure_iceberg_table(spark, args.sf))
    add(
        "Iceberg metadata-planned scan (pure-Python v2 table, lang pruned)",
        "File pruning happens in the METADATA layer before Spark plans "
        "anything: manifest partition summaries skip whole manifests, entry "
        "partition values skip files, and the scan node receives only the "
        "surviving file list — executor work is O(matching files) regardless "
        "of table history. Projection/footer pushdown then apply per file "
        "as usual; no Filter node is needed for the partition predicate.",
        ["Scan parquet", "Batched: true"],
        _itbl.to_spark(spark, partition_filter={"lang": "de"}),
    )
    _dtbl = IcebergTable.load(
        _ensure_iceberg_table(spark, args.sf, with_deletes=True)
    )
    add(
        "Iceberg merge-on-read position deletes (broadcast anti-join)",
        "Row-level deletes never rewrite data: the scan streams every live "
        "data file once and anti-joins its constant-cost _metadata "
        "(file_path, row_index) identity against the position-delete files, "
        "broadcast because the manifests record their size up front — so "
        "at 100 TB the deletes (KBs of row ids) ship to every executor and "
        "the data side needs NO shuffle, no sort, no extra pass.",
        ["BroadcastHashJoin", "LeftAnti", "row_index"],
        _dtbl.to_spark(spark),
    )
    import datetime as _dt

    from platform_spark.gate import _ensure_iceberg_day_table

    _daytbl = IcebergTable.load(_ensure_iceberg_day_table(spark, args.sf))
    add(
        "Iceberg hidden time partitioning (day transform, one UTC day)",
        "days(_ts) partition values live only in paths/manifests (_ts "
        "stays a data column): a date filter normalizes to int "
        "days-since-epoch and prunes manifests by value-ordered summaries "
        "and entries by partition value, so the scan node receives only "
        "that day's files — the ingest-by-day / prune-by-day layout a "
        "100 TB corpus table runs on, with no derived date column stored "
        "in the data.",
        ["Scan parquet", "Batched: true"],
        _daytbl.to_spark(
            spark, partition_filter={"_ts_day": _dt.date(2024, 1, 15)}
        ),
    )
    # month/hour transform twins of the day audit above: tiny scratch
    # tables (the transform machinery is what's audited, not volume),
    # with the ACTUAL pruned-vs-total file counts embedded in the note so
    # the record shows the file-list pruning, not just the plan shape
    import shutil as _sh

    from platform_spark.iceberg.table import append_dataframe as _append

    _mroot = os.path.join(REPO, ".bench", "plan_month_tbl")
    _sh.rmtree(_mroot, ignore_errors=True)
    _mrows = spark.range(0, 600).select(
        F.col("id"),
        F.expr(
            "timestamp'2024-01-01 00:00:00' + "
            "make_interval(0, CAST(id % 6 AS INT), 0, 0, 0, 0, 0)"
        ).alias("ts"),
    )
    _mtbl = IcebergTable.create(_mroot, _mrows.schema, partition_by=("months(ts)",))
    _append(_mtbl, _mrows)
    _march = (2024 - 1970) * 12 + 3 - 1  # months-since-epoch for 2024-03
    _m_total = len(_mtbl.scan_files())
    _m_hit = len(_mtbl.scan_files(partition_filter={"ts_month": _march}))
    add(
        "Iceberg hidden time partitioning (month transform, one month)",
        "months(ts) partitions by int months-since-epoch derived from ts "
        "(ts stays a data column); the month filter prunes at the "
        "manifest layer before Spark plans anything — here "
        f"{_m_hit} of {_m_total} live files survive the 2024-03 filter "
        "and only they reach the scan node.",
        ["Scan parquet", "Batched: true"],
        _mtbl.to_spark(spark, partition_filter={"ts_month": _march}),
    )
    _hroot = os.path.join(REPO, ".bench", "plan_hour_tbl")
    _sh.rmtree(_hroot, ignore_errors=True)
    _hrows = spark.range(0, 480).select(
        F.col("id"),
        F.expr(
            "timestamp'2024-01-01 00:00:00' + "
            "make_interval(0, 0, 0, 0, CAST(id % 48 AS INT), 0, 0)"
        ).alias("ts"),
    )
    _htbl = IcebergTable.create(_hroot, _hrows.schema, partition_by=("hours(ts)",))
    _append(_htbl, _hrows)
    _h13 = int(
        _dt.datetime(2024, 1, 1, 13, tzinfo=_dt.timezone.utc).timestamp() // 3600
    )
    _h_total = len(_htbl.scan_files())
    _h_hit = len(_htbl.scan_files(partition_filter={"ts_hour": _h13}))
    add(
        "Iceberg hidden time partitioning (hour transform, one hour)",
        "hours(ts) partitions by int hours-since-epoch — the "
        "late-data/streaming-ingest layout where a reprocessing window is "
        "an hour, not a day; here "
        f"{_h_hit} of {_h_total} live files survive the 13:00 UTC filter "
        "and only they reach the scan node.",
        ["Scan parquet", "Batched: true"],
        _htbl.to_spark(spark, partition_filter={"ts_hour": _h13}),
    )

    from platform_spark import envelope as _env
    from platform_spark.topics import materialize_envelope

    add(
        "Fixture ingest: chunked two-phase offset rank",
        "The envelope's per-partition ROW_NUMBER would sort a whole topic "
        "partition in ONE task (4 fixture partitions -> 4 sort tasks; sf10 "
        "measured 17.9x wall at 10x rows from sort spill). The "
        "materializer instead interval-chunks the order key, broadcasts "
        "cumulative per-(chunk, partition) bases, and ranks each chunk "
        "slice locally — the Window's sort groups are (chunk, partition), "
        "so task sort size is bounded by the chunk span, not the "
        "partition, and the plan stays one shuffle wide at any scale. "
        "Output is bit-identical to the window (tests/test_topics.py).",
        ["Window", "__chunk", "BroadcastHashJoin"],
        materialize_envelope(
            "events",
            spark.sql(_env.ENVELOPE_BUILDERS["events"](_env.SPARK)),
            rows_per_chunk=50,
        ),
    )
    add(
        "Robust score calibration (median/MAD z)",
        "Both percentile aggregates collapse to one row per group and "
        "broadcast back — the corpus side is scanned, never shuffled; "
        "degenerate-MAD guard is a pure expression.",
        ["BroadcastHashJoin", "HashAggregate"],
        calibrate_scores(cat.table("documents"), "n_chars", group_col="source"),
    )

    out = [
        "# PLANS.md — physical-plan audit of the hot paths",
        "",
        f"Regenerate with `python tools/plan_audit.py` (sf dir: `{args.sf}`).",
        "Each section lists the scale-critical properties the plan must show;",
        "`tests/test_plans.py` asserts the same properties in CI.",
        "",
    ]
    ok = True
    for title, note, checks, plan in sections:
        out.append(f"## {title}")
        out.append("")
        out.append(note)
        out.append("")
        for c in checks:
            mark = "x" if c in plan else " "
            if c not in plan:
                ok = False
            out.append(f"- [{mark}] `{c}`")
        out.append("")
        out.append("```")
        out.append(plan.strip()[:4000])
        out.append("```")
        out.append("")
    out += [
        "## Note: similarity-family wall times (round-4 audit)",
        "",
        "The r2→r3 upward drift of the similarity family (embedding_neardup",
        "5.1→7.1 s, ivf 3.0→3.4 s at sf0.1) was profiled in round 4: the",
        "dominant fixed cost was analysis + whole-stage-codegen compilation of",
        "the literal hyperplane/centroid matrices, which were built as",
        "n_planes×dim trees of CreateArray nodes (≈1 s extra on FIRST",
        "execution of each plan shape at 16×64, growing with matrix size).",
        "Both matrices are now a single nested-array Literal node — measured",
        "first-run 2.24→0.83 s for the 16×64 assignment expression, steady",
        "0.9→0.8 s — and a `dim` parameter skips the 1-row vector-width probe",
        "job. Remaining wall is the real work (candidate join + exact",
        "verify), linear in emitted candidates. Note the driver regenerated",
        "all fixtures at the start of round 4 (ts columns went nanos→micros),",
        "so r4 per-query numbers are not strictly comparable to r2/r3.",
        "",
    ]
    # preserve hand-recorded audit sections (round-10+ entries like the
    # wide-window fold, the partsupp adjudication, zorder measurements):
    # everything from the MANUAL marker down survives regeneration
    manual_tail = ""
    plans_path = os.path.join(REPO, "PLANS.md")
    marker = "<!-- MANUAL ENTRIES BELOW"
    if os.path.exists(plans_path):
        prev = open(plans_path).read()
        i = prev.find(marker)
        if i >= 0:
            manual_tail = "\n" + prev[i:]
    with open(plans_path, "w") as f:
        f.write("\n".join(out) + manual_tail)
    print(f"PLANS.md written; all checks present: {ok}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
