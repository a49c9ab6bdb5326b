"""Benchmark decontamination: flag training documents that overlap an
evaluation/benchmark set.

The published recipe (GPT-3 appx. C, PaLM §7, Llama) is n-gram collision:
a training document is contaminated if it shares at least ``min_common``
distinct k-word shingles with any benchmark document. At 100 TB the only
viable plan is the same inverted-index join the n-gram dedup path uses —
shingle both sides, join on the (hashed) shingle, aggregate per pair:

- shuffle volume is O(total shingles), never O(docs × bench);
- the benchmark side is small (eval sets are thousands of docs), so its
  shingle index broadcasts and the probe is a map-side hash join over the
  training scan — ZERO shuffle of the 100 TB side when it fits;
- join keys are 60-bit md5-derived ints (portable to the DuckDB oracle),
  not strings.

Semantics are exact (no banding/sketching): decontamination is a recall-
critical filter, so candidates are counted directly rather than sampled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from platform_spark.llmdata.dedup import _shingle_table, md5_int


def contamination(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
    k: int = 8,
    min_common: int = 1,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-document contamination report against a benchmark corpus.

    Returns one row per training document that shares >= ``min_common``
    distinct k-shingles with the benchmark set:

    ``(doc_id, n_common, n_bench_docs, worst_bench_id, worst_common)``

    - ``n_common``: distinct contaminated shingles in the doc (a shingle
      found in any bench doc counts once);
    - ``n_bench_docs``: how many distinct bench docs it collides with;
    - ``worst_bench_id`` / ``worst_common``: the bench doc sharing the
      most shingles (ties broken by smallest bench id — deterministic).

    Filter the training set with an anti-join on the result to drop, or
    join it back to keep the counts as features.
    """
    d_sh = _shingle_table(docs, text_col, id_col, k).select(
        "doc_id", md5_int(F.col("shingle")).alias("sh")
    )
    b_sh = (
        _shingle_table(bench, bench_text_col, bench_id_col, k)
        .select(
            F.col("doc_id").alias("bench_id"), md5_int(F.col("shingle")).alias("sh")
        )
    )
    if broadcast_bench:
        b_sh = F.broadcast(b_sh)
    hits = d_sh.join(b_sh, "sh")
    per_pair = hits.groupBy("doc_id", "bench_id").agg(
        F.count("*").alias("pair_common")
    )
    per_doc = (
        hits.groupBy("doc_id")
        .agg(
            F.count_distinct("sh").alias("n_common"),
            F.count_distinct("bench_id").alias("n_bench_docs"),
        )
    )
    worst = per_pair.groupBy("doc_id").agg(
        F.max(
            F.struct(
                F.col("pair_common"), (-F.col("bench_id")).alias("neg_bench")
            )
        ).alias("__w")
    ).select(
        "doc_id",
        (-F.col("__w.neg_bench")).alias("worst_bench_id"),
        F.col("__w.pair_common").alias("worst_common"),
    )
    return (
        per_doc.join(worst, "doc_id")
        .filter(F.col("n_common") >= min_common)
        .select("doc_id", "n_common", "n_bench_docs", "worst_bench_id", "worst_common")
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
    k: int = 8,
    min_common: int = 1,
) -> DataFrame:
    """The filter form: training docs with contaminated rows removed
    (left_anti join on the contamination report — stays one plan)."""
    bad = contamination(
        docs,
        bench,
        text_col=text_col,
        id_col=id_col,
        bench_text_col=bench_text_col,
        bench_id_col=bench_id_col,
        k=k,
        min_common=min_common,
    ).select(F.col("doc_id").alias(id_col))
    return docs.join(bad, id_col, "left_anti")


# semantic (embedding-space) decontamination --------------------------------
#
# The n-gram recipe above misses paraphrased benchmark copies — the leak
# PaLM §7 / GPT-4 contamination appendices call out as the hard case. The
# embedding-side complement flags a training row whose vector is within a
# cosine threshold of ANY eval-set vector.
#
# 100 TB plan: an eval embedding set is small by construction (thousands of
# vectors × dim floats ≈ MBs), so it rides into every task as TWO Literal
# nodes (one nested double matrix + one id array) — scoring is then a
# map-only expression over the corpus scan: no join, no shuffle, no
# aggregation of the training side at all. The bench matrix is folded ONCE
# per row (the scored transform is referenced exactly once by one
# `aggregate`), so per-row cost is n_bench × dim fused-codegen flops. If an
# eval set ever outgrows a comfortable literal (~10^5 vectors), fall back
# to the broadcast-join shape `contamination` uses for shingles.


def _bench_literals(
    bench: DataFrame, bench_vec_col: str, bench_id_col: str
) -> tuple[Column, Column, int]:
    """Collect the (bounded, eval-set-sized) bench side into two Literal
    columns, sorted by bench id ASC so the fold's strictly-greater update
    resolves cosine ties to the smallest bench id."""
    rows = sorted(
        (r[0], r[1])
        for r in bench.select(bench_id_col, bench_vec_col).collect()
        if r[1] is not None
    )
    vmat = F.lit([[float(x) for x in v] for _, v in rows]).cast(
        "array<array<double>>"
    )
    bids = F.lit([int(i) for i, _ in rows]).cast("array<bigint>")
    return vmat, bids, len(rows)


def _scored_expr(
    vec: Column, vmat: Column, bids: Column
) -> Column:
    """array<struct<c: cosine(vec, bench_j) rounded to 6dp, i: bench id>>,
    in bench-id order. One transform computes each cosine exactly once;
    zip_with references it once, so nothing re-folds the matrix."""
    from platform_spark.llmdata.similarity import dot_expr, norm_expr, to_double

    v = to_double(vec)
    sims = F.transform(
        vmat,
        lambda b: F.round(dot_expr(v, b) / (norm_expr(v) * norm_expr(b)), 6),
    )
    return F.zip_with(
        sims, bids, lambda c, i: F.struct(c.alias("c"), i.alias("i"))
    )


def semantic_contamination(
    vecs: DataFrame,
    bench: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bench_vec_col: str = "embedding",
    bench_id_col: str = "bench_id",
    threshold: float = 0.85,
    min_hits: int = 1,
) -> DataFrame:
    """Per-row semantic contamination report against an eval embedding set.

    Returns one row per training vector with >= ``min_hits`` bench vectors
    at cosine >= ``threshold``:

    ``(vec_id, n_bench_hits, worst_bench_id, worst_cosine)``

    ``worst_*`` is the closest bench vector (ties to the smallest bench
    id — deterministic). Rows whose vector is NULL cannot hit and are
    absent from the report.
    """
    vmat, bids, n_bench = _bench_literals(bench, bench_vec_col, bench_id_col)
    if n_bench == 0:
        return (
            vecs.select(F.col(id_col))
            .filter(F.lit(False))
            .select(
                id_col,
                F.lit(0).cast("bigint").alias("n_bench_hits"),
                F.lit(None).cast("bigint").alias("worst_bench_id"),
                F.lit(None).cast("double").alias("worst_cosine"),
            )
        )
    scored = _scored_expr(F.col(vec_col), vmat, bids)
    acc0 = F.struct(
        F.lit(0).alias("n"),
        F.lit(None).cast("bigint").alias("wid"),
        F.lit(None).cast("double").alias("wc"),
    )
    t = F.lit(float(threshold))

    def step(acc: Column, s: Column) -> Column:
        hit = s["c"] >= t
        better = hit & (acc["wc"].isNull() | (s["c"] > acc["wc"]))
        return F.struct(
            (acc["n"] + F.when(hit, F.lit(1)).otherwise(F.lit(0))).alias("n"),
            F.when(better, s["i"]).otherwise(acc["wid"]).alias("wid"),
            F.when(better, s["c"]).otherwise(acc["wc"]).alias("wc"),
        )

    r = F.aggregate(scored, acc0, step)
    return (
        vecs.select(F.col(id_col), r.alias("__r"))
        .filter(F.col("__r.n") >= int(min_hits))
        .select(
            id_col,
            F.col("__r.n").cast("bigint").alias("n_bench_hits"),
            F.col("__r.wid").alias("worst_bench_id"),
            F.col("__r.wc").alias("worst_cosine"),
        )
    )


def semantic_decontaminate(
    df: DataFrame,
    bench: DataFrame,
    vec_col: str = "embedding",
    bench_vec_col: str = "embedding",
    bench_id_col: str = "bench_id",
    threshold: float = 0.85,
) -> DataFrame:
    """The filter form: rows within ``threshold`` cosine of any eval
    vector are dropped — a single map-only filter over the scan (no join,
    no shuffle). Rows with a NULL vector cannot be contaminated and are
    KEPT (the exists-NULL is coalesced to false)."""
    vmat, bids, n_bench = _bench_literals(bench, bench_vec_col, bench_id_col)
    if n_bench == 0:
        return df
    scored = _scored_expr(F.col(vec_col), vmat, bids)
    hit = F.exists(scored, lambda s: s["c"] >= F.lit(float(threshold)))
    return df.filter(~F.coalesce(hit, F.lit(False)))
