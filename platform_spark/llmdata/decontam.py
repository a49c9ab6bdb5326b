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

from pyspark.sql import DataFrame
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
