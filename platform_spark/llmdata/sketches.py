"""Frequency-sketch operators: bounded-memory screening + exact verify.

The pattern these operators share is the 100 TB recipe for "find the
frequent things" questions: a per-partition SKETCH pass whose output is
bounded by the sketch capacity (not the data), a tiny candidate union,
and an EXACT verification aggregate restricted to the candidates. The
sketch bounds what shuffles; the verify pass restores exactness, so the
result is bit-identical to the brute-force answer (and to the DuckDB
oracle) — the sketch can only over-select, never miss.

Reference scope note: the reference engine's aggregate surface is the
closed count/min/max/sum/avg set (sql-processor parser.go:522); frequency
mining is north-star extension territory (SURVEY.md §2.10), built
Spark-first.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _misra_gries_partition(
    batches: Iterator[pd.DataFrame], capacity: int
) -> Iterator[pd.DataFrame]:
    """Mergeable Misra-Gries summary of one partition's token stream.

    Per Arrow batch: a vectorized `value_counts` (C speed), merged into
    the running summary by count addition; when the summary exceeds
    `capacity` entries it is truncated by subtracting the (capacity+1)-th
    largest count from every entry and dropping the non-positive ones —
    the standard mergeable-summaries MG merge (Agarwal et al., PODS'12),
    which keeps the undercount error ≤ N_p/(capacity+1) for the whole
    partition. No per-row Python work: each batch is one pandas
    value_counts + one aligned add.

    Emits the candidate tokens (n NULL) plus ONE sentinel row (token
    NULL, n = exact partition token count), so the same single scan
    yields both the candidate set and the exact global total.
    """
    summary = pd.Series(dtype="int64")
    n_seen = 0
    for pdf in batches:
        n_seen += len(pdf)
        counts = pdf["token"].value_counts()
        summary = summary.add(counts, fill_value=0)
        if len(summary) > capacity:
            kth = summary.nlargest(capacity + 1).iloc[-1]
            summary = summary - kth
            summary = summary[summary > 0]
    toks = list(summary.index.astype(str))
    yield pd.DataFrame(
        {"token": toks + [None], "n": [None] * len(toks) + [n_seen]}
    )


def heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    phi_num: int = 1,
    phi_den: int = 500,
) -> DataFrame:
    """EXACT corpus heavy hitters: every token whose occurrence count is
    ≥ (phi_num/phi_den) of the total token count, with its exact count
    and share.

    Two-pass screen-then-verify plan:

    1. **Screen** (bounded memory, bounded shuffle): the token stream —
       a narrow explode, no exchange — runs through a per-partition
       Misra-Gries summary of capacity ``ceil(phi_den/phi_num)`` via
       `mapInPandas`. Pigeonhole guarantees recall under ANY partition
       layout: if a token's global share is ≥ phi, some partition holds
       it with local share ≥ phi (otherwise summing the strict
       inequalities contradicts the global share), and MG with capacity
       m retains every token whose local count exceeds N_p/(m+1) >
       phi·N_p requires m ≥ phi_den/phi_num — which is exactly the
       capacity used. Each partition emits ≤ m tokens, so the candidate
       union shuffles O(m · partitions) rows — never the token stream.
    2. **Verify** (exact): a broadcast semi-join restricts the stream to
       candidates, one partial-aggregating count per token, and the
       integer threshold ``count * phi_den >= phi_num * total`` filters
       false positives. Integer math end to end — no float threshold to
       disagree with the oracle over.

    The result equals the brute-force groupBy-then-filter answer exactly
    (the screen is recall-complete, the verify is precise), while the
    brute force would shuffle every distinct token at 100 TB. The whole
    operator reads the corpus exactly TWICE: the screen pass also emits
    exact per-partition token totals (sentinel rows), and its tiny output
    is locally checkpointed, so candidates + the global total come from
    the one screen scan and the verify is the second.

    Output: (token, n_occurrences, share) — share rounded to 6 dp.
    """
    if phi_num < 1 or phi_den < 1 or phi_num > phi_den:
        raise ValueError("phi must satisfy 0 < phi_num/phi_den <= 1")
    capacity = math.ceil(phi_den / phi_num)
    toks = df.select(
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    summary = toks.mapInPandas(
        lambda it: _misra_gries_partition(it, capacity),
        schema="token string, n bigint",
    ).localCheckpoint()  # ≤ (capacity+1) × partitions rows — one corpus scan
    cands = summary.filter(F.col("token").isNotNull()).select("token").distinct()
    total = summary.filter(F.col("token").isNull()).agg(
        F.sum("n").alias("__total")
    )
    exact = (
        toks.join(F.broadcast(cands), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(
            F.col("n_occurrences") * F.lit(phi_den)
            >= F.lit(phi_num) * F.col("__total")
        )
        .select(
            "token",
            "n_occurrences",
            F.round(F.col("n_occurrences") / F.col("__total"), 6).alias("share"),
        )
    )
