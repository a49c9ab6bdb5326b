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


def _misra_gries_grouped(
    batches: Iterator[pd.DataFrame], capacity: int
) -> Iterator[pd.DataFrame]:
    """Per-(partition, group) Misra-Gries summaries over a (grp, token)
    stream — the grouped twin of `_misra_gries_partition`, with the same
    mergeable-summary truncation applied WITHIN each group. State is
    bounded by capacity × groups-present-in-partition. Per batch: one
    two-level value_counts; truncation touches only groups over capacity.
    Emits (grp, token, NULL) candidates plus one (grp, NULL, n_g)
    sentinel per group carrying the exact group token count."""
    summaries: dict = {}
    totals: dict = {}
    for pdf in batches:
        # python loop over GROUPS present in the batch (languages/sources
        # — tens, not data-sized); the token work inside stays vectorized
        for g, sub in pdf.groupby("grp"):
            totals[g] = totals.get(g, 0) + len(sub)
            counts = sub["token"].value_counts()
            s = summaries.get(g)
            s = counts if s is None else s.add(counts, fill_value=0)
            if len(s) > capacity:
                kth = s.nlargest(capacity + 1).iloc[-1]
                s = s - kth
                s = s[s > 0]
            summaries[g] = s
    out_g, out_t, out_n = [], [], []
    for g, s in summaries.items():
        out_g += [g] * len(s)
        out_t += list(s.index.astype(str))
        out_n += [None] * len(s)
    out_g += list(totals.keys())
    out_t += [None] * len(totals)
    out_n += [int(v) for v in totals.values()]
    yield pd.DataFrame({"grp": out_g, "token": out_t, "n": out_n})


def heavy_hitters_by_group(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    phi_num: int = 1,
    phi_den: int = 500,
) -> DataFrame:
    """EXACT per-group heavy hitters: tokens whose count within their
    group is ≥ phi of that GROUP's token count — the per-language /
    per-source top-token table (stopword induction, boilerplate-phrase
    discovery, per-source vocabulary drift).

    Same screen-then-verify recipe and guarantees as `heavy_hitters`,
    applied per group: the pigeonhole recall argument holds within each
    group independently (sum the per-partition group counts), the MG
    truncation runs within groups, and the exact verify restores
    bit-identity with the per-group brute force. Sketch state is
    capacity × |groups|; at 100 TB this is the per-language variant, so
    |groups| is tens, not millions.

    Output: (group, token, n_occurrences, share) — share is within-group,
    rounded to 6 dp.
    """
    if phi_num < 1 or phi_den < 1 or phi_num > phi_den:
        raise ValueError("phi must satisfy 0 < phi_num/phi_den <= 1")
    capacity = math.ceil(phi_den / phi_num)
    toks = df.filter(F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    # derive grp's type from the input: a hard-coded `grp string` would
    # make the candidate semi-join below compare a stringified key against
    # the original-typed column, and an implicit coercion that drops a
    # candidate silently breaks the exact-recall guarantee for int/date
    # group columns
    grp_type = toks.schema["grp"].dataType.simpleString()
    summary = toks.mapInPandas(
        lambda it: _misra_gries_grouped(it, capacity),
        schema=f"grp {grp_type}, token string, n bigint",
    ).localCheckpoint()
    cands = (
        summary.filter(F.col("token").isNotNull())
        .select("grp", "token")
        .distinct()
    )
    totals = (
        summary.filter(F.col("token").isNull())
        .groupBy("grp")
        .agg(F.sum("n").alias("__total"))
    )
    exact = (
        toks.join(F.broadcast(cands), ["grp", "token"], "left_semi")
        .groupBy("grp", "token")
        .agg(F.count("*").alias("n_occurrences"))
    )
    return (
        exact.join(F.broadcast(totals), "grp")
        .filter(
            F.col("n_occurrences") * F.lit(phi_den)
            >= F.lit(phi_num) * F.col("__total")
        )
        .select(
            F.col("grp").alias(group_col),
            "token",
            "n_occurrences",
            F.round(F.col("n_occurrences") / F.col("__total"), 6).alias("share"),
        )
    )
