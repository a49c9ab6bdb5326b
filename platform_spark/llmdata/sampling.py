"""Deterministic sampling, mixing, and cardinality sketches for
training-data pipelines.

Everything here is *content-stable*: decisions derive from the portable
60-bit md5 hash (`dedup.md5_int` — bit-identical in any engine), never
from `rand()` or partition layout. Re-running on re-sharded, re-ordered,
or incrementally-grown data reproduces the same sample / estimate, which
is what makes these usable for dataset versioning at 100 TB (same stance
as `splits.deterministic_split`).

Operators:
- `kmv_distinct`: K-Minimum-Values distinct-count sketch. The k smallest
  hashes per group summarize cardinality: est = (k-1) / u_k where u_k is
  the k-th smallest hash normalized to [0,1). Groups with < k distinct
  values report exactly. One shuffle (the group-by); k bounds per-group
  state, so skewed groups cost O(k log k) in the sort, not O(n).
- `stratified_sample`: exactly n rows per stratum, chosen by hash rank —
  the deterministic equivalent of per-stratum reservoir sampling.
- `weighted_mix`: per-category keep-rates (dataset mixing weights): row
  kept iff its hash-uniform u < weight[category]. A pure per-row filter —
  no shuffle at all, the scan stays embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from platform_spark.llmdata.dedup import md5_int

#: 2^60 — the hash space of `md5_int` (15 hex digits)
_HASH_SPACE = float(1 << 60)


def _u(col: Column, seed: str) -> Column:
    """Hash-uniform in [0, 1): portable across engines."""
    return md5_int(col, seed=seed).cast("double") / F.lit(_HASH_SPACE)


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    k: int = 64,
) -> DataFrame:
    """Distinct-count estimate per group via the KMV sketch.

    Exact when a group has fewer than k distinct values (the sketch IS the
    value set), (k-1)/u_k otherwise — standard error ~ 1/sqrt(k-2). The
    estimate is deterministic (hash-defined), so unlike HLL
    implementations it reproduces bit-for-bit in any engine sharing the
    hash — the DuckDB gate oracle recomputes it exactly.

    KMV sketches merge by set-union + re-truncate, so at 100 TB this
    shape partial-aggregates: the `distinct` dedups map-side, and the
    per-group top-k touches only k survivors per group.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    h = md5_int(F.col(value_col), seed="kmv:")
    # NULL values are excluded (a NULL hash would sort NULLS-FIRST in Spark
    # but NULLS-LAST in most SQL engines — an ordering-parity trap — and a
    # NULL contributes nothing to cardinality anyway)
    hashed = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, h.alias("__h"))
        .distinct()
    )
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("__h")
    topk = hashed.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    est = F.when(
        F.count("*") < k, F.count("*").cast("bigint")
    ).otherwise(
        F.floor(
            F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.max("__h").cast("double")
        ).cast("bigint")
    )
    return topk.groupBy(*group_cols).agg(est.alias("distinct_est"))


def stratified_sample(
    df: DataFrame,
    strata_cols: tuple[str, ...],
    n_per_stratum: int,
    id_col: str = "doc_id",
    seed: str = "strat:",
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, selected by hash rank
    over `id_col` — order- and shard-independent, so the sample is stable
    as the dataset grows (a row is only displaced when a smaller-hash row
    arrives in its stratum). One shuffle on the strata key."""
    if n_per_stratum < 1:
        raise ValueError("n_per_stratum must be >= 1")
    w = Window.partitionBy(*[F.col(c) for c in strata_cols]).orderBy(
        "__rank_h", id_col
    )
    return (
        # NULL ids excluded: their hash would rank NULLS-FIRST here but
        # NULLS-LAST in SQL oracles (and a row without identity can't be
        # sampled stably anyway)
        df.filter(F.col(id_col).isNotNull())
        .withColumn("__rank_h", md5_int(F.col(id_col).cast("string"), seed=seed))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rank_h", "__rn")
    )


def weighted_mix(
    df: DataFrame,
    cat_col: str,
    weights: dict[str, float],
    id_col: str = "doc_id",
    default_weight: float = 0.0,
    seed: str = "mix:",
) -> DataFrame:
    """Dataset mixing: keep each row with its category's probability,
    decided by the row's hash-uniform (so the SAME rows are kept on every
    run/engine/shard layout). Weights > 1 keep everything (upsampling is
    the consumer's repeat-epoch concern, not a filter's). Categories
    absent from `weights` use `default_weight`. Pure per-row expression:
    no shuffle, fully pushdown-friendly."""
    for cat, wt in weights.items():
        if wt < 0:
            raise ValueError(f"negative weight for {cat!r}")
    if default_weight < 0:
        raise ValueError("negative default_weight")
    wmap = F.create_map(
        *[x for cat, wt in sorted(weights.items()) for x in (F.lit(cat), F.lit(float(wt)))]
    )
    wt = F.coalesce(wmap[F.col(cat_col)], F.lit(float(default_weight)))
    return df.filter(_u(F.col(id_col).cast("string"), seed) < wt)


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    id_col: str = "doc_id",
    n_buckets: int = 256,
    seed: str = "pack:",
) -> DataFrame:
    """Greedy sequence packing: assign documents to training-sequence bins
    of ~`budget` tokens.

    Documents are ordered by content hash inside `n_buckets` independent
    hash buckets; within a bucket, a document opens a new bin when the
    running token total before it crosses a budget multiple (the classic
    streaming first-fit — a bin may overflow by at most one document; a
    bin can close BELOW budget only in the shadow of an overflowing
    predecessor, whose spill consumes part of the next budget window).
    Output adds `pack_bucket` and `pack_bin`; a training shard is
    (pack_bucket, pack_bin).

    Scale shape: the cumulative sum is windowed PER BUCKET, so no global
    sort/single-partition bottleneck exists — 100 TB packs as n_buckets
    independent streams (make n_buckets ≥ cluster parallelism). Assignment
    is content-stable: same corpus → same packing on any engine/layout.
    Oversized docs (> budget) get a bin of their own, flagged upstream by
    the caller if truncation policy applies.
    """
    if budget < 1:
        raise ValueError("budget must be positive")
    h = md5_int(F.col(id_col).cast("string"), seed=seed)
    bucket = F.pmod(h, F.lit(n_buckets))
    w = (
        Window.partitionBy("pack_bucket")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        df.filter(F.col(id_col).isNotNull())
        .withColumn("__h", h)
        .withColumn("pack_bucket", bucket)
        .withColumn(
            "pack_bin",
            F.floor(
                (F.sum(F.col(token_col)).over(w) - F.col(token_col))
                / F.lit(float(budget))
            ).cast("bigint"),
        )
        .drop("__h")
    )
    return out


def materialize_packs(
    packed: DataFrame,
    text_col: str = "text",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    eos: str = "<|endoftext|>",
    seed: str = "pack:",
) -> DataFrame:
    """Turn `pack_sequences` bin assignments into actual training
    sequences: one row per (pack_bucket, pack_bin) with the member texts
    concatenated in the SAME content-hash order packing used, joined by
    the EOS separator.

    Output: (pack_bucket, pack_bin, sequence, n_docs, n_tokens). One
    partial-aggregating shuffle on the (bucket, bin) key; per-bin state
    is bounded by the token budget, so sequences never blow up a task.
    Deterministic end to end: same corpus → byte-identical shards.
    """
    h = md5_int(F.col(id_col).cast("string"), seed=seed)
    return (
        packed.withColumn("__h", h)
        .groupBy("pack_bucket", "pack_bin")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("__h"), F.col(id_col), F.col(text_col))
                        )
                    ),
                    lambda s: s[text_col],
                ),
                eos,
            ).alias("sequence"),
            F.count("*").alias("n_docs"),
            F.sum(token_col).alias("n_tokens"),
        )
    )


def token_frequencies(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> DataFrame:
    """Corpus token-frequency table — the input every vocabulary/BPE build
    starts from. One explode + one partial-aggregating shuffle on the
    token; nothing is collected to the driver. Output:
    (token, n_occurrences, n_docs)."""
    toks = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    return (
        toks.groupBy("token")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("__doc").alias("n_docs"),
        )
        .filter(F.col("n_occurrences") >= min_count)
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Self-scored unigram language-model surprisal per document: the mean
    natural-log corpus probability of the doc's tokens. Documents full of
    rare tokens score low — the classic cheap LM-quality proxy (the
    heavier KenLM-style filter shares this exact plumbing; swap the
    in-corpus frequency table for external model scores).

    Scale shape: one token-frequency aggregate (partial map-side), a
    broadcast 1-row total, one token-keyed join, one doc-keyed aggregate.
    Output: (doc_id, n_scored_tokens, avg_logprob) — rounded at 6 dp for
    engine parity; empty docs score NULL avg over 0 tokens → excluded.
    """
    freqs = token_frequencies(df, text_col=text_col, id_col=id_col)
    total = freqs.select(F.sum("n_occurrences").alias("__total"))
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("token"),
    ).filter(F.col("token") != "")
    scored = (
        toks.join(freqs.select("token", "n_occurrences"), "token")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            # per-token logprob rounded then summed as exact decimal: the
            # cross-row mean is order-independent (same value under any
            # partitioning — and in the DuckDB oracle)
            F.round(F.log(F.col("n_occurrences") / F.col("__total")), 6)
            .cast("decimal(18,8)")
            .alias("__lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_scored_tokens"),
        F.round(
            F.sum("__lp").cast("double") / F.count("*"), 6
        ).alias("avg_logprob"),
    )


def shuffle_corpus(
    df: DataFrame,
    seed: str = "shuffle",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global corpus shuffle: the pre-training data-ordering
    step, reproducible across runs and engines (same portable md5-rank
    machinery as the split/sample operators).

    Adds `shuffle_key` (bigint) and returns the rows range-sorted by it.
    The key — not a materialized global row number — is deliberate: a
    global row_number() would funnel everything through one reducer, while
    `orderBy(shuffle_key)` is a range-partitioned parallel sort, and a
    writer that needs stable file order does
    `repartitionByRange(shuffle_key).sortWithinPartitions(shuffle_key)`
    with no serial stage at any size."""
    return df.withColumn(
        "shuffle_key", md5_int(F.col(id_col).cast("string"), seed=seed + ":")
    ).orderBy("shuffle_key", id_col)


def oov_rate(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Out-of-vocabulary rate per document against a vocabulary table
    (one `token` column — e.g. token_frequencies(...).filter(n >= k)).
    The tokenizer-coverage metric run before committing to a vocab.

    Scale shape: explode + one token-keyed LEFT join against the vocab
    (broadcast when small, hash otherwise — Catalyst/AQE decides) + one
    doc-keyed aggregate. Output: (doc_id, n_tokens, n_oov, oov_rate)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    marked = toks.join(
        vocab.select("token", F.lit(1).alias("__in_vocab")), "token", "left"
    )
    return marked.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        F.round(
            F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0))
            / F.count("*"),
            6,
        ).alias("oov_rate"),
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Self-scored BIGRAM language-model surprisal per document: the mean
    ln P(w2|w1) with MLE conditionals from the corpus itself
    (c(w1,w2)/c(w1·)), the next rung up from `unigram_logprob` toward the
    KenLM-style quality filters. Self-scoring keeps every observed bigram
    in the count table, so no smoothing is needed for finite scores.
    The w1 denominator counts BIGRAM LEFT POSITIONS (not raw unigrams), so
    conditionals sum to 1 per w1.

    Scale shape: one bigram explode feeding BOTH count aggregates
    (bigram-keyed and left-token-keyed, each partial map-side), two
    token-keyed joins back, one doc-keyed aggregate. Per-pair logs round
    at 6 dp then sum as exact decimals — order-independent.
    Output: (doc_id, n_scored_bigrams, avg_logprob)."""
    toked = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__toks"),
    ).filter(F.size("__toks") >= 2)
    pairs = toked.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("__toks"), 1, F.size("__toks") - 1),
                F.slice(F.col("__toks"), 2, F.size("__toks") - 1),
            )
        ).alias("p"),
    ).select(
        "doc_id",
        F.col("p").getField("0").alias("w1"),
        F.col("p").getField("1").alias("w2"),
    ).filter((F.col("w1") != "") & (F.col("w2") != ""))
    big_c = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    left_c = pairs.groupBy("w1").agg(F.count("*").alias("c1"))
    scored = (
        pairs.join(big_c, ["w1", "w2"])
        .join(left_c, "w1")
        .select(
            "doc_id",
            F.round(F.log(F.col("c12") / F.col("c1")), 6)
            .cast("decimal(18,8)")
            .alias("__lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_scored_bigrams"),
        F.round(F.sum("__lp").cast("double") / F.count("*"), 6).alias(
            "avg_logprob"
        ),
    )


def sample_to_token_budget(
    df: DataFrame,
    shares: dict[str, float],
    total_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Build a training MIXTURE to a token budget: per source, take
    documents in deterministic md5-rank order until that source's share of
    ``total_tokens`` is filled (a doc is kept while the budget is not yet
    reached when it starts, so the mixture slightly overshoots by at most
    one document per source — the standard recipe). Sources absent from
    ``shares`` contribute nothing.

    Deterministic and shard-independent: the same docs are chosen on every
    run/engine/layout (same portable md5-rank machinery as the split/
    sample operators). One window per source partition — a single hash
    exchange on the source key. Output: (doc_id, source, n_tokens,
    cum_tokens) for the kept docs."""
    from platform_spark.llmdata.text import tokens

    budget = F.create_map(
        *[x for s, w in sorted(shares.items())
          for x in (F.lit(s), F.lit(float(w) * total_tokens))]
    )
    staged = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        F.size(tokens(F.lower(F.col(text_col)))).alias("n_tokens"),
        md5_int(F.col(id_col).cast("string"), seed=seed + ":").alias("__h"),
    ).filter(F.col("source").isin(list(shares)))
    w = (
        Window.partitionBy("source")
        .orderBy("__h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return (
        staged.withColumn("cum_tokens", cum.cast("bigint"))
        .filter(F.col("cum_tokens") - F.col("n_tokens") < budget[F.col("source")])
        .select("doc_id", "source", "n_tokens", "cum_tokens")
    )


def _with_exact_sqrt_weight(counts: DataFrame) -> DataFrame:
    """Add `__w` = isqrt(__n * 10^12) = floor(sqrt(__n) * 1e6) as
    DECIMAL(38,0), exact for any __n <= 2^46 (guarded with raise_error).

    The double SQRT only seeds a candidate c0; the true integer root is
    picked from [c0-2, c0+2] by exact decimal comparison against
    __n * 10^12, so no float rounding can flip the result. Real
    divergence exists: e.g. n=9_458_861_055_077 has
    floor(fl(sqrt(n))*1e6) = isqrt(n*10^12)+1 (regression-tested)."""
    return (
        counts.withColumn(
            "__c0",
            F.expr(
                # 2^46 bound: above it the double seed's absolute error can
                # reach the correction window's edge, so fail loud not wrong
                "CASE WHEN __n > 70368744177664 THEN "
                "CAST(raise_error('mix_temperature: group exceeds 2^46 rows; "
                "isqrt seed bound violated') AS DECIMAL(19,0)) "
                "ELSE CAST(FLOOR(SQRT(CAST(__n AS DOUBLE)) * 1000000.0) "
                "AS DECIMAL(19,0)) END"
            ),
        )
        .withColumn(
            "__m",
            F.expr(
                "CAST(__n AS DECIMAL(25,0)) * CAST(1000000000000 AS DECIMAL(13,0))"
            ),
        )
        .withColumn(
            "__w",
            F.expr(
                """CASE
                     WHEN (__c0 + 2) * (__c0 + 2) <= __m THEN __c0 + 2
                     WHEN (__c0 + 1) * (__c0 + 1) <= __m THEN __c0 + 1
                     WHEN __c0 * __c0 <= __m THEN __c0
                     WHEN (__c0 - 1) * (__c0 - 1) <= __m THEN __c0 - 1
                     ELSE __c0 - 2
                   END"""
            ).cast("decimal(38,0)"),
        )
    )


def mix_temperature_quotas(
    df: DataFrame,
    total_rows: int,
    group_col: str = "lang",
) -> DataFrame:
    """Per-group quota derivation leg of `mix_temperature`, exposed on its
    own so a cross-engine divergence can be localized to a single group's
    (n, w, quota) triple before the rank machinery runs.

    The sqrt weight is EXACT integer math — no float ever reaches the
    output: w = isqrt(n * 10^12) = floor(sqrt(n) * 1e6). A double sqrt
    only SEEDS a candidate c0; the result is the unique c in
    [c0-2, c0+2] with c^2 <= n*10^12 < (c+1)^2, decided in DECIMAL(38,0)
    arithmetic. The seed error is bounded by sqrt(n)*1e6 * 2^-51 (< 1 for
    any n < 2^46 docs per group; a raise_error guard enforces the bound
    loudly), so the window always contains the true root and the float's
    rounding mode can never flip the answer — this replaced a bare
    floor(sqrt(n)*1e6) that proved environment-sensitive (driver red,
    local green, CORRECTNESS_r06/r07).

    quota_g = (total_rows * w_g) div sum(w) in DECIMAL(38,0)
    intermediates with an integral DIV — a bigint product would wrap at
    total_rows * max(w) > 2^63 (~1e11-doc corpora) and non-ANSI Spark
    wraps silently. Output: (group_col, n, w, quota), one row per group.
    """
    if total_rows < 1:
        raise ValueError("total_rows must be >= 1")
    if total_rows > (1 << 62):
        raise ValueError("total_rows too large for exact bigint quota math")
    counts = _with_exact_sqrt_weight(
        df.filter(F.col(group_col).isNotNull())
        .groupBy(F.col(group_col).alias("grp"))
        .agg(F.count("*").alias("__n"))
    )
    tot = counts.agg(F.sum("__w").cast("decimal(38,0)").alias("__tot"))
    return counts.crossJoin(F.broadcast(tot)).select(
        F.col("grp").alias(group_col),
        F.col("__n").alias("n"),
        F.col("__w").cast("bigint").alias("w"),
        F.expr(f"CAST({total_rows} AS DECIMAL(38,0)) * __w DIV __tot").alias(
            "quota"
        ),
    )


def mix_temperature(
    df: DataFrame,
    total_rows: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "temp",
) -> DataFrame:
    """Temperature-scaled mixture sampling (the UniMax / mT5 alpha=0.5
    rebalancing recipe): sample `total_rows` documents with per-group
    quotas proportional to sqrt(group size) instead of size, boosting
    low-resource groups (languages, sources) relative to proportional
    sampling without the distribution collapse of uniform quotas.

    Quota math is EXACT-integer end to end (see
    `mix_temperature_quotas`, which is the production quota leg, not a
    debug copy): w = isqrt(n*10^12) via a float-seeded but
    decimal-verified correction window, quota = (total_rows * w) div
    sum(w) in DECIMAL(38,0). Exact alpha=0.5 is deliberate: a general
    pow(n, alpha) can disagree across engines in the last ulp; isqrt
    cannot. Within each group the quota picks the smallest portable-md5
    ranks, so the sample is deterministic and shard-independent like
    every sampler here.

    Scale shape: the group-count aggregate is partial map-side and its
    result (one row per group) broadcasts back; selection is one window
    per group partition. Sum of quotas <= total_rows (floor rounding);
    a group smaller than its quota contributes all its rows.
    Output: (id, group, quota, rn) for the kept rows.
    """
    quota = mix_temperature_quotas(df, total_rows, group_col=group_col).select(
        F.col(group_col).alias("grp"), "quota"
    )
    w = Window.partitionBy("grp").orderBy("__h", "id")
    return (
        df.filter(F.col(group_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.col(group_col).alias("grp"),
            md5_int(F.col(id_col).cast("string"), seed=seed + ":").alias("__h"),
        )
        .join(F.broadcast(quota), "grp")
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= F.col("quota"))
        .select("id", F.col("grp").alias(group_col), "quota", "rn")
    )


def curriculum_order(
    df: DataFrame,
    score: Column,
    n_buckets: int = 10,
    id_col: str = "doc_id",
    seed: str = "curriculum",
) -> DataFrame:
    """Deterministic curriculum ordering: bucket documents by score
    (ntile over a total order — ties break on id, so bucketing is exact
    and engine-portable), then shuffle WITHIN each bucket by md5 rank.
    Training readers consume bucket 1..n in order (easy→hard or the
    reverse) with reproducible within-bucket randomness — the standard
    curriculum/annealing data-ordering recipe.

    One global ntile window (range-partitioned sort) + the portable hash;
    emitting (bucket, shuffle_key) rather than a global row number keeps
    every stage parallel. Output: (doc_id, bucket, shuffle_key)."""
    w = Window.orderBy(score, F.col(id_col))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.ntile(n_buckets).over(w).alias("bucket"),
        md5_int(F.col(id_col).cast("string"), seed=seed + ":").alias(
            "shuffle_key"
        ),
    )
