"""Corpus-cleaning operators: PII redaction and rule-based quality gates.

Training-data pipelines scrub identifiable strings and drop low-quality
documents before anything reaches a model. Both operators here are pure
column expressions — no UDFs, no shuffle — so at 100 TB they run inside
whole-stage codegen directly on top of the vectorized parquet scan, and
Catalyst pushes any downstream `passes_all` filter into the scan plan.

Everything is closed-form and engine-portable (same regex / arithmetic
semantics in DuckDB), so the gate oracles reproduce results bit-exactly.

The quality rules follow the shape of the published Gopher/C4 heuristics
(word-count bounds, word-length sanity, repetition caps) with thresholds
calibrated to the synthetic corpus; swap thresholds per-corpus in
production.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Patterns are deliberately RE2-compatible (no backrefs/lookaround) so the
# identical string works in Spark (Java regex) and DuckDB (RE2). Applied
# in THIS order; each count is taken on the text as it stands before that
# pattern's redaction, i.e. n_<kind> == number of redactions performed.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"https?://\S+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IPV4>"),
    # phone LAST: its loose digit/punct class would also swallow IPv4s
    ("phone", r"\+?\d[\d() .-]{6,}\d", "<PHONE>"),
]


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "text_redacted"
) -> DataFrame:
    """Sequentially redact URLs, emails, IPv4s, and phone numbers.

    Adds `out_col` (the scrubbed text) and one `n_<kind>` count per
    pattern. Counts are per-stage (on the partially-redacted text), so
    they sum to the total number of replacements made.
    """
    cur = df.withColumn(out_col, F.col(text_col))
    for kind, pat, token in PII_PATTERNS:
        # layered selects: count the CURRENT redaction state once, then
        # rewrite — keeps each regex single-evaluation per stage
        cur = cur.withColumn(f"n_{kind}", F.regexp_count(F.col(out_col), F.lit(pat)))
        cur = cur.withColumn(out_col, F.regexp_replace(out_col, pat, token))
    return cur


def collapse_repeats(
    df: DataFrame, text_col: str = "text", out_col: str = "text_clean"
) -> DataFrame:
    """Collapse runs of consecutively repeated tokens to one occurrence
    (`uniq` per document) — the cheapest repetition scrub generation
    artifacts and boilerplate need.

    Adds `out_col` and `n_removed`. Pure array expressions over ONE
    materialized token array (a lambda over a column *reference* — never
    re-embedding the split expression, which would go quadratic); no
    shuffle, runs at scan speed.
    """
    toked = df.withColumn("__toks", F.split(F.trim(F.col(text_col)), r"\s+"))
    # F.get is 0-based and takes a Column index: the predecessor of lambda
    # index i is get(toks, i - 1); i == 0 has no predecessor and is kept
    kept = F.filter(
        F.col("__toks"),
        lambda x, i: (i == 0) | (x != F.get(F.col("__toks"), i - 1)),
    )
    return (
        toked.withColumn(out_col, F.array_join(kept, " "))
        .withColumn("n_removed", F.size("__toks") - F.size(kept))
        .drop("__toks")
    )


#: quality-rule thresholds (calibrated to the synthetic corpus: word
#: counts 21-88, distinct-word ratio 0.32-0.75, top-word ratio 0.07-0.14)
MIN_WORDS = 40
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MIN_DISTINCT_RATIO = 0.45
MAX_TOP_WORD_RATIO = 0.10


def quality_rules(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher/C4-style per-document quality rules.

    Emits the measured metrics (rounded at 6dp for engine parity) and one
    boolean per rule plus `passes_all`:

    - `word_count_ok`: MIN_WORDS <= n_words <= MAX_WORDS
    - `mean_word_len_ok`: mean word length within [3, 10]
    - `repetition_ok`: distinct-word ratio >= 0.45 (word-salad cap)
    - `top_word_ok`: most frequent word <= 10% of all words

    The top-word frequency needs a per-(doc, word) count — an explode +
    two partial-aggregating shuffles keyed on doc_id, NOT a per-row n²
    expression, so it scales with corpus size like any other aggregate.
    """
    words = df.select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__words"),
    )
    base = words.select(
        id_col,
        F.size("__words").alias("n_words"),
        F.round(
            F.aggregate(
                "__words", F.lit(0.0), lambda acc, w: acc + F.length(w)
            )
            / F.size("__words"),
            6,
        ).alias("mean_word_len"),
        F.round(
            F.size(F.array_distinct("__words")) / F.size("__words"), 6
        ).alias("distinct_ratio"),
    )
    top = (
        words.select(id_col, F.explode("__words").alias("__w"))
        .groupBy(id_col, "__w")
        .agg(F.count("*").alias("__n"))
        .groupBy(id_col)
        .agg(
            F.round(F.max("__n") / F.sum("__n"), 6).alias("top_word_ratio")
        )
    )
    m = base.join(top, id_col)
    return m.select(
        id_col,
        "n_words",
        "mean_word_len",
        "distinct_ratio",
        "top_word_ratio",
        (F.col("n_words") >= MIN_WORDS) & (F.col("n_words") <= MAX_WORDS),
        (F.col("mean_word_len") >= MIN_MEAN_WORD_LEN)
        & (F.col("mean_word_len") <= MAX_MEAN_WORD_LEN),
        (F.col("distinct_ratio") >= MIN_DISTINCT_RATIO),
        (F.col("top_word_ratio") <= MAX_TOP_WORD_RATIO),
    ).toDF(
        id_col,
        "n_words",
        "mean_word_len",
        "distinct_ratio",
        "top_word_ratio",
        "word_count_ok",
        "mean_word_len_ok",
        "repetition_ok",
        "top_word_ok",
    ).withColumn(
        "passes_all",
        F.col("word_count_ok")
        & F.col("mean_word_len_ok")
        & F.col("repetition_ok")
        & F.col("top_word_ok"),
    )
