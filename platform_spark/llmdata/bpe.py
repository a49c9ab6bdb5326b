"""Distributed BPE tokenizer training support.

The classic byte-pair-encoding training loop (Sennrich et al. 2016; the
algorithm behind GPT-2/RoBERTa vocabularies) over a Spark corpus:

1. collapse the corpus to a word-frequency table (one token-keyed,
   partial-aggregating shuffle — after this every round works on data
   bounded by |vocab|, NOT corpus size; this is what makes BPE training
   tractable at 100 TB),
2. split words into symbol sequences (chars + a ``</w>`` end-of-word
   marker),
3. repeatedly: count adjacent symbol pairs weighted by word frequency,
   merge the most frequent pair everywhere, append it to the merge list.

Everything except the 1-row argmax collect per round stays JVM-side: the
per-word merge rewrite is a pure ``F.aggregate`` lambda (greedy
left-to-right, non-overlapping — after a merge the accumulator's tail is
the merged symbol, so overlapping occurrences skip naturally), and pair
counting is ``explode`` + hash aggregate. Driver state is the merge list
(bounded by ``n_merges``) — the same bounded-fixpoint shape as
clusters.py's propagation loop.

``encode_bpe`` is the runtime twin: applies a trained merge list to new
text as an Arrow-batched pandas UDF (the merge table is a closure
broadcast; per-word memoization inside the batch), matching how a
tokenizer runtime would ship the vocabulary to executors.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from platform_spark.llmdata.sampling import token_frequencies

END_OF_WORD = "</w>"


# NOTE non-BMP characters (emoji etc.): Spark's split("") yields UTF-16
# code units (a surrogate PAIR per astral char) while regexp engines that
# work on code points yield one symbol — for byte-exact cross-engine
# parity on astral-plane corpora, pre-filter or normalize such characters.


def word_symbols(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Word-frequency table with initial symbol sequences:
    (word, cnt, syms) where syms = chars + ``</w>``."""
    freqs = token_frequencies(df, text_col=text_col, id_col=id_col).select(
        F.col("token").alias("word"), F.col("n_occurrences").alias("cnt")
    )
    return freqs.withColumn(
        "syms",
        F.concat(F.split(F.col("word"), ""), F.array(F.lit(END_OF_WORD))),
    )


def pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency:
    (a, b, cnt). Works on the |vocab|-sized word table."""
    pairs = words.select(
        "cnt",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("syms"), 1, F.size("syms") - 1),
                F.slice(F.col("syms"), 2, F.size("syms") - 1),
            )
        ).alias("p"),
    )
    return (
        pairs.select(
            F.col("p").getField("0").alias("a"),
            F.col("p").getField("1").alias("b"),
            "cnt",
        )
        .groupBy("a", "b")
        .agg(F.sum("cnt").alias("cnt"))
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", top_k: int = 200
) -> DataFrame:
    """First-round BPE pair statistics over a corpus — the gate surface.
    Deterministic top-k under the total order (cnt desc, a, b)."""
    counts = pair_counts(word_symbols(df, text_col, id_col))
    return counts.orderBy(F.desc("cnt"), "a", "b").limit(top_k)


def apply_merge(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) into ``a+b`` — a pure
    JVM array fold, no UDF. Non-overlapping by construction: once merged,
    the accumulator tail is ``a+b`` which no longer equals ``a``."""
    merged = F.lit(a + b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges. Per round: one pair-count aggregate
    on the word table + a 1-row argmax collect (bounded driver state, like
    the propagation fixpoint counter). Ties break on (a, b) ascending for
    cross-run determinism. localCheckpoint truncates the per-round
    ``apply_merge`` lineage the same way the cluster loop does."""
    words = word_symbols(df, text_col, id_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        top = (
            pair_counts(words)
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break  # nothing left worth merging
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        words = words.withColumn("syms", apply_merge(F.col("syms"), a, b))
        if (i + 1) % checkpoint_every == 0:
            words = words.localCheckpoint(eager=True)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference BPE encode for one word: repeatedly merge the
    best-ranked adjacent pair (the tokenizer-runtime algorithm)."""
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def encode_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize text with a trained merge list. Arrow-batched pandas UDF
    (the merge table ships once per executor as a closure; per-batch word
    memoization), emitting ``array<string>`` of BPE symbols."""
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("array<string>")
    def _encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc(text):
            if text is None:
                return []
            out: list[str] = []
            for w in text.strip().lower().split():
                if w not in cache:
                    cache[w] = _encode_word(w, ranks)
                out.extend(cache[w])
            return out

        return texts.map(enc)

    return df.withColumn(out_col, _encode(F.col(text_col)))
