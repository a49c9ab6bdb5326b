"""TF-IDF keyword extraction over a document corpus.

The classic two-level relational program — term frequency per (doc, word),
document frequency per word, corpus size as an in-plan 1-row broadcast —
so at 100 TB the plan is: one explode over the scan, two partial-aggregated
shuffles (both keyed on values with natural high cardinality), one window
for the per-doc top-k. No driver-side state, no collected vocabulary.

Scores and the ranking both use the ROUNDED score (6 dp) so results are
deterministic and engine-portable (the DuckDB oracle reproduces them
bit-exactly; ties broken alphabetically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from platform_spark.llmdata.text import tokens


def tfidf_keywords(
    df: DataFrame,
    top_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k keywords per document by smoothed TF-IDF.

    ``score = tf * (ln((n_docs + 1) / (df + 1)) + 1)`` — the sklearn-style
    smooth idf, which never divides by zero and keeps corpus-wide words at
    a small positive weight. Returns
    ``(doc_id, rank, word, tf, df, score)`` with rank 1..top_k per doc.
    """
    words = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("word"),
    )
    tf = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("word").agg(F.count("*").alias("df"))
    n_docs = df.select(F.count("*").alias("__n_docs"))
    scored = (
        tf.join(dfreq, "word")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("__n_docs") + 1) / (F.col("df") + 1))
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("word").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("doc_id", "rank", "word", "tf", "df", "score")
    )


def bm25_search(
    df: DataFrame,
    query_terms: list[str],
    top_k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 document retrieval for a term query (Robertson/Spärck Jones) —
    the ranking function behind classic search and the usual retrieval leg
    of decontamination/dedup triage.

    ``score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`` with
    ``idf = ln(1 + (N−df+0.5)/(df+0.5))`` (the Lucene form, always ≥ 0).

    Plan shape at 100 TB: one explode restricted to the query terms (the
    term filter pushes into the scan side of the aggregate), term df and
    corpus (N, avgdl) as tiny broadcast aggregates, one doc-keyed
    aggregate for the final sum, then global top-k. Scores round at 6 dp;
    ties break on doc id — fully deterministic and oracle-reproducible.
    Output: (doc_id, score, n_hit_terms).
    """
    terms = sorted({t.lower() for t in query_terms})
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.lower(F.col(text_col))).alias("__toks"),
    )
    dl = toks.select("doc_id", F.size("__toks").alias("dl"))
    corpus = dl.agg(
        F.count("*").alias("N"), F.avg("dl").alias("avgdl")
    )
    hits = (
        toks.select("doc_id", F.explode("__toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = hits.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            "term",
            (
                F.log(
                    1.0
                    + (F.col("N") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.round(F.sum("s"), 6).alias("score"),
            F.count("*").alias("n_hit_terms"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(top_k)
    )
