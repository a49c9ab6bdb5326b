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
