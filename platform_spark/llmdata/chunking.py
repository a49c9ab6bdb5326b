"""Token-window document chunking for training-data pipelines.

Long documents are split into fixed-size token windows with overlap (the
standard pre-tokenization step before packing into training sequences).
Pure column expressions: tokenize once, compute the chunk count in closed
form, `sequence` + `transform` + `explode` — no UDF, no shuffle, so the
operator runs inside whole-stage codegen at scan speed and parallelism is
unchanged (each input row expands in place). At 100 TB this is the only
acceptable plan: chunking must NOT cost a shuffle.

Chunk i covers tokens [i*stride, i*stride + chunk_size), stride =
chunk_size - overlap; the final window is allowed to be short. A document
shorter than one window yields exactly one chunk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 512,
    overlap: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode documents into overlapping token-window chunks.

    Returns ``(id_col, chunk_id, chunk_text, n_tokens)`` — ``chunk_id``
    is 0-based and contiguous per document, ``n_tokens`` the actual
    window length (== chunk_size except possibly the last chunk).
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    toked = df.select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__toks"),
    )
    n = F.size("__toks")
    n_chunks = F.when(n <= chunk_size, F.lit(1).cast("bigint")).otherwise(
        F.ceil((n - F.lit(chunk_size)) / F.lit(stride)) + 1
    )
    chunks = F.transform(
        F.sequence(F.lit(0).cast("bigint"), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            F.array_join(
                F.slice("__toks", (i * stride + 1).cast("int"), chunk_size), " "
            ).alias("chunk_text"),
            F.least(F.lit(chunk_size), n - (i * stride).cast("int"))
            .cast("int")
            .alias("n_tokens"),
        ),
    )
    return toked.select(
        id_col, F.explode(chunks).alias("__c")
    ).select(id_col, "__c.chunk_id", "__c.chunk_text", "__c.n_tokens")
