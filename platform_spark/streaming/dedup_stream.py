"""Streaming deduplication (training-pipeline ingest path).

Unbounded sources re-deliver records (at-least-once brokers, replayed
segments, duplicated producers); a training-data ingest wants each
logical record exactly once. Two built-in Spark strategies, both
exactly-once under checkpointing:

- `dedup_stream(..., within_watermark=None)`: global
  `dropDuplicates(keys)` — state grows with the number of distinct keys
  ever seen. Right for bounded key universes (entity streams).
- `dedup_stream(..., within_watermark="10 minutes")`:
  `dropDuplicatesWithinWatermark` — duplicates are only suppressed while
  they can still arrive (inside the watermark), so the state store stays
  BOUNDED by the watermark window. This is the 100 TB shape: replays and
  producer retries happen within minutes, not months, and the watermark
  evicts everything older.

The key should be a content identity (e.g. `dedup.md5_int` of the
payload, or the producer's record id) — offsets differ between
re-deliveries, so they cannot be the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "_ts",
    within_watermark: str | None = None,
) -> DataFrame:
    """Drop duplicate records from a streaming DataFrame by `keys`.

    With `within_watermark`, the stream is watermarked on `ts_col` and
    duplicates are suppressed only within that delay — bounded state,
    the scale path (see module docstring). Without it, classic global
    dropDuplicates (unbounded state, exact).
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    if within_watermark is not None:
        return stream.withWatermark(ts_col, within_watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return stream.dropDuplicates(keys)


def dedup_against_corpus_stream(
    stream: DataFrame,
    corpus_index,
    text_col: str = "text",
) -> DataFrame:
    """EXACT-layer incremental dedup for an unbounded ingest: drop
    streaming rows whose content hash already exists in a persisted
    ``CorpusDedupIndex`` (dedup.build_dedup_index of the immutable
    snapshot).

    A stream-static LEFT ANTI join — append-legal with ZERO streaming
    state: the static side is the index's (small, hash-only) table and
    the stream side never aggregates. This is the always-on filter in
    front of the batch near-dedup pass.
    """
    from pyspark.sql import functions as F

    hashes = corpus_index.hashes.select("content_hash")
    keyed = stream.withColumn("__ch", F.md5(F.col(text_col)))
    return (
        keyed.join(
            hashes.withColumnRenamed("content_hash", "__ch"), "__ch", "left_anti"
        )
        .drop("__ch")
    )


def dedup_incremental_batch_fn(
    corpus_index,
    sink_fn,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
):
    """The NEAR layer for streams: a ``foreachBatch`` function that runs
    the full batch ``dedup_incremental`` (exact + MinHash-LSH vs the
    persisted index) on each micro-batch and hands survivors to
    ``sink_fn(batch_df, batch_id)``.

    The LSH verify needs per-pair aggregation, which has no bounded-state
    append-mode plan — the micro-batch boundary is exactly Spark's
    escape hatch for that (same pattern as the Iceberg sink,
    streaming/pipeline.py). Semantics per batch are the batch operator's,
    verbatim; cross-batch duplicates WITHIN the stream are the job of
    `dedup_stream` upstream (content-hash watermark dedup).
    """

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        from platform_spark.llmdata.dedup import dedup_incremental

        kept = dedup_incremental(
            batch_df,
            text_col=text_col,
            id_col=id_col,
            k=k,
            num_perm=num_perm,
            bands=bands,
            threshold=threshold,
            corpus_index=corpus_index,
        )
        sink_fn(kept, batch_id)

    return fn
