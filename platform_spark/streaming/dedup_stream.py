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
