"""Stream-stream WITHIN join (J4's continuous variant).

The dialect's batch join (`a JOIN b ON key WITHIN 10m`) matches rows whose
event times differ by at most the band (reference sql-processor
server.go:2644-2650: ``|l._ts - r._ts| <= band``). In continuous mode the
same semantics map onto Spark's stream-stream join: watermark BOTH sides,
join on the key plus a symmetric time-range condition. Catalyst derives a
state-eviction bound from the range condition + watermarks, so each side's
join state holds only ``watermark + band`` worth of rows — bounded state
regardless of stream length, which is the property that lets this run
forever on a 1000-executor cluster.

Left-outer emits the unmatched left rows only after the watermark passes
their band window (Spark can't know "no match" earlier); inner emits as
soon as both sides arrive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def within_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    within_seconds: float,
    watermark: str = "10 minutes",
    ts_col: str = "_ts",
    how: str = "inner",
) -> DataFrame:
    """Join two streaming DataFrames on `key` where the right row's
    `ts_col` lies within ±`within_seconds` of the left row's.

    Output columns: the left columns as-is plus the right's non-key
    columns prefixed `_right_` (the dialect's J6 naming).
    """
    if how not in ("inner", "left_outer"):
        raise ValueError("how must be 'inner' or 'left_outer'")
    if within_seconds <= 0:
        raise ValueError("within_seconds must be positive")
    micros = int(within_seconds * 1_000_000)
    l = left.withWatermark(ts_col, watermark).alias("l")
    r = right.withWatermark(ts_col, watermark).alias("r")
    # two direct inequalities on the event-time columns, NOT abs(delta):
    # Spark's state-eviction analysis (JoinStateWatermarkPredicate) only
    # recognizes range conditions in this form
    iv = f"INTERVAL {micros} MICROSECOND"
    band = (
        F.col(f"r.{ts_col}") >= F.col(f"l.{ts_col}") - F.expr(iv)
    ) & (F.col(f"r.{ts_col}") <= F.col(f"l.{ts_col}") + F.expr(iv))
    cond = (F.col(f"l.{key}") == F.col(f"r.{key}")) & band
    joined = l.join(r, cond, how)
    out = [F.col(f"l.{c}") for c in left.columns]
    out += [
        F.col(f"r.{c}").alias(f"_right_{c}") for c in right.columns if c != key
    ]
    return joined.select(out)
