"""Sessionization: gap-based event sessions per key.

A training-data / clickstream staple the reference lacks (its closest
construct is the LAST/WITHIN time windows, server.go:1368-1384, 2644-2650);
expressed Spark-first as window functions — lag to flag gap breaks, a
running sum to number sessions, then one aggregate. Exactly one shuffle
(by key) end to end; no UDFs, no driver state, scale-independent.

Determinism: session boundaries depend only on timestamp gaps, so ties in
`ts_col` (which make the lag order ambiguous) cannot move a boundary —
equal timestamps always share a session. Output (key, session_start,
session_end, n_events) is therefore engine-independent, which is what the
DuckDB gate oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize_stream(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "_ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Streaming sessionization: the custom-stateful-operator path
    (`applyInPandasWithState`) for unbounded sources.

    Per-key state = the open session (start, last event, count); a new
    event either extends it or closes it (gap > ``gap_seconds``) and emits
    the closed session. Open sessions persist in the state store across
    micro-batches (exactly-once via the checkpoint). Production deployments
    should pair this with a watermark + EventTimeTimeout to flush sessions
    idle past the gap; the batch twin (`sessionize`) is the replayable
    gold path, as in any lambda-ish pipeline.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "session_key string, session_start timestamp, session_end timestamp, "
        "n_events long, duration_sec long"
    )
    state_schema = "start long, last long, n long"

    def fn(key, pdfs, state: GroupState):
        start, last, n = state.get if state.exists else (None, None, 0)
        closed: list[tuple] = []
        batches = [p for p in pdfs]
        rows = pd.concat(batches) if batches else pd.DataFrame(columns=[ts_col])
        for ts in sorted(rows[ts_col].dropna()):
            t = int(pd.Timestamp(ts).timestamp())
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_seconds:
                closed.append((key[0], start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = max(last, t), n + 1
        if start is not None:
            state.update((start, last, n))
        if closed:
            yield pd.DataFrame(
                {
                    "session_key": [c[0] for c in closed],
                    "session_start": pd.to_datetime([c[1] for c in closed], unit="s"),
                    "session_end": pd.to_datetime([c[2] for c in closed], unit="s"),
                    "n_events": [c[3] for c in closed],
                    "duration_sec": [c[2] - c[1] for c in closed],
                }
            )

    return (
        df.filter(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(F.col(key_col))
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "_ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """One row per (key, session): start, end, event count, duration.

    A new session starts when the gap to the previous event of the same key
    exceeds ``gap_seconds``. Rows with NULL key or timestamp are dropped
    (they can't be assigned to a session).
    """
    base = df.filter(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
    w = Window.partitionBy(key_col).orderBy(ts_col)
    ts = F.unix_timestamp(F.col(ts_col))
    prev = F.lag(ts).over(w)
    is_break = F.when(prev.isNull() | ((ts - prev) > gap_seconds), 1).otherwise(0)
    sess = base.withColumn("__brk", is_break).withColumn(
        "__sess", F.sum("__brk").over(w)
    )
    return (
        sess.groupBy(F.col(key_col).alias("session_key"), F.col("__sess"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .withColumn(
            "duration_sec",
            F.unix_timestamp("session_end") - F.unix_timestamp("session_start"),
        )
        .select("session_key", "session_start", "session_end", "n_events", "duration_sec")
    )
