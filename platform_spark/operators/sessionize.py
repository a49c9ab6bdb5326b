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
    watermark_delay: str | None = None,
) -> DataFrame:
    """Streaming sessionization: the custom-stateful-operator path
    (`applyInPandasWithState`) for unbounded sources.

    Per-key state = the open session (start, last event, count); a new
    event either extends it or closes it (gap > ``gap_seconds``) and emits
    the closed session. Open sessions persist in the state store across
    micro-batches (exactly-once via the checkpoint).

    With ``watermark_delay`` (e.g. ``"10 minutes"``) the stream runs with
    an event-time watermark and EventTimeTimeout: a session idle past the
    gap is FLUSHED once the watermark passes its deadline — the production
    mode, with bounded state. Without it, open sessions stay in state until
    a later event closes them (simplest semantics; state grows with keys).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "session_key string, session_start timestamp, session_end timestamp, "
        "n_events long, duration_sec long"
    )
    state_schema = "start long, last long, n long"
    use_timeout = watermark_delay is not None

    def emit(key, closed: list[tuple]):
        # state carries epoch MICROS (exact ints — float epoch would lose
        # micros at 2024-era magnitudes); the gap rule compares
        # floor-second diffs, matching the batch twin's unix_timestamp rule
        return pd.DataFrame(
            {
                "session_key": [key for _ in closed],
                "session_start": pd.to_datetime([c[0] for c in closed], unit="us"),
                "session_end": pd.to_datetime([c[1] for c in closed], unit="us"),
                "n_events": [c[2] for c in closed],
                "duration_sec": [
                    c[1] // 1_000_000 - c[0] // 1_000_000 for c in closed
                ],
            }
        )

    def fn(key, pdfs, state: GroupState):
        if use_timeout and state.hasTimedOut:
            # watermark passed the session deadline: flush the open session
            start, last, n = state.get
            state.remove()
            yield emit(key[0], [(start, last, n)])
            return
        start, last, n = state.get if state.exists else (None, None, 0)
        closed: list[tuple] = []
        batches = [p for p in pdfs]
        rows = pd.concat(batches) if batches else pd.DataFrame(columns=[ts_col])
        for ts in sorted(rows[ts_col].dropna()):
            t = pd.Timestamp(ts).value // 1_000  # exact micros
            if start is None:
                start, last, n = t, t, 1
            elif t // 1_000_000 - last // 1_000_000 > gap_seconds:
                closed.append((start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = max(last, t), n + 1
        if start is not None:
            state.update((start, last, n))
            if use_timeout:
                state.setTimeoutTimestamp(
                    (last // 1_000_000 + gap_seconds) * 1000
                )
        if closed:
            yield emit(key[0], closed)

    src = df.filter(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
    timeout_conf = GroupStateTimeout.NoTimeout
    if use_timeout:
        src = src.withWatermark(ts_col, watermark_delay)
        timeout_conf = GroupStateTimeout.EventTimeTimeout
    return src.groupBy(F.col(key_col)).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout_conf
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


def sessionize_native(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "_ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap sessions via Spark's BUILT-IN ``session_window`` aggregate —
    the drop-to-built-in twin of ``sessionize``. One hash aggregate with
    native session merging in the state/sort layer; no lag/cumsum window
    chain, and it runs unchanged in Structured Streaming.

    Semantics differences vs ``sessionize`` (both documented, both
    oracle-pinned): touching windows MERGE (an event at exactly the gap
    extends the session — break only when diff > gap, at full
    MICROSECOND precision, while ``sessionize`` compares floor-second
    diffs); and ``session_end`` is the window end (last event + gap),
    not the last event's timestamp.
    """
    base = df.filter(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
    return (
        base.groupBy(
            F.session_window(F.col(ts_col), gap), F.col(key_col).alias("session_key")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "session_key",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
