"""As-of join: each left row matched to the latest right row at or before
its timestamp (per key, optionally within a tolerance horizon).

The reference has no as-of join (SURVEY §2.3 "Not present: ... as-of");
this is the standard time-series enrichment primitive (trades→quotes,
events→latest-state). Expressed Spark-first via the union-window trick:

    union(left tagged 1, right tagged 0)
    → one shuffle: Window.partitionBy(key).orderBy(ts, side, tiebreak)
    → last(right_payload, ignorenulls=True) over rows unbounded-preceding
    → keep left rows

Exactly ONE shuffle on the key — no range-condition join explosion, no
per-key driver loops. At 100 TB this is the plan you want: both sides
co-partition by key, the window is a linear per-partition pass. Ties:
a right row at exactly left._ts matches (side ordering puts right first);
duplicate right timestamps break deterministically on the tiebreak column
(highest wins — "latest write").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    payload_cols: list[str],
    tolerance_seconds: int | None = None,
    tiebreak_col: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left rows + the latest right payload at-or-before their timestamp.

    Output = all left columns, plus ``<payload>{suffix}`` for each payload
    column and ``{ts_col}{suffix}`` (the matched right timestamp; NULL when
    no right row qualifies). With ``tolerance_seconds``, matches older than
    the horizon are nulled out (pandas merge_asof tolerance semantics).
    """
    # SQL join semantics: NULL keys never match. Window.partitionBy would
    # group NULLs together, so drop NULL-key right rows (left NULL-key rows
    # then see an empty partition and get a NULL match naturally).
    right = right.filter(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
    tb = (
        F.col(tiebreak_col)
        if tiebreak_col
        else F.lit(0)
    )
    payload = F.struct(
        F.col(ts_col).alias("__ats"), *[F.col(c).alias(c) for c in payload_cols]
    )
    r = right.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        tb.alias("__tb"),
        payload.alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    l = left.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(0).alias("__tb"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *left.columns,
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts"), F.col("__side"), F.col("__tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l.unionByName(r).withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    out = matched.filter(F.col("__side") == 1)
    match_ts = F.col("__match.__ats")
    if tolerance_seconds is not None:
        horizon_ok = (
            F.unix_timestamp(F.col("__ts")) - F.unix_timestamp(match_ts)
        ) <= tolerance_seconds
        out = out.withColumn(
            "__match",
            F.when(match_ts.isNotNull() & horizon_ok, F.col("__match")),
        )
        match_ts = F.col("__match.__ats")
    cols = [F.col(c) for c in left.columns]
    cols.append(match_ts.alias(f"{ts_col}{suffix}"))
    cols.extend(F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in payload_cols)
    return out.select(*cols)
