"""Range join: points matched to intervals containing them.

The reference has no range join (SURVEY §2.3 "Not present: ... theta
joins"); Spark's naive form (`ON v BETWEEN lo AND hi`) plans a broadcast
nested loop — quadratic at scale. This is the standard bucketized
formulation instead:

    point bucket  = floor(v / width)
    interval rows = explode(sequence(floor(lo/width), floor(hi/width)))
    equi-join on bucket (+ optional key), then exact BETWEEN filter

Each (point, interval) match survives in exactly ONE bucket (the point's),
so no dedup is needed. Shuffle volume = points + intervals × avg_spans;
pick ``bucket_width`` near the typical interval length so avg_spans ≈ 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    val_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    key_col: str | None = None,
    how: str = "inner",
    max_spans: int = 100_000,
) -> DataFrame:
    """Rows = all point columns + all interval columns for every interval
    with ``lo <= v <= hi`` (and equal ``key_col`` when given).

    ``max_spans`` guards against a malformed/outlier interval exploding
    into an unbounded bucket sequence (one lo=0/hi=1e12 row would try to
    build a 10^10-element array): the job fails with a clear message
    instead. Pick ``bucket_width`` so real intervals span a handful of
    buckets."""
    if how != "inner":
        raise ValueError("range_join supports inner joins")
    p = points.withColumn(
        "__b", F.floor(F.col(val_col) / F.lit(bucket_width)).cast("long")
    )
    lo_b = F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long")
    hi_b = F.floor(F.col(hi_col) / F.lit(bucket_width)).cast("long")
    span_guard = F.when(
        hi_b - lo_b > max_spans,
        F.raise_error(
            F.concat(
                F.lit(
                    f"range_join interval spans more than {max_spans} buckets "
                    f"(width {bucket_width}): lo="
                ),
                F.col(lo_col).cast("string"),
                F.lit(" hi="),
                F.col(hi_col).cast("string"),
            )
        ).cast("long"),
    ).otherwise(hi_b)
    i = intervals.withColumn("__b", F.explode(F.sequence(lo_b, span_guard)))
    on = ["__b"] + ([key_col] if key_col else [])
    joined = p.join(i, on=on).filter(
        F.col(val_col).between(F.col(lo_col), F.col(hi_col))
    )
    return joined.drop("__b")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    lo_left: str,
    hi_left: str,
    lo_right: str,
    hi_right: str,
    bucket_width: float,
    key_col: str | None = None,
    max_spans: int = 100_000,
) -> DataFrame:
    """Interval-OVERLAP equi-join: all (left, right) row pairs whose closed
    intervals intersect (``lo_l <= hi_r AND lo_r <= hi_l``), optionally
    within a key. The generalization of `range_join` (a point is a
    zero-length interval) and the shape behind session-vs-campaign /
    outage-vs-request overlap analytics.

    Same bucketization: both sides explode to the buckets they cover and
    equi-join on (bucket, key). A pair that overlaps shares every bucket
    in the overlap range, so matches are deduplicated positionally — a
    pair is kept ONLY in the bucket containing max(lo_l, lo_r), which
    both sides cover exactly once. No `distinct`, no nested loop; shuffle
    volume = rows × avg buckets-per-interval. Pick ``bucket_width`` near
    the typical interval length."""

    def buckets(df: DataFrame, lo: str, hi: str) -> DataFrame:
        lo_b = F.floor(F.col(lo) / F.lit(bucket_width)).cast("long")
        hi_b = F.floor(F.col(hi) / F.lit(bucket_width)).cast("long")
        guard = F.when(
            hi_b - lo_b > max_spans,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"interval_join interval spans more than {max_spans} "
                        f"buckets (width {bucket_width}): lo="
                    ),
                    F.col(lo).cast("string"),
                    F.lit(" hi="),
                    F.col(hi).cast("string"),
                )
            ).cast("long"),
        ).otherwise(hi_b)
        return df.withColumn("__b", F.explode(F.sequence(lo_b, guard)))

    on = ["__b"] + ([key_col] if key_col else [])
    joined = (
        buckets(left, lo_left, hi_left)
        .join(buckets(right, lo_right, hi_right), on=on)
        .filter(
            (F.col(lo_left) <= F.col(hi_right))
            & (F.col(lo_right) <= F.col(hi_left))
        )
        # positional dedup: keep the pair only in max(lo_l, lo_r)'s bucket
        .filter(
            F.col("__b")
            == F.floor(
                F.greatest(F.col(lo_left), F.col(lo_right)) / F.lit(bucket_width)
            ).cast("long")
        )
    )
    return joined.drop("__b")


def time_rollup(
    df: DataFrame,
    ts_col: str,
    sum_cols: list[str],
    granularities: tuple[str, ...] = ("hour", "day"),
) -> DataFrame:
    """Hypertable-style hierarchical rollup: aggregate at the finest
    granularity from the raw rows, then build each coarser level FROM the
    previous aggregate (sums and counts compose) — the continuous-aggregate
    trick that makes day-level rollups read hour-level partials instead of
    re-scanning raw data.

    Output: one row per (granularity, bucket) with `n_rows` and
    `sum_<col>` for each requested column.
    """
    aggs = [F.count("*").alias("n_rows")] + [
        F.sum(F.col(c).cast("decimal(38,9)")).alias(f"sum_{c}") for c in sum_cols
    ]
    level = (
        df.groupBy(F.date_trunc(granularities[0], F.col(ts_col)).alias("bucket"))
        .agg(*aggs)
    )
    out = level.withColumn("granularity", F.lit(granularities[0]))
    for g in granularities[1:]:
        reaggs = [F.sum("n_rows").alias("n_rows")] + [
            F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols
        ]
        level = (
            level.groupBy(F.date_trunc(g, F.col("bucket")).alias("bucket"))
            .agg(*reaggs)
        )
        out = out.unionByName(level.withColumn("granularity", F.lit(g)))
    final_cols = ["granularity", "bucket", "n_rows"] + [
        f"sum_{c}" for c in sum_cols
    ]
    return out.select(
        *final_cols[:3],
        *[F.col(c).cast("double").alias(c) for c in final_cols[3:]],
    )
