"""Skew-handling and co-location utilities for 100 TB-scale plans.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; these helpers cover the cases AQE can't:

- `salted_aggregate`: two-phase aggregation for heavy-hitter group keys —
  partial agg on (key, salt) then final agg on key. Works for any
  algebraic aggregate set (sum/count/min/max); avg = sum+count composed.
- `salted_join`: replicate the small side S ways so one hot key's rows
  spread over S tasks instead of one.
- `bucketed_topics`: write two topics bucketed by join key so repeated
  co-located joins skip the shuffle entirely (Spark bucketed tables).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    `aggs` maps output name → (fn, column) with fn ∈ {sum,count,min,max}.
    Phase 1 aggregates on (keys..., salt) — spreading a hot key across
    n_salts reducers — phase 2 merges partials on keys. Results are
    identical to a direct groupBy (all fns are algebraic).
    """
    merge = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    # salt = row fingerprint mixed with a per-row id: the id term spreads
    # EXACT-DUPLICATE rows (a content-only hash would send every copy of a
    # hot key's repeated row to one salt bucket — the very skew this
    # operator exists to break). monotonically_increasing_id is
    # retry-nondeterministic, but the salt only load-balances: the merged
    # result is provably identical for ANY salt assignment (algebraic fns)
    salted = df.withColumn(
        "__salt",
        F.pmod(
            F.abs(
                F.xxhash64(*[F.col(c) for c in df.columns], F.monotonically_increasing_id())
            ),
            F.lit(n_salts),
        ),
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[first[fn](col).alias(f"__p_{name}") for name, (fn, col) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge[fn](f"__p_{name}").alias(name) for name, (fn, _col) in aggs.items()]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the (large, skewed) left side and
    explode the (small) right side across all salt values, so a hot key's
    probe rows land on n_salts tasks. Use when a broadcast is too large
    and AQE's split threshold misses the skew."""
    # id term spreads duplicate probe rows (see salted_aggregate); every
    # salt value joins the exploded right side identically, so the result
    # set is independent of the assignment
    l = left.withColumn(
        "__salt",
        F.pmod(
            F.abs(
                F.xxhash64(*[F.col(c) for c in left.columns], F.monotonically_increasing_id())
            ),
            F.lit(n_salts),
        ),
    )
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = l.join(r, [key, "__salt"], how)
    return out.drop("__salt")


def bucketed_topics(
    spark,
    dfs: dict[str, DataFrame],
    key: str,
    n_buckets: int,
    database_path: str | None = None,
) -> dict[str, DataFrame]:
    """Write each DataFrame as a bucketed+sorted table on `key` so
    subsequent equi-joins between them are shuffle-free (SortMergeJoin
    with no Exchange). Returns the re-read tables."""
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
    out = {}
    for name, df in dfs.items():
        table = f"bkt_{name}"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        if warehouse:
            shutil.rmtree(f"{warehouse}/{table}", ignore_errors=True)
        (
            df.write.mode("overwrite")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .saveAsTable(table)
        )
        out[name] = spark.table(table)
    return out
