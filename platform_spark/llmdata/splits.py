"""Deterministic dataset splitting: train/val/test assignment by content-
stable hashing.

A training-data staple the reference lacks: every document must land in
exactly one split, the assignment must be reproducible across runs,
engines, and re-shards (so a re-run never leaks val docs into train), and
no shuffle or sampling state may be involved. Assignment is a pure
per-row expression — `md5(id) mod 10_000` mapped through cumulative
weight buckets — so it's embarrassingly parallel and bit-identical in any
engine (the DuckDB gate oracle reproduces it exactly).

`Dataset.randomSplit` is NOT reproducible under re-partitioning (it
samples per-partition); hash-assignment is the production pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from platform_spark.llmdata.dedup import md5_int

_RESOLUTION = 10_000


def split_column(
    id_col: Column,
    weights: dict[str, float],
    seed: str = "split",
) -> Column:
    """Split label for an id: buckets of `md5(seed || id) mod 10000` are
    assigned to labels by cumulative weight (insertion order)."""
    total = sum(weights.values())
    bucket = F.pmod(md5_int(id_col.cast("string"), seed=f"{seed}:"), F.lit(_RESOLUTION))
    expr: Column | None = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        cut = int(acc * _RESOLUTION)
        cond = bucket < F.lit(cut)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    return (F.lit(last) if expr is None else expr.otherwise(F.lit(last))).alias("split")


def assign_splits(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: str = "split",
) -> DataFrame:
    """Add a `split` column. Default 90/5/5 train/val/test."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    return df.withColumn("split", split_column(F.col(id_col), weights, seed))
