"""Data-layout optimization for scan-heavy tables.

At 100 TB the cheapest query is the one that never reads the bytes:
parquet row-group min/max stats prune whole row groups — but only if
the write layout makes those stats selective. Two tools:

- ``optimize_layout``: range-partition + sort-within-partitions on the
  hot filter columns. Each output file then covers a narrow, disjoint
  slice of the sort key, so a point/range predicate prunes all but a
  few row groups (the reference gets the same effect from time-ordered
  segment files + its sparse time index; here the parquet footer IS the
  index, and Catalyst/DataSourceV2 applies it for free).
- ``zorder_key``: bit-interleaved composite key for MULTI-column
  locality (Delta/Iceberg-style Z-ordering). Sorting by one column
  makes its stats tight but leaves the others random; sorting by the
  interleaved key makes row-group bounding boxes small in EVERY
  dimension, so predicates on any subset of the columns prune.

Both are pure plan transformations (one range exchange + a local sort —
the same shuffle a sorted write needs anyway); nothing here is a new
operator at query time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def optimize_layout(
    df: DataFrame, cols: list[str], n_partitions: int | None = None
) -> DataFrame:
    """Range-partition on ``cols`` then sort within each partition, so a
    subsequent ``.write.parquet`` emits files/row-groups with narrow,
    non-overlapping min/max stats on those columns.

    Range partitioning samples the key distribution (one extra bounded
    job over a sample — Spark's RangePartitioner), so output files are
    balanced even under skew; AQE cannot merge a range exchange, so pick
    ``n_partitions`` ≈ data_size / target_file_size at write time.
    """
    rp = (
        df.repartitionByRange(n_partitions, *cols)
        if n_partitions
        else df.repartitionByRange(*cols)
    )
    return rp.sortWithinPartitions(*cols)


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of each
    (non-negative integral) column — column i contributes bit b to
    output position ``b * len(cols) + i``. Callers bucket/scale real
    values to small non-negative ints first (e.g. ``ntile`` or epoch
    minutes); ``bits * len(cols)`` must stay ≤ 63.

    Built entirely from shift/mask expressions — a static chain of
    ``bits × len(cols)`` ORs inside whole-stage codegen, no UDF.
    """
    d = len(cols)
    if bits * d > 63:
        raise ValueError(f"bits({bits}) * columns({d}) must be <= 63")
    out = F.lit(0).cast("bigint")
    for i, c in enumerate(cols):
        cl = c.cast("bigint")
        for b in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(
                    F.shiftright(cl, b).bitwiseAND(F.lit(1)), b * d + i
                ).cast("bigint")
            )
    return out


def optimize_layout_zorder(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    n_partitions: int | None = None,
) -> DataFrame:
    """Range-partition + sort by the Z-order key of ``cols`` (which must
    already be non-negative integral — bucket first). The helper column
    is dropped after the sort, so the output schema is unchanged."""
    z = zorder_key([F.col(c) for c in cols], bits=bits)
    keyed = df.withColumn("__z", z)
    rp = (
        keyed.repartitionByRange(n_partitions, "__z")
        if n_partitions
        else keyed.repartitionByRange("__z")
    )
    return rp.sortWithinPartitions("__z").drop("__z")
