"""Iceberg sink support: schema-evolution rules + catalog detection.

The reference's iceberg-processor applies widening-only schema evolution
before appending (iceberg-processor internal/sink/iceberg.go:855-884
schemaNeedsUpdate/isWidening): new columns may be ADDED, existing columns
may WIDEN (int→long, float→double, decimal precision growth at equal
scale), and everything else — drops, renames, narrowing, incompatible type
changes — is rejected.

This module gives the pipeline the same predicate Spark-side. The actual
`writeTo(table).append()` path activates only when an Iceberg catalog is
configured on the session (this container has no Iceberg runtime, so tests
cover the predicate and the branch selection, not a live append).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

#: allowed primitive widenings (iceberg.go isWidening)
_WIDENINGS: set[tuple[str, str]] = {
    ("integer", "long"),
    ("float", "double"),
}


def is_widening(src: T.DataType, dst: T.DataType) -> bool:
    """True iff changing a column from `src` to `dst` is a legal widening."""
    if src == dst:
        return True
    if isinstance(src, T.DecimalType) and isinstance(dst, T.DecimalType):
        # decimal may grow precision at the same scale (iceberg.go:875-880)
        return dst.scale == src.scale and dst.precision >= src.precision
    return (src.typeName(), dst.typeName()) in _WIDENINGS


def evolution_violations(
    existing: T.StructType, incoming: T.StructType
) -> list[str]:
    """Violations of the widening-only evolution contract; empty = OK.

    - columns only in `incoming` → allowed (add column)
    - columns only in `existing` → allowed (append writes NULLs)
    - columns in both must be identical or a legal widening
    """
    out: list[str] = []
    have = {f.name.lower(): f for f in existing.fields}
    for f in incoming.fields:
        old = have.get(f.name.lower())
        if old is None:
            continue  # new column: add
        if not is_widening(old.dataType, f.dataType):
            out.append(
                f"column {f.name!r}: {old.dataType.simpleString()} -> "
                f"{f.dataType.simpleString()} is not a widening"
            )
    return out


def has_iceberg_catalog(spark: SparkSession, table: str) -> bool:
    """True iff `table`'s catalog (the first identifier part when qualified,
    else the session's current/default catalog) is configured as a Spark
    catalog plugin — the signal that `writeTo(...).append()` will reach an
    Iceberg runtime."""
    parts = table.split(".")
    try:
        if len(parts) >= 2:
            catalog = parts[0]
        else:
            catalog = spark.conf.get("spark.sql.defaultCatalog", "spark_catalog")
        return spark.conf.get(f"spark.sql.catalog.{catalog}", None) is not None
    except Exception:  # noqa: BLE001
        return False
