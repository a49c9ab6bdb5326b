"""Driver contract for the spark-graft builder (PySpark target).

`queries()` / `oracle_sql()` pairs live in platform_spark/gate.py (and the
extension modules register theirs there too); each query runs through the
real engine stack (KAFSQL parser → compiler → DataFrame) or the DataFrame
operator APIs, never ad-hoc SQL shortcuts.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The phase-1 end-to-end slice (SURVEY.md §7): filter + groupBy + agg
    with deterministic output ordering through the full KAFSQL stack.
    """
    from platform_spark.gate import engine_for

    eng = engine_for(spark, "/root/testdata/sf0.001")
    return eng.sql(
        "SELECT _partition, count(*) AS cnt, max(_ts) AS latest, "
        "sum(json_value(_value, '$.amount')) AS total "
        "FROM events LAST 30d GROUP BY _partition"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from platform_spark.gate import GATE

    return {name: fn for name, (fn, _oracle) in GATE.items()}


def oracle_sql() -> dict[str, str]:
    from platform_spark.gate import GATE

    return {
        name: oracle for name, (_fn, oracle) in GATE.items() if oracle is not None
    }
