"""platform_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of KafScale/platform.

Everything here is a from-scratch, Spark-first design: Parquet topic tables
replace KFS segments, Catalyst replaces hand-rolled pruning, and a thin
Python front-end reproduces the KAFSQL dialect (see SURVEY.md for the
structural analysis of the reference with file:line citations).
"""

from platform_spark.session import get_spark
from platform_spark.topics import TopicCatalog, TopicConfig, SchemaColumn
from platform_spark.sql.engine import KafSqlEngine

__all__ = [
    "get_spark",
    "TopicCatalog",
    "TopicConfig",
    "SchemaColumn",
    "KafSqlEngine",
]

__version__ = "0.1.0"
