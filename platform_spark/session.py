"""SparkSession factory with scale-oriented defaults.

The engine is designed for a multi-executor cluster reading ~100 TB; these
configs encode that stance (AQE on, skew-join handling, partition coalescing,
sane broadcast threshold) while remaining correct on local[N] for tests.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# The driver test tables carry TIMESTAMP(NANOS) parquet columns which Spark
# refuses by default; we read them as long nanos and convert at the topic
# layer (see topics.py).
_NANOS_AS_LONG = "spark.sql.legacy.parquet.nanosAsLong"

#: Correctness-critical confs the engine depends on, all runtime-settable via
#: ``spark.conf.set`` — applied to ANY session handed to the engine (the
#: round-1 driver passed a bare session built without ``get_spark``, and every
#: query died at catalog init on PARQUET_TYPE_ILLEGAL because these were only
#: set at builder time). The engine must own its session semantics no matter
#: who constructed the session.
RUNTIME_CONFS: dict[str, str] = {
    # driver fixtures carry TIMESTAMP(NANOS) parquet columns
    _NANOS_AS_LONG: "true",
    # reference semantics: bad cast / missing JSON path → NULL, never an
    # error (server.go:2721-2756); Spark 4 ANSI default would throw
    "spark.sql.ansi.enabled": "false",
    # one timestamp semantics everywhere; oracle (DuckDB) compares in UTC
    "spark.sql.session.timeZone": "UTC",
    # micros keeps `_ts` min/max footer stats (INT96 has none)
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    # Arrow for the Pandas-UDF extension operators
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # scale posture (all runtime-settable): AQE coalesce/skew handling
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply the engine's correctness-critical confs to an existing session.

    Idempotent and safe on sessions the engine didn't build. Static confs
    (serializer, driver memory) are skipped — only what ``spark.conf.set``
    accepts post-creation, which covers everything correctness depends on.
    """
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # a static conf on some future Spark — never fail catalog init
            pass
    try:
        # a bare session keeps Spark's default 200 shuffle partitions —
        # wasteful at local core counts. Replace ONLY the untouched default
        # (an explicitly tuned session is left alone); AQE coalescing makes
        # this a ceiling, not a floor.
        if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"),
            )
    except Exception:
        pass
    return spark


def get_spark(
    app_name: str = "platform-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for the engine.

    Scale posture:
    - AQE enabled: runtime coalescing of shuffle partitions, skew-join
      splitting, and dynamic join-strategy switching (broadcast when a side
      turns out small) — this is what replaces the reference's hand-rolled
      "always hash-build the right side" join (server.go:2399).
    - ``maxPartitionBytes`` 128 MiB keeps scan tasks memory-bounded at any
      input size; ``openCostInBytes`` default packs small files.
    - Arrow enabled for the Pandas-UDF extension operators (dedup/similarity/
      multimodal) so Python boundaries are vectorized, never row-at-a-time.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalesces post-shuffle partitions by BYTES, but several
        # engine stages are CPU-dense per byte (interpreted vector folds,
        # candidate verifies over array columns): the default 1 MB floor
        # collapses a 3 MB / 5-CPU-second shuffle onto 3 tasks (r15
        # profile of the embedding verify). 128 KB keeps task overhead
        # amortized (~2k vector rows per task) while leaving any
        # normally-sized shuffle untouched — at production volumes
        # partitions are far above either floor, so this only affects
        # small-but-expensive exchanges. Env-overridable for deployments.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_AQE_MIN_PARTITION_SIZE", "128k"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Reference semantics: missing JSON path or uncastable value → NULL
        # (server.go:2721-2756), never an error. Spark 4's default ANSI mode
        # would throw on bad casts instead.
        .config("spark.sql.ansi.enabled", "false")
        .config(_NANOS_AS_LONG, "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # INT96 (the legacy default) has no column stats and defeats
        # timestamp pushdown/pruning; micros keeps `_ts` min/max in footers
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI_ENABLED", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
