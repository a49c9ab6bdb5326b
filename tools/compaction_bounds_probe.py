"""Probe: manifest column-bounds pruning BEFORE vs AFTER sort-aware
compaction.

Builds a doc_id-sorted table from many small interleaved append commits
(each batch stripes across the whole key range, so per-file bounds all
overlap and a point/range lookup can prune nothing), then compacts —
compaction re-sorts per the declared order via repartitionByRange +
sortWithinPartitions — and measures files planned for the same lookups
via filter_entries_by_bounds. Output feeds the PLANS.md record.

    python tools/compaction_bounds_probe.py
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from platform_spark.iceberg.table import (
        IcebergTable, append_dataframe, compact_table,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    scratch = tempfile.mkdtemp(prefix="cb_probe_")
    loc = os.path.join(scratch, "tbl")

    n_commits, rows_per, total = 40, 25_000, 40 * 25_000
    seed = spark.range(0, rows_per).select(F.col("id").alias("doc_id"))
    tbl = IcebergTable.create(loc, seed.schema.add("text", "string"),
                              sort_by=("doc_id",))
    # striped commits: batch c holds ids c, c+40, c+80, ... — every
    # file's [min,max] spans ~the whole key range
    for c in range(n_commits):
        batch = spark.range(0, rows_per).select(
            (F.col("id") * n_commits + c).alias("doc_id"),
            F.concat(F.lit("d"), F.col("id")).alias("text"),
        )
        append_dataframe(tbl, batch)

    def planned(lo: int, hi: int) -> int:
        entries = tbl.scan_files()
        kept = tbl.filter_entries_by_bounds(entries, {"doc_id": (lo, hi)})
        return len(kept)

    n_files_pre = len(tbl.scan_files())
    point_pre = planned(777_777, 777_777)
    range_pre = planned(100_000, 110_000)

    compact_table(tbl, spark, files_per_partition=40)
    n_files_post = len(tbl.scan_files())
    point_post = planned(777_777, 777_777)
    range_post = planned(100_000, 110_000)
    assert tbl.to_spark(spark).count() == total

    print(json.dumps({
        "commits": n_commits,
        "rows": total,
        "files_pre": n_files_pre,
        "files_post": n_files_post,
        "point_lookup_files_pre": point_pre,
        "point_lookup_files_post": point_post,
        "range_10k_files_pre": range_pre,
        "range_10k_files_post": range_post,
    }))
    shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
