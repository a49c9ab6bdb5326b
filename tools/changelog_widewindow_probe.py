"""Probe: wall time + plan width of a wide-window changelog() fold.

Builds an upsert-cadence table (1 seed append + N micro-upserts), then
times (a) changelog() over the full window and (b) an
IncrementalAggregate.refresh folding that window, recording the number
of scan leaves in the changelog plan. Run before/after the wide-window
rewrite to quantify it.

    python tools/changelog_widewindow_probe.py --upserts 100
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--upserts", type=int, default=100)
    ap.add_argument("--rows", type=int, default=50_000)
    ap.add_argument("--batch", type=int, default=50)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from platform_spark.iceberg.table import (
        IcebergTable,
        append_dataframe,
        upsert_dataframe,
    )
    from platform_spark.iceberg.matview import IncrementalAggregate

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', 8)}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    scratch = tempfile.mkdtemp(prefix="cl_probe_")
    root = os.path.join(scratch, "tbl")
    seed = spark.range(0, args.rows).select(
        F.col("id").alias("key"),
        (F.col("id") % 97).alias("grp"),
        F.lit(1).cast("long").alias("n"),
    )
    tbl = IcebergTable.create(root, seed.schema)
    first = append_dataframe(tbl, seed)["snapshot-id"]
    t0 = time.time()
    for c in range(args.upserts):
        lo = (c * 37) % (args.rows - args.batch)
        batch = spark.range(lo, lo + args.batch).select(
            F.col("id").alias("key"),
            (F.col("id") % 97).alias("grp"),
            F.lit(c + 2).cast("long").alias("n"),
        )
        upsert_dataframe(tbl, batch, ["key"])
    t_commits = time.time() - t0

    # (a) wide changelog fold: count + plan width
    t0 = time.time()
    cl = tbl.changelog(spark, from_snapshot_id=first)
    plan = cl._jdf.queryExecution().optimizedPlan().toString()
    n_leaves = plan.count("Relation")
    n_events = cl.count()
    t_changelog = time.time() - t0

    # (b) matview fold over the same window
    mv = IncrementalAggregate(
        os.path.join(scratch, "mv"),
        group_cols=["grp"],
        sum_cols=["n"],
    )
    t0 = time.time()
    mv.refresh(spark, tbl)
    t_mv = time.time() - t0
    n_groups = mv.read(spark, tbl).count()

    out = {
        "upserts": args.upserts,
        "rows": args.rows,
        "commit_wall_s": round(t_commits, 2),
        "changelog_events": n_events,
        "changelog_wall_s": round(t_changelog, 2),
        "changelog_plan_leaves": n_leaves,
        "matview_refresh_wall_s": round(t_mv, 2),
        "matview_groups": n_groups,
    }
    print(json.dumps(out))
    shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
