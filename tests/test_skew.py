"""Skew/co-location operator tests: salted results must equal direct ones,
bucketed joins must drop the shuffle."""

from __future__ import annotations

import pyspark.sql.functions as F

from platform_spark.operators.skew import bucketed_topics, salted_aggregate, salted_join


def test_salted_aggregate_matches_direct(spark):
    # heavily skewed key distribution: 90% of rows share one key
    df = spark.range(20000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    direct = {
        (r["k"]): (r["s"], r["c"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("c"), F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r["k"]): (r["s"], r["c"], r["mn"], r["mx"])
        for r in salted_aggregate(
            df, ["k"], {"s": ("sum", "v"), "c": ("count", "v"), "mn": ("min", "v"), "mx": ("max", "v")}
        ).collect()
    }
    assert direct == salted


def test_salted_join_matches_direct(spark):
    left = spark.range(5000).select(
        F.when(F.col("id") % 5 < 4, F.lit(1)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 10).alias("rv"))
    direct = left.join(right, "k").groupBy().agg(
        F.count("*").alias("n"), F.sum("rv").alias("s")
    ).collect()[0]
    salted = salted_join(left, right, "k").groupBy().agg(
        F.count("*").alias("n"), F.sum("rv").alias("s")
    ).collect()[0]
    assert (direct["n"], direct["s"]) == (salted["n"], salted["s"])


def test_bucketed_join_has_no_shuffle(spark, catalog):
    orders = catalog.table("orders").select("o_orderkey", "o_totalprice")
    lineitem = catalog.table("lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    tables = bucketed_topics(
        spark, {"o": orders, "l": lineitem}, key="o_orderkey", n_buckets=8
    )
    # disable broadcast so the planner must consider the shuffle it saves
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = tables["o"].join(tables["l"], "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # co-located buckets: no hash-repartition shuffle on either side
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
