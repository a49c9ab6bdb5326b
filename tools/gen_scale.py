"""Generate a larger scale-factor dir by replicating an existing one with
deterministic key offsets (scale rehearsal for bench.py — the driver
fixtures are read-only, so derived data lands in repo-local scratch).

Usage: python tools/gen_scale.py [--src /root/testdata/sf0.1] \
           [--dest .bench/sf1] [--copies 10]

Referential integrity is preserved per copy: every *key column is offset
by copy_i * stride (stride = max key + 1 across the source), so joins
produce copy-local matches exactly like the source. Dimension-like tiny
tables (region, nation) are NOT replicated — at 100 TB the dims stay
small; scaling facts against fixed dims is the realistic shape.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from platform_spark.session import get_spark

#: key columns to offset per table, tagged with their key DOMAIN. A
#: domain's stride comes from the domain-owning table's max key (e.g.
#: o_custkey strides by customer's max, NOT orders' own max) — offsetting
#: each column by its own table's max would desync referencing/referenced
#: ranges whenever some keys are unreferenced (1/3 of TPC-H customers
#: place no orders).
OFFSET_COLS: dict[str, list[tuple[str, str]]] = {
    "customer": [("c_custkey", "custkey")],
    "supplier": [("s_suppkey", "suppkey")],
    "part": [("p_partkey", "partkey")],
    "orders": [("o_orderkey", "orderkey"), ("o_custkey", "custkey")],
    "lineitem": [
        ("l_orderkey", "orderkey"),
        ("l_partkey", "partkey"),
        ("l_suppkey", "suppkey"),
    ],
    "documents": [("doc_id", "docid")],
    "embeddings": [("vec_id", "vecid")],
    "events": [],  # string user ids handled below
}
#: domain → (owning table, key column)
KEY_DOMAINS = {
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "partkey": ("part", "p_partkey"),
    "orderkey": ("orders", "o_orderkey"),
    "docid": ("documents", "doc_id"),
    "vecid": ("embeddings", "vec_id"),
}
COPY_AS_IS = ["region", "nation"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dest", default=".bench/sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    spark = get_spark("gen-scale")
    os.makedirs(args.dest, exist_ok=True)

    for t in COPY_AS_IS:
        src = os.path.join(args.src, f"{t}.parquet")
        spark.read.parquet(src).write.mode("overwrite").parquet(
            os.path.join(args.dest, f"{t}.parquet")
        )
        print(f"{t}: copied")

    # domain strides from the owning tables, shared by every referencing col
    strides: dict[str, int] = {}
    for domain, (table, keycol) in KEY_DOMAINS.items():
        p = os.path.join(args.src, f"{table}.parquet")
        if os.path.exists(p):
            strides[domain] = (
                int(spark.read.parquet(p).agg(F.max(keycol)).first()[0]) + 1
            )

    for t, keys in OFFSET_COLS.items():
        src = os.path.join(args.src, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        df = spark.read.parquet(src)
        copies = []
        for i in range(args.copies):
            c = df
            for k, domain in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * strides[domain]))
            if t == "events" and i > 0:
                # user_id lives inside the JSON _value for topic queries and
                # as a column in the raw table; suffix the column only (raw
                # analytics path) — topic-envelope queries run on testdata
                if "user_id" in c.columns:
                    c = c.withColumn(
                        "user_id", F.concat(F.col("user_id"), F.lit(f"_{i}"))
                    )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(os.path.join(args.dest, f"{t}.parquet"))
        n = spark.read.parquet(os.path.join(args.dest, f"{t}.parquet")).count()
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
