"""Regenerate platform_spark/llmdata/ivf_pinned.py from the sf0.01 fixtures.

The pinned matrix is the deterministic k-means fit the llm_ann_ivf_kmeans
gate's oracle carries as a literal — rerun this only if the driver's
embeddings fixture changes.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from platform_spark.llmdata import similarity as sim
from platform_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_PIN_SF", "/root/testdata/sf0.01")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "platform_spark", "llmdata", "ivf_pinned.py",
)

spark = get_spark("fit-pinned-centroids", master="local[8]", shuffle_partitions=8)
emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
matrix = [
    [round(x, 6) for x in c]
    for c in sim.fit_kmeans_centroids(emb, 8, deterministic=True)
]

lines = [
    '"""Pinned k-means IVF centroids for the correctness gate.',
    "",
    "Fitted ONCE with ``fit_kmeans_centroids(embeddings, 8, deterministic=True)``",
    "(pyspark.ml KMeans, seed 42, maxIter 10, single-partition fit input) on the",
    "driver's sf0.01 embeddings table, then rounded to 6 decimals. The gate's",
    "Spark side re-fits at query time and must reproduce this matrix bit-exactly",
    "(the oracle carries it as a literal), so the gate checks the pyspark.ml fit",
    "path end-to-end, not just the assignment/topk math. Regenerate with",
    "tools/fit_pinned_centroids.py if the fixture data ever changes.",
    '"""',
    "",
    "KMEANS_CENTROIDS_SF001: list[list[float]] = [",
    *("    [" + ", ".join(repr(x) for x in c) + "]," for c in matrix),
    "]",
]
with open(OUT, "w") as f:
    f.write("\n".join(lines) + "\n")
print(f"wrote {OUT}: {len(matrix)} x {len(matrix[0])}")
