"""Regenerate platform_spark/llmdata/ivf_pinned.py from the sf0.01 fixtures.

The pinned matrices are the deterministic k-means / PCA fits whose gate
oracles carry them as literals (llm_ann_ivf_kmeans, llm_ann_pca_topk) —
rerun this only if the driver's embeddings fixture changes.
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

spark = get_spark("fit-pinned", master="local[8]", shuffle_partitions=8)
emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
kmeans = [
    [round(x, 6) for x in c]
    for c in sim.fit_kmeans_centroids(emb, 8, deterministic=True)
]
pca = [
    [round(x, 6) for x in c]
    for c in sim.fit_pca_components(emb, 8, deterministic=True)
]

lines = [
    '"""Pinned fitted matrices for the correctness gates.',
    "",
    "Fitted ONCE on the driver's sf0.01 embeddings table with",
    "``fit_kmeans_centroids(emb, 8, deterministic=True)`` (seed 42, maxIter 10)",
    "and ``fit_pca_components(emb, 8, deterministic=True)`` (no RNG), each on a",
    "single-partition fit input, rounded to 6 decimals. The gates' Spark sides",
    "re-fit at query time and must reproduce these matrices bit-exactly (the",
    "oracles carry them as literals), so the pyspark.ml fit paths are inside",
    "the hash checks, not just the downstream math. Regenerate with",
    "tools/fit_pinned_centroids.py if the fixture data ever changes.",
    '"""',
    "",
    "KMEANS_CENTROIDS_SF001: list[list[float]] = [",
    *("    [" + ", ".join(repr(x) for x in c) + "]," for c in kmeans),
    "]",
    "",
    "PCA_COMPONENTS_SF001: list[list[float]] = [",
    *("    [" + ", ".join(repr(x) for x in c) + "]," for c in pca),
    "]",
]
with open(OUT, "w") as f:
    f.write("\n".join(lines) + "\n")
print(f"wrote {OUT}: kmeans {len(kmeans)}x{len(kmeans[0])}, pca {len(pca)}x{len(pca[0])}")
