"""Regenerate platform_spark/llmdata/pq_pinned.py from the sf0.01 fixtures.

The pinned product-quantization codebook is the deterministic per-subspace
k-means fit whose gate oracle carries it as VALUES (llm_ann_pq_topk) —
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
    "platform_spark", "llmdata", "pq_pinned.py",
)

spark = get_spark("fit-pinned-pq", master="local[8]", shuffle_partitions=8)
emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
cb = [
    [[round(x, 6) for x in c] for c in sub]
    for sub in sim.fit_pq_codebook(emb, m=8, ksub=16, dim=64, deterministic=True)
]

lines = [
    '"""Pinned product-quantization codebook for the correctness gate.',
    "",
    "Fitted ONCE on the driver's sf0.01 embeddings table with",
    "``fit_pq_codebook(emb, m=8, ksub=16, dim=64, deterministic=True)``",
    "(per-subspace pyspark.ml k-means, seed 42, single-partition fit input),",
    "rounded to 6 decimals. The llm_ann_pq_topk oracle carries it as VALUES;",
    "the pytest spec re-fits and must reproduce it bit-exactly. Regenerate",
    "with tools/fit_pinned_pq.py if the fixture data ever changes.",
    '"""',
    "",
    "PQ_CODEBOOK_SF001: list[list[list[float]]] = [",
]
for sub in cb:
    lines.append("    [")
    for c in sub:
        lines.append("        [" + ", ".join(repr(x) for x in c) + "],")
    lines.append("    ],")
lines.append("]")
with open(OUT, "w") as f:
    f.write("\n".join(lines) + "\n")
print(f"wrote {OUT}: {len(cb)} subspaces x {len(cb[0])} centroids x {len(cb[0][0])} dims")
