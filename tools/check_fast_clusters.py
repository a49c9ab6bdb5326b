"""Quick equality check: fast cluster paths vs pairwise paths (sf0.001)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from platform_spark.session import get_spark
from platform_spark.gate import _doc_table, _emb_table, _NGRAM_THRESHOLD
from platform_spark.llmdata import dedup as dd
from platform_spark.llmdata.clusters import (
    dedup_clusters,
    dedup_clusters_fast,
    embedding_clusters_fast,
)

sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
spark = get_spark("check-fast-clusters", master="local[8]", shuffle_partitions=8)

docs = _doc_table(spark, sf_dir)
slow = dedup_clusters(dd.ngram_jaccard_pairs(docs, threshold=_NGRAM_THRESHOLD))
fast = dedup_clusters_fast(docs, threshold=_NGRAM_THRESHOLD)
s = {tuple(r) for r in slow.collect()}
f = {tuple(r) for r in fast.collect()}
print(f"ngram: slow={len(s)} fast={len(f)} equal={s == f}")
if s != f:
    print("  only-slow:", sorted(s - f)[:10])
    print("  only-fast:", sorted(f - s)[:10])

emb = _emb_table(spark, sf_dir)
slow_e = dedup_clusters(
    dd.embedding_neardup_pairs(emb, threshold=0.3, n_hyperplanes=16, bands=4),
    "id_a",
    "id_b",
)
fast_e = embedding_clusters_fast(emb, threshold=0.3, n_hyperplanes=16, bands=4)
se = {tuple(r) for r in slow_e.collect()}
fe = {tuple(r) for r in fast_e.collect()}
print(f"embedding: slow={len(se)} fast={len(fe)} equal={se == fe}")
if se != fe:
    print("  only-slow:", sorted(se - fe)[:10])
    print("  only-fast:", sorted(fe - se)[:10])
