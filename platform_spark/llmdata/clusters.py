"""Duplicate-cluster resolution: pairs → connected components → keepers.

Dedup operators (exact/minhash/simhash/ngram in dedup.py) emit PAIRS; a
training-data pipeline then needs each *cluster* of mutual duplicates
collapsed to one canonical document. That is connected components with the
min doc id as the cluster label — computed by iterative min-label
propagation: each round every node takes the min label among itself and
its neighbors; converges in O(component diameter) rounds.

Scale posture: each round is one join + one aggregate on the (symmetric)
edge list — all shuffles keyed by node id, no driver-side state beyond the
convergence counter (one count() action per round, the standard pattern
for iterative fixpoints à la GraphX/Pregel). Duplicate clusters are
near-cliques in practice, so diameter — and round count — is tiny (2-3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 25,
) -> DataFrame:
    """(doc_id, cluster_id) for every doc in `pairs`, where cluster_id is
    the min doc id of its connected component; plus is_keeper."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        # materialize once: the pair-generating plan (often an expensive
        # similarity join) must not re-execute every propagation round
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    changed = 0
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("__chg"),
            )
        )
        updated = updated.localCheckpoint(eager=True)  # truncate the lineage
        changed = updated.filter(F.col("__chg")).count()
        labels = updated.select("node", "label")
        if changed == 0:
            break
    if changed != 0:
        # a silent partial result would split one component into several
        # "keepers" — fail loudly instead (component diameter exceeded
        # max_iterations; dup clusters are near-cliques, so this means
        # pathological input or too small a bound)
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iterations} rounds "
            f"({changed} labels still changing); raise max_iterations"
        )
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        (F.col("node") == F.col("label")).alias("is_keeper"),
    )


def cluster_summary(clusters: DataFrame) -> DataFrame:
    """One row per cluster: size + keeper (min id)."""
    return clusters.groupBy("cluster_id").agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper")
    )
