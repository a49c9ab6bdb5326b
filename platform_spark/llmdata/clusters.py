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

Fast path (`dedup_clusters_fast` / `embedding_clusters_fast`): when the
deliverable is clusters/keepers rather than the pair list, materializing
all C(c,2) intra-cluster pairs is wasted work — on corpora dominated by
replicated documents the pair count grows quadratically in copy count
(the sf1 rehearsal measured ~100× pairs from 10× replicated data). The
fix: collapse EXACT duplicates first (one hash-aggregate), run the
similarity candidate generation on distinct contents only, propagate
labels on that small content graph, then expand back through the content
hash. Output is provably identical to `dedup_clusters(<pairs over all
docs>)` because similarity is a pure function of content — with one
subtlety handled explicitly: the n-gram hot-shingle cutoff depends on
*document* frequency, so the fast path weights each distinct content by
its copy count when computing shingle DF (making the hot set, and thus
the candidate graph, bit-identical to the all-docs run). A star-edge
scheme (bucket-member → bucket-min edges) was considered instead and
rejected: with exact-verification in the loop it can split components
when the bucket min fails verification against a true duplicate, so its
output is NOT always equal to the pairwise path; exact-collapse is both
cheaper and exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _propagate_min_labels(
    pairs: DataFrame, a_col: str, b_col: str, max_iterations: int
) -> DataFrame:
    """(node, label) for every node in `pairs`, label = min node id of its
    connected component. Iterative min-label propagation; raises if not
    converged (a silent partial result would split components)."""
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
        # pointer-jumping shortcut: also adopt the label's OWN label
        # (always <= the label under min-propagation), turning the
        # diameter-bound walk into ~log(diameter) rounds — each round
        # costs one extra self-join but saves a full round's action +
        # checkpoint on long paths
        lab2 = updated.select(
            F.col("node").alias("__n2"), F.col("label").alias("__l2")
        )
        updated = (
            updated.join(lab2, updated.label == F.col("__n2"), "left")
            .select(
                "node",
                F.coalesce(F.col("__l2"), F.col("label")).alias("label"),
                (F.col("__chg") | (F.col("__l2") < F.col("label"))).alias("__chg"),
            )
        )
        updated = updated.localCheckpoint(eager=True)  # truncate the lineage
        changed = updated.filter(F.col("__chg")).count()
        labels = updated.select("node", "label")
        if changed == 0:
            break
    if changed != 0:
        # component diameter exceeded max_iterations; dup clusters are
        # near-cliques, so this means pathological input or too small a bound
        raise RuntimeError(
            f"min-label propagation did not converge in {max_iterations} rounds "
            f"({changed} labels still changing); raise max_iterations"
        )
    return labels


def dedup_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 25,
) -> DataFrame:
    """(doc_id, cluster_id) for every doc in `pairs`, where cluster_id is
    the min doc id of its connected component; plus is_keeper."""
    labels = _propagate_min_labels(pairs, a_col, b_col, max_iterations)
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        (F.col("node") == F.col("label")).alias("is_keeper"),
    )


def _expand_rep_labels(
    doc_hashes: DataFrame,  # (doc_id, __ch)
    reps: DataFrame,        # (__ch, rep_id, n_copies)
    rep_pairs: DataFrame,   # (doc_a, doc_b) edges between rep ids
    eligible_multi: DataFrame,  # (rep_id) reps whose copies self-cluster
    max_iterations: int,
) -> DataFrame:
    """Shared tail of the fast cluster paths: propagate min labels over the
    content-representative graph, add isolated multi-copy reps as their own
    clusters, then expand back to every doc through the content hash.

    cluster_id over the expanded graph = min doc id of the component =
    min rep id (each rep is already the min id among its copies), which is
    exactly the propagated label."""
    labels = _propagate_min_labels(rep_pairs, "doc_a", "doc_b", max_iterations)
    all_labels = (
        labels.unionByName(
            eligible_multi.select(
                F.col("rep_id").alias("node"), F.col("rep_id").alias("label")
            )
        )
        .groupBy("node")
        .agg(F.min("label").alias("label"))
    )
    expanded = doc_hashes.join(
        reps.select("__ch", "rep_id"), "__ch"
    ).join(all_labels.withColumnRenamed("node", "rep_id"), "rep_id")
    return expanded.select(
        F.col("doc_id"),
        F.col("label").alias("cluster_id"),
        (F.col("doc_id") == F.col("label")).alias("is_keeper"),
    )


def dedup_clusters_fast(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.2,
    stop_shingle_df: float = 0.2,
    max_iterations: int = 25,
) -> DataFrame:
    """Identical output to
    ``dedup_clusters(ngram_jaccard_pairs(df, k=k, threshold=threshold,
    stop_shingle_df=stop_shingle_df))`` without materializing O(copies²)
    pairs: exact-collapse → content-level Jaccard graph → expand.

    Equality argument (each step exact, not approximate):
    - Jaccard, shingle sets and sizes are pure functions of text, so the
      content-level pair set projects the all-docs pair set one-to-one —
      PROVIDED the hot-shingle cutoff sees the same document frequencies;
      we weight each distinct content by n_copies to guarantee that.
    - Copies of one content pair in the all-docs run iff their index-common
      count over full sizes clears the threshold: with S shingles of which
      N survive the hot filter, the self-pair scores round(N/(2S-N),6)
      (n_common counts index rows only, sizes count all shingles). The
      `eligible_multi` filter applies that exact formula, so a
      boilerplate-heavy duplicated doc (N small, most shingles hot) is
      excluded here exactly when the pairwise run excludes it.
    - Components of the all-docs graph = components of the content graph
      blown up with exact-duplicate cliques; min doc id per component =
      propagated min rep id.
    """
    from platform_spark.llmdata.dedup import _shingle_table, md5_int

    doc_hashes = df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col).cast("binary")).alias("__ch"),
    )
    reps = doc_hashes.groupBy("__ch").agg(
        F.min("doc_id").alias("rep_id"), F.count("*").alias("n_copies")
    )
    rep_docs = df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text")
    ).join(reps.select(F.col("rep_id").alias("doc_id"), "n_copies"), "doc_id")

    sh = (
        _shingle_table(rep_docs, "__text", "doc_id", k)
        .select("doc_id", md5_int(F.col("shingle")).alias("sh"))
        .cache()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    # hot-shingle DF weighted by copy count == all-docs document frequency
    copies = rep_docs.select("doc_id", "n_copies")
    n_docs_df = df.select(F.count("*").alias("__n_docs"))
    hot = (
        sh.join(copies, "doc_id")
        .groupBy("sh")
        .agg(F.sum("n_copies").alias("df_"))
        .crossJoin(F.broadcast(n_docs_df))
        .filter(F.col("df_") > F.col("__n_docs") * stop_shingle_df)
        .select("sh")
    )
    idx = sh.join(F.broadcast(hot), "sh", "left_anti")
    a, b = idx.alias("a"), idx.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    rep_pairs = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
                6,
            )
            >= threshold
        )
        .select("doc_a", "doc_b")
    )
    # multi-copy contents self-cluster iff their copies would pair in the
    # all-docs run. The pairwise path counts common shingles over the
    # INDEX (hot shingles dropped) but takes sizes over the FULL shingle
    # set, so two copies with S shingles of which N survive the hot filter
    # score round(N/(2S-N),6) — NOT 1.0. Mirror that formula exactly: a
    # boilerplate-heavy duplicated doc (most shingles hot) must fail here
    # just as its copies fail the pairwise threshold.
    surv = idx.groupBy("doc_id").agg(F.count("*").alias("n_idx"))
    eligible_multi = (
        copies.filter(F.col("n_copies") >= 2)
        .join(surv, "doc_id")
        .join(sizes, "doc_id")
        .filter(
            F.round(
                F.col("n_idx").cast("double")
                / (F.lit(2) * F.col("n_sh") - F.col("n_idx")).cast("double"),
                6,
            )
            >= threshold
        )
        .select(F.col("doc_id").alias("rep_id"))
    )
    return _expand_rep_labels(
        doc_hashes, reps, rep_pairs, eligible_multi, max_iterations
    )


def embedding_clusters_fast(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_hyperplanes: int = 16,
    bands: int = 4,
    max_iterations: int = 25,
    dim: int | None = None,
) -> DataFrame:
    """Identical output to
    ``dedup_clusters(embedding_neardup_pairs(df, ...), "id_a", "id_b")``
    without materializing O(copies²) pairs.

    Simpler than the text twin: hyperplane-LSH bucket membership is a pure
    function of the vector with no corpus-frequency dependence, so no
    weighting is needed. Identical NONZERO vectors share every band bucket
    and verify at cosine 1.0, so multi-copy contents self-cluster; a
    zero-norm vector's self-cosine is undefined and the pairwise verify
    drops it, so the norm guard below keeps the outputs bit-identical.
    Column names doc_id/cluster_id/is_keeper match dedup_clusters (doc_id
    carries the vec id)."""
    from platform_spark.llmdata.dedup import embedding_neardup_pairs
    from platform_spark.llmdata.similarity import dot_expr

    doc_hashes = df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.to_json(F.struct(F.col(vec_col))).cast("binary")).alias("__ch"),
    )
    reps = doc_hashes.groupBy("__ch").agg(
        F.min("doc_id").alias("rep_id"), F.count("*").alias("n_copies")
    )
    rep_docs = df.select(
        F.col(id_col).alias("doc_id"), F.col(vec_col).alias("__v")
    ).join(reps.select(F.col("rep_id").alias("doc_id"), "n_copies"), "doc_id")

    if dim is None:
        # probe the RAW table (1-row parquet scan) — letting the pair
        # generator probe rep_docs would execute the whole collapse
        # pipeline just to learn the vector width
        dim = len(df.select(vec_col).first()[0])
    rep_pairs = embedding_neardup_pairs(
        rep_docs,
        vec_col="__v",
        id_col="doc_id",
        threshold=threshold,
        n_hyperplanes=n_hyperplanes,
        bands=bands,
        dim=dim,
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    eligible_multi = rep_docs.filter(
        (F.col("n_copies") >= 2) & (dot_expr("__v", "__v") > F.lit(0.0))
    ).select(F.col("doc_id").alias("rep_id"))
    return _expand_rep_labels(
        doc_hashes, reps, rep_pairs, eligible_multi, max_iterations
    )


def cluster_summary(clusters: DataFrame) -> DataFrame:
    """One row per cluster: size + keeper (min id)."""
    return clusters.groupBy("cluster_id").agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper")
    )
