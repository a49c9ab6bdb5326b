"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale design notes (100 TB posture):
- exact dedup is one hash-aggregate — a single shuffle on a 16-byte key.
- ngram-Jaccard uses the inverted-index (prefix-filter-free) set-similarity
  join: shingle → explode → self-join on shingle → count common → filter by
  threshold. Shuffle volume is O(total shingles); skew is bounded by
  dropping ultra-frequent shingles (stop_shingle_df), the standard trick.
- MinHash+LSH: signatures via portable md5-derived 64-bit integer hashing
  (reproducible across engines and languages), banded into buckets; only
  bucket-colliding pairs are candidates, then exact-verified. Everything is
  joins + aggregates — no driver-side state.
- SimHash: 64-bit fingerprint via per-bit majority of token hashes,
  computed with array built-ins (explode-free bit fold).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from platform_spark.llmdata.text import fingerprint, tokens

# -- portable 60-bit hash: md5 hex prefix as integer ------------------------
# (identical in DuckDB: CAST(('0x' || substr(md5(s),1,15)) AS BIGINT))


def md5_int(col: Column, seed: str = "", hex_digits: int = 15) -> Column:
    s = F.concat(F.lit(seed), col) if seed else col
    return F.conv(
        F.substring(F.md5(s.cast("binary")), 1, hex_digits), 16, 10
    ).cast("bigint")


# -- exact ------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on raw text md5: one row per distinct content with the
    minimum id as keeper and the duplicate count."""
    return (
        df.select(F.md5(F.col(text_col).cast("binary")).alias("content_hash"), id_col)
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keeper"), F.count("*").alias("n_copies"))
    )


def normalized_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-after-normalization dedup (fingerprint from text.py)."""
    return (
        df.select(fingerprint(F.col(text_col)).alias("fingerprint"), id_col)
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keeper"), F.count("*").alias("n_copies"))
    )


# -- shingling --------------------------------------------------------------


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """Distinct k-word shingles from an already-materialized token array.

    IMPORTANT: `toks` must reference a concrete column, not an expression —
    embedding an expression here duplicates its tree into every element_at
    call (k per position), turning shingling O(tokens²). See _shingle_table.
    """
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(-1)))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(k)])
    )
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.array_distinct(sh)
    )


def _shingle_table(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    """(doc_id, shingle) exploded table; tokenizes once per row."""
    toked = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.lower(F.col(text_col))).alias("toks"),
    )
    return toked.select(
        "doc_id",
        F.explode(shingles_from_tokens(F.col("toks"), k)).alias("shingle"),
    )


# -- n-gram Jaccard set-similarity join ------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.2,
    stop_shingle_df: float = 0.2,
) -> DataFrame:
    """All pairs (a < b) with k-shingle Jaccard ≥ threshold.

    Inverted-index join: pairs sharing ≥1 shingle are candidates; common
    counts come from the index join, sizes from a per-doc aggregate.
    Shingles appearing in > stop_shingle_df of docs are dropped from the
    *index only* (they generate quadratic candidates but barely move
    Jaccard); sizes keep them, so Jaccard is exact for surviving pairs.
    """
    # join on a 60-bit hash of the shingle: integer shuffle keys are far
    # cheaper than strings at scale; collision odds at 2^60 are negligible
    # (~1e-8 even at 10^5 distinct shingles — and a collision only perturbs
    # one candidate pair's count)
    sh = (
        _shingle_table(df, text_col, id_col, k)
        .select("doc_id", md5_int(F.col("shingle")).alias("sh"))
        .cache()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    # doc count computed IN-PLAN (1-row aggregate broadcast into the filter)
    # — no driver-side action, no extra full pass over the input at scale
    n_docs_df = df.select(F.count("*").alias("__n_docs"))
    hot = (
        sh.groupBy("sh")
        .agg(F.count("*").alias("df_"))
        .crossJoin(F.broadcast(n_docs_df))
        .filter(F.col("df_") > F.col("__n_docs") * stop_shingle_df)
        .select("sh")
    )
    idx = sh.join(F.broadcast(hot), "sh", "left_anti")
    a = idx.alias("a")
    b = idx.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    out = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "n_a", "n_b", "jaccard")
    )
    return out


# -- MinHash + LSH ----------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_perm: int = 32,
) -> DataFrame:
    """num_perm-wide MinHash signature per doc over k-shingles.

    Permutation family à la Kirsch-Mitzenmacher: TWO seeded base hashes per
    shingle (portable md5 — bit-identical in any engine/language, e.g. the
    DuckDB oracle), and permutation j = `min(h1 + j*h2)`. Two hashes per
    shingle instead of num_perm keeps the map-side cost flat in num_perm.
    Values stay < 2^48 + 31·2^48 < 2^53 — exactly representable everywhere.
    One explode + one groupBy — no per-row Python. A production cluster
    would swap md5 for xxhash64 (same structure, cheaper hash).
    """
    sh = _shingle_table(df, text_col, id_col, k)
    hashed = sh.select(
        "doc_id",
        md5_int(F.col("shingle"), seed="h1:", hex_digits=12).alias("h1"),
        md5_int(F.col("shingle"), seed="h2:", hex_digits=12).alias("h2"),
    )
    aggs = [
        F.min(F.col("h1") + F.lit(j) * F.col("h2")).alias(f"mh_{j}")
        for j in range(num_perm)
    ]
    return hashed.groupBy(F.col("doc_id")).agg(*aggs)


def minhash_lsh_candidates(
    sig: DataFrame, num_perm: int = 32, bands: int = 8
) -> DataFrame:
    """LSH banding: hash each band of the signature; docs sharing any band
    bucket become candidate pairs (distinct)."""
    rows_per_band = num_perm // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("_", *cols).cast("binary")).alias("bucket"))
        )
    buckets = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", "bb.band", "bb.bucket")
    x = buckets.alias("x")
    y = buckets.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH candidate generation + exact Jaccard verification.

    The verify step is restricted to the LSH candidate pairs BEFORE any
    pairwise work: the shingle index is joined through the candidate list
    (cand × sh_a on doc_a, then sh_b on (doc_b, shingle)), so common-shingle
    counting costs O(|candidates| × avg_shingles) — never the all-shared-
    shingle-pairs blowup of a full inverted-index join. This is what makes
    LSH actually cheaper than the exact join at scale."""
    sig = minhash_signatures(df, text_col, id_col, k, num_perm)
    cand = minhash_lsh_candidates(sig, num_perm, bands)
    sh = _shingle_table(df, text_col, id_col, k).select(
        "doc_id", md5_int(F.col("shingle")).alias("sh")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sh_b = sh.select(F.col("doc_id").alias("__b_doc"), F.col("sh").alias("sh_b"))
    common = (
        cand.join(sh_a, "doc_a")
        .join(
            sh_b,
            (F.col("doc_b") == F.col("__b_doc")) & (F.col("sh_a") == F.col("sh_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# -- SimHash ----------------------------------------------------------------


def simhash_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 60
) -> DataFrame:
    """(doc_id, sh) SimHash fingerprints: per-bit majority vote of token
    hashes, as an array fold over distinct tokens — pure built-ins, no UDF.

    Layered selects keep the token-hash array a concrete column so the 60
    per-bit folds reuse it instead of re-hashing (expression-tree
    duplication would cost 60× otherwise). 60-bit portable hash → bits ≤ 60.
    """
    bits = min(bits, 60)
    toked = df.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(tokens(F.lower(F.col(text_col)))).alias("toks"),
    )
    hashed = toked.select(
        "doc_id", F.transform(F.col("toks"), lambda t: md5_int(t)).alias("hs")
    )

    def bit_sum(b: int) -> Column:
        return F.aggregate(
            F.col("hs"),
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1),
        )

    out = F.lit(0).cast("bigint")
    for b in range(bits):
        out = out + F.when(bit_sum(b) > 0, F.lit(1 << b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return hashed.select("doc_id", out.alias("sh"))


def simhash(col: Column, bits: int = 64) -> Column:
    """Single-column SimHash (convenience; prefer simhash_table for bulk —
    this form re-evaluates the token-hash array once per bit)."""
    bits = min(bits, 60)
    toks = F.array_distinct(tokens(F.lower(col)))
    hashes = F.transform(toks, lambda t: md5_int(t))

    def bit_sum(b: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1),
        )

    out = F.lit(0).cast("bigint")
    for b in range(bits):
        out = out + F.when(bit_sum(b) > 0, F.lit(1 << b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return out


def simhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming, using
    banded equality (pigeonhole: ≤ k differing bits ⇒ some band of k+1
    bands is identical) to avoid the quadratic scan."""
    bits = 60
    per = bits // bands
    sh = simhash_table(df, text_col, id_col)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col("sh"), b * per)
            .bitwiseAND(F.lit((1 << per) - 1))
            .alias("chunk"),
        )
        for b in range(bands)
    ]
    bb = sh.select("doc_id", "sh", F.explode(F.array(*band_cols)).alias("b")).select(
        "doc_id", "sh", "b.band", "b.chunk"
    )
    x, y = bb.alias("x"), bb.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.sh").alias("sh_a"),
            F.col("y.sh").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", ham).filter(
        F.col("hamming") <= max_hamming
    ).select("doc_a", "doc_b", "hamming")


# -- embedding near-dup -----------------------------------------------------


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_hyperplanes: int = 16,
    bands: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Near-duplicate vectors by cosine ≥ threshold.

    Scale path: random-hyperplane LSH (sign sketch) BANDED like MinHash-LSH:
    the n_hyperplanes sign bits split into `bands` bands; vectors sharing ANY
    band bucket become candidates, then exact cosine verifies. A single
    all-bits bucket would need agreement on every bit (recall
    (1-θ/π)^n ≈ 28% at cosine 0.95 with 12 bits); OR-ed 4-bit bands give
    1-(1-p^4)^4 ≈ 98.5% at cosine 0.95 (p = 1-θ/π ≈ 0.90). Hyperplanes are
    deterministic (hash-seeded), so results are reproducible.

    Sizing at scale: expected bucket occupancy is n / 2^(bits/bands) per
    band, so grow `n_hyperplanes` ~ bands * log2(n) as the corpus grows to
    hold occupancy (and candidate-pair count) roughly constant — the sf1
    rehearsal (COVERAGE.md) shows cost is linear in candidate pairs.
    """
    from platform_spark.llmdata.similarity import cosine_expr, dot_expr

    if dim is None:  # 1-row probe; pass dim explicitly to save the job
        dim = len(df.select(vec_col).first()[0])
    import hashlib
    import struct

    def plane(p: int) -> list[float]:
        vals = []
        for i in range(dim):
            h = hashlib.md5(f"plane-{p}-{i}".encode()).digest()
            (u,) = struct.unpack(">Q", h[:8])
            vals.append((u / float(1 << 64)) * 2.0 - 1.0)
        return vals

    per = max(1, n_hyperplanes // bands)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # single nested-array Literal (one plan node, not n_hyperplanes*dim
    # CreateArray nodes — keeps codegen compile flat as the matrix grows);
    # sketch = Σ (dot_p >= 0) << p folded over the matrix
    plane_matrix = F.lit([plane(p) for p in range(n_hyperplanes)])
    staged = df.select(F.col(id_col).alias("vid"), v.alias("v"))
    dots = F.transform(plane_matrix, lambda w: dot_expr(F.col("v"), w))
    sketch = F.aggregate(
        F.zip_with(
            dots,
            F.sequence(F.lit(0), F.lit(n_hyperplanes - 1)),
            lambda d, i: F.when(
                d >= 0, F.pow(F.lit(2.0), i.cast("double")).cast("bigint")
            ).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    base = staged.select("vid", "v", sketch.alias("sk"))
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col("sk"), b * per)
            .bitwiseAND(F.lit((1 << per) - 1))
            .alias("chunk"),
        )
        for b in range(bands)
    ]
    # candidate generation works on (id, band, chunk) ONLY — deduping
    # (id_a, id_b) before vectors are touched keeps the shuffle narrow;
    # vectors re-join by id afterwards (two hash joins on the id key)
    bb = base.select("vid", F.explode(F.array(*band_cols)).alias("b")).select(
        "vid", "b.band", "b.chunk"
    )
    x, y = bb.alias("x"), bb.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.vid") < F.col("y.vid")),
        )
        .select(F.col("x.vid").alias("id_a"), F.col("y.vid").alias("id_b"))
        .distinct()
    )
    va = base.select(F.col("vid").alias("id_a"), F.col("v").alias("v_a"))
    vb = base.select(F.col("vid").alias("id_b"), F.col("v").alias("v_b"))
    cand = cand.join(va, "id_a").join(vb, "id_b")
    cos = cosine_expr(F.col("v_a"), F.col("v_b"))
    return cand.select(
        "id_a", "id_b", F.round(cos, 6).alias("cosine")
    ).filter(F.col("cosine") >= threshold)
