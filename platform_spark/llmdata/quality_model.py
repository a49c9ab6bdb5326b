"""Model-based document quality classification (the fastText-classifier
stage of GPT-3/LLaMA-style pipelines, bootstrapped from heuristic labels).

Real pipelines train a lightweight classifier on weak labels ("pages that
look like references" vs "random crawl") and keep documents the model
scores high. The deterministic replica here distills the closed-form
heuristic `text.quality_score` into a logistic-regression model over four
closed-form features — the TRAINING step (pyspark.ml, L2-regularized so
the optimum is unique) runs inside the correctness gate and must
reproduce a pinned coefficient vector, and the SCORING step is a pure
column expression (sigmoid of a dot product) that broadcasts nothing and
shuffles nothing.

Scale shape: training fits on a sample/sketch (single-partition
deterministic mode for the gate); scoring is embarrassingly parallel —
one map over the corpus, whole-stage codegen, filter-pushdown friendly.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from platform_spark.llmdata import text as _tx

#: feature order is part of the model contract (coefs[0] is the intercept)
FEATURE_COLS = ("punct_ratio", "stopword_ratio", "mean_word_len", "log_tokens")


def quality_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, punct_ratio, stopword_ratio, mean_word_len, log_tokens,
    label) — all 6-dp-rounded closed-form features; label is the heuristic
    quality gate (quality_score >= 0.7 — near the fixture median, so both
    classes are populated), the weak supervision signal."""
    analyzed = _tx.analyze(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    )
    return analyzed.select(
        "doc_id",
        "punct_ratio",
        "stopword_ratio",
        "mean_word_len",
        F.round(F.log(F.lit(1.0) + F.col("n_tokens")), 6).alias("log_tokens"),
        (F.col("quality") >= 0.7).alias("label"),
    )


def fit_quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_iter: int = 100,
    reg_param: float = 0.1,
    deterministic: bool = False,
    features: DataFrame | None = None,
) -> list[float]:
    """[intercept, w_punct, w_stop, w_mwl, w_logtok], 6-dp rounded.

    L2 regularization makes the optimum unique (the heuristic label is a
    function of the features, so an unregularized fit would diverge along
    the separating direction); ``deterministic=True`` coalesces the fit
    input to one partition so the LBFGS reduction order — and hence the
    coefficient vector — is bit-stable across sessions, same convention
    as `fit_kmeans_centroids`. Fit on a sample at 100 TB.

    ``features`` accepts a precomputed `quality_features` frame (same
    rows, same partition order) so a caller that also classifies can run
    the text-analysis pass once — and, when the frame is materialized
    (localCheckpoint), the deterministic coalesce(1) merely concatenates
    its partitions instead of serially recomputing the whole feature
    pipeline inside one task. Partition-index concatenation order is
    unchanged, so the fitted vector is identical."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    feats = (
        features
        if features is not None
        else quality_features(df, text_col, id_col)
    )
    data = feats.select(
        array_to_vector(
            F.array(*[F.col(c) for c in FEATURE_COLS])
        ).alias("features"),
        F.col("label").cast("double").alias("label"),
    )
    if deterministic:
        data = data.coalesce(1)
    model = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=True
    ).fit(data)
    return [round(float(model.intercept), 6)] + [
        round(float(w), 6) for w in model.coefficients
    ]


def quality_prob_expr(coefs: list[float]) -> Column:
    """Sigmoid of the linear score over the FEATURE_COLS columns — a pure
    expression (mirrorable verbatim in SQL), rounded to 6 dp."""
    z = F.lit(float(coefs[0]))
    for w, c in zip(coefs[1:], FEATURE_COLS):
        z = z + F.lit(float(w)) * F.col(c)
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)


def classify_quality(
    df: DataFrame,
    coefs: list[float],
    text_col: str = "text",
    id_col: str = "doc_id",
    features: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, quality_prob, is_quality) for every document — one
    shuffle-free map over the corpus. ``features`` accepts a precomputed
    `quality_features` frame (see `fit_quality_classifier`)."""
    feats = (
        features
        if features is not None
        else quality_features(df, text_col, id_col)
    )
    prob = quality_prob_expr(coefs)
    return feats.select(
        "doc_id",
        prob.alias("quality_prob"),
        (prob >= 0.5).alias("is_quality"),
    )


def sigmoid(z: float) -> float:
    return 1.0 / (1.0 + math.exp(-z))
