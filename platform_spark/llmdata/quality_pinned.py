"""Pinned quality-classifier coefficients for the correctness gate.

Fitted ONCE on the driver's sf0.01 documents table with
``fit_quality_classifier(docs, deterministic=True)`` (L2 reg 0.1,
maxIter 100, single-partition fit input, 6-dp rounding). The gate's
Spark side re-fits at query time and must reproduce this vector
bit-exactly (the oracle carries it as literals), so the pyspark.ml
fit path is inside the hash check. Regenerate with
tools/fit_pinned_quality.py if the fixture ever changes.
"""

#: [intercept, w_punct_ratio, w_stopword_ratio, w_mean_word_len,
#:  w_log_tokens]
QUALITY_COEFS_SF001: list[float] = [4.065177, 0.0, 35.947236, -1.400096, -0.000879]
