"""Regenerate platform_spark/llmdata/quality_pinned.py from sf0.01.

The pinned vector is the deterministic L2-regularized logistic-regression
fit whose gate oracle carries it as literals (llm_quality_classifier) —
rerun only if the driver's documents fixture changes.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from platform_spark.llmdata.quality_model import fit_quality_classifier
from platform_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_PIN_SF", "/root/testdata/sf0.01")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "platform_spark", "llmdata", "quality_pinned.py",
)

spark = get_spark("fit-pinned-quality", master="local[8]", shuffle_partitions=8)
docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
coefs = fit_quality_classifier(docs, deterministic=True)

with open(OUT, "w") as f:
    f.write(
        '"""Pinned quality-classifier coefficients for the correctness gate.\n'
        "\n"
        "Fitted ONCE on the driver's sf0.01 documents table with\n"
        "``fit_quality_classifier(docs, deterministic=True)`` (L2 reg 0.1,\n"
        "maxIter 100, single-partition fit input, 6-dp rounding). The gate's\n"
        "Spark side re-fits at query time and must reproduce this vector\n"
        "bit-exactly (the oracle carries it as literals), so the pyspark.ml\n"
        "fit path is inside the hash check. Regenerate with\n"
        'tools/fit_pinned_quality.py if the fixture ever changes.\n"""\n\n'
        "#: [intercept, w_punct_ratio, w_stopword_ratio, w_mean_word_len,\n"
        "#:  w_log_tokens]\n"
        f"QUALITY_COEFS_SF001: list[float] = {coefs!r}\n"
    )
print("pinned:", coefs)
