"""Corpus snapshot management: diff two immutable snapshot versions.

Training corpora are rebuilt periodically (new crawl in, takedowns out,
cleaning rules change); the diff between version N and N+1 is what
downstream consumers actually need — what to re-embed, what to retrain
on, what was removed for compliance. One full-outer join on the id plus
a 16-byte content-hash compare classifies every doc:

- ``added``   — id only in the new snapshot
- ``removed`` — id only in the old snapshot
- ``changed`` — id in both, content hash differs

Unchanged docs are dropped from the report (at 100 TB they're ~all of
it — the report stays delta-sized). The join shuffles both sides on the
id once; hashes are computed map-side so full text never rides the
exchange when the caller projects ``(id, text)`` only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(doc_id, change 'added'|'removed'|'changed')`` between two
    snapshot versions. NULL text hashes as NULL and compares with
    null-safe equality, so a NULL→NULL doc is unchanged while a
    NULL→text doc is changed."""
    o = old.select(
        F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("__oh")
    ).withColumn("__o", F.lit(1))
    n = new.select(
        F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("__nh")
    ).withColumn("__n", F.lit(1))
    j = o.join(n, "doc_id", "full_outer")
    change = (
        F.when(F.col("__o").isNull(), F.lit("added"))
        .when(F.col("__n").isNull(), F.lit("removed"))
        .when(~F.col("__oh").eqNullSafe(F.col("__nh")), F.lit("changed"))
    )
    return (
        j.select("doc_id", change.alias("change"))
        .filter(F.col("change").isNotNull())
    )
