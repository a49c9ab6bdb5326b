"""LFS claim-check resolution (S11).

The reference stores large payloads out-of-band: the record `_value` is a
JSON envelope pointing at an S3 blob (pkg/lfs/envelope.go:40-66), and the
iceberg-processor resolves envelopes with a bounded worker pool in modes
off / resolve / reference / skip / hybrid (iceberg-processor
internal/processor/lfs.go:31-37, 53-154).

Spark-first: envelope detection is a pure column predicate (codegen'd);
resolution is an Arrow-batched Pandas UDF whose fetcher is pluggable — a
local-directory fetcher stands in for S3 here (the S3 client isn't in this
container); swap `make_local_fetcher` for a boto3-backed one with the same
signature on a real cluster. Concurrency is Spark's task parallelism — the
reference's worker pool falls out of partitioning.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: envelope marker field (envelope.go:40-49)
LFS_FLAG_PATH = "$.kafscale_lfs"

MODES = ("off", "resolve", "reference", "skip", "hybrid")


def is_lfs_envelope(value_col: Column) -> Column:
    """True iff `_value` is an LFS claim-check envelope (null-safe: missing
    marker or invalid JSON → false, so `~is_lfs_envelope` keeps those rows)."""
    src = value_col.cast("string")
    return F.get_json_object(src, LFS_FLAG_PATH).eqNullSafe(F.lit("true"))


def make_local_fetcher(blob_root: str) -> Callable[[str, str], bytes | None]:
    """Blob fetcher reading `bucket/key` under a local directory (S3 stub)."""

    def fetch(bucket: str, key: str) -> bytes | None:
        path = os.path.join(blob_root, bucket, key)
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            return f.read()

    return fetch


def resolve_lfs(
    df: DataFrame,
    mode: str = "resolve",
    fetcher: Callable[[str, str], bytes | None] | None = None,
    value_col: str = "_value",
) -> DataFrame:
    """Resolve LFS envelopes in `value_col` per the reference's modes:

    - off:       pass through untouched
    - resolve:   replace envelope values with the fetched blob content
    - reference: keep the envelope, add `_lfs_ref` (bucket/key/size) columns
    - skip:      drop envelope rows entirely
    - hybrid:    resolve when the blob is available, else keep the envelope
    """
    if mode not in MODES:
        raise ValueError(f"unknown LFS mode {mode!r}")
    if mode == "off":
        return df
    src = F.col(value_col).cast("string")
    env = is_lfs_envelope(F.col(value_col))
    if mode == "skip":
        return df.filter(~env)
    if mode == "reference":
        return (
            df.withColumn("_lfs_bucket", F.when(env, F.get_json_object(src, "$.bucket")))
            .withColumn("_lfs_key", F.when(env, F.get_json_object(src, "$.key")))
            .withColumn(
                "_lfs_size",
                F.when(env, F.get_json_object(src, "$.size").cast("bigint")),
            )
        )

    if fetcher is None:
        raise ValueError("resolve/hybrid modes need a fetcher")

    @pandas_udf("string")
    def fetch_udf(values: pd.Series) -> pd.Series:
        out = []
        for v in values:
            if v is None:
                out.append(None)
                continue
            try:
                doc = json.loads(v)
            except (json.JSONDecodeError, TypeError):
                out.append(v)
                continue
            if not isinstance(doc, dict) or doc.get("kafscale_lfs") is not True:
                out.append(v)
                continue
            blob = fetcher(doc.get("bucket", ""), doc.get("key", ""))
            if blob is None:
                out.append(None)  # 'resolve' fails closed; hybrid handles below
            else:
                out.append(blob.decode("utf-8", errors="replace"))
        return pd.Series(out)

    resolved = fetch_udf(src)
    if mode == "hybrid":
        new_value = F.when(env, F.coalesce(resolved, src)).otherwise(F.col(value_col))
    else:
        new_value = F.when(env, resolved).otherwise(F.col(value_col))
    return df.withColumn(value_col, new_value)
