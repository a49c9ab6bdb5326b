"""LFS claim-check resolution (S11).

The reference stores large payloads out-of-band: the record `_value` is a
JSON envelope pointing at an S3 blob (pkg/lfs/envelope.go:25-37), and the
iceberg-processor resolves envelopes with a bounded worker pool in modes
off / resolve / reference / skip / hybrid (iceberg-processor
internal/processor/lfs.go:31-37, 53-154).

Envelope format (envelope.go:25-58 Envelope/DecodeEnvelope): marker field
``"kfs_lfs"`` is an INT version that must be non-zero, and ``bucket``,
``key``, ``sha256`` are required; ``size``/``checksum``/``content_type``/
``original_headers`` are optional. Detection (IsLfsEnvelope,
envelope.go:61-74) sniffs the marker; full validation happens at decode.

Spark-first: envelope detection is a pure column predicate (codegen'd);
resolution is an Arrow-batched Pandas UDF whose fetcher is pluggable — a
local-directory fetcher stands in for S3 here (the S3 client isn't in this
container); swap `make_local_fetcher` for a boto3-backed one with the same
signature on a real cluster. Concurrency is Spark's task parallelism — the
reference's worker pool falls out of partitioning. SHA-256 verification
mirrors resolver.go:71-81 (ValidateChecksum): a mismatched blob is treated
as unresolvable rather than silently substituted.
"""

from __future__ import annotations

import hashlib
import json
import os
from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: envelope marker field (envelope.go:27 `json:"kfs_lfs"` — int version)
LFS_MARKER = "kfs_lfs"

MODES = ("off", "resolve", "reference", "skip", "hybrid")


def is_lfs_envelope(value_col: Column) -> Column:
    """True iff `_value` is a valid LFS claim-check envelope: non-zero int
    ``kfs_lfs`` version AND required bucket/key/sha256 present
    (DecodeEnvelope, envelope.go:50-58). Null-safe: missing marker or
    invalid JSON → false, so `~is_lfs_envelope` keeps those rows."""
    src = value_col.cast("string")
    # the version must be an UNQUOTED JSON integer (Go's json.Unmarshal
    # into int rejects "1"; get_json_object would coerce it) — extract the
    # raw token with a regexp so string-typed versions do not detect
    version = F.regexp_extract(
        src, f'"{LFS_MARKER}"\\s*:\\s*(-?\\d+)\\s*[,}}]', 1
    ).cast("int")
    required = [
        F.get_json_object(src, "$.bucket"),
        F.get_json_object(src, "$.key"),
        F.get_json_object(src, "$.sha256"),
    ]
    ok = version.isNotNull() & (version != 0)
    for r in required:
        ok = ok & r.isNotNull() & (r != "")
    # eqNullSafe-style: any NULL leg collapses to false, never NULL
    return F.coalesce(ok, F.lit(False))


def _decode_envelope(v: str) -> dict | None:
    """Python twin of DecodeEnvelope (envelope.go:50-58): parse + validate
    required fields; None when not a valid envelope."""
    try:
        doc = json.loads(v)
    except (json.JSONDecodeError, TypeError):
        return None
    if not isinstance(doc, dict):
        return None
    ver = doc.get(LFS_MARKER)
    if not isinstance(ver, int) or isinstance(ver, bool) or ver == 0:
        return None
    if not doc.get("bucket") or not doc.get("key") or not doc.get("sha256"):
        return None
    return doc


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
    verify_sha256: bool = True,
) -> DataFrame:
    """Resolve LFS envelopes in `value_col` per the reference's modes:

    - off:       pass through untouched
    - resolve:   replace envelope values with the fetched blob content
    - reference: keep the envelope, add `_lfs_*` pointer columns
    - skip:      drop envelope rows entirely
    - hybrid:    resolve when the blob is available, else keep the envelope

    With ``verify_sha256`` (resolver.go ValidateChecksum) a fetched blob
    whose SHA-256 differs from the envelope's is treated as unresolvable.
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
            .withColumn("_lfs_sha256", F.when(env, F.get_json_object(src, "$.sha256")))
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
            doc = _decode_envelope(v)
            if doc is None:
                out.append(v)
                continue
            blob = fetcher(doc["bucket"], doc["key"])
            if blob is not None and verify_sha256:
                if hashlib.sha256(blob).hexdigest() != doc["sha256"]:
                    blob = None  # checksum mismatch → unresolvable
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


# -- envelope creation (the claim-check WRITE side) -------------------------


def make_local_store(blob_root: str) -> Callable[[str, str, bytes], None]:
    """Blob store writing `bucket/key` under a local directory — the
    inverse of `make_local_fetcher` (swap for an S3 put with the same
    signature on a real cluster). Writes are atomic (tmp + rename) so a
    concurrent fetcher never sees a torn blob."""

    def store(bucket: str, key: str, data: bytes) -> None:
        import uuid

        d = os.path.join(blob_root, bucket)
        os.makedirs(d, exist_ok=True)
        # uuid, not pid: local-mode executor tasks are THREADS in one
        # process — a pid-keyed tmp would be shared by concurrent writers
        # of the same content-addressed key and could publish a torn blob
        tmp = os.path.join(d, f".{key}.tmp-{uuid.uuid4().hex}")
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, os.path.join(d, key))

    return store


def make_envelope(
    df: DataFrame,
    store: Callable[[str, str, bytes], None],
    bucket: str,
    threshold_bytes: int = 1024 * 1024,
    value_col: str = "_value",
) -> DataFrame:
    """Swap oversized `value_col` payloads for LFS claim-check envelopes —
    the producer side of the contract `resolve_lfs` reads back
    (lfs-client-sdk envelope.py:8-36 LfsEnvelope/decode_envelope; the
    reference's proxy writes the blob and returns this same envelope shape,
    pkg/lfs/producer.go Produce).

    Payloads strictly larger than `threshold_bytes` are written to
    `bucket/<sha256-of-content>` via `store` and replaced with a JSON
    envelope (`kfs_lfs`: 1, bucket, key, size, sha256). Content-addressed
    keys make the write idempotent (retries and duplicate payloads land on
    the same blob) and make `verify_sha256` on the read side tautological.
    Values at or under the threshold — and rows that already ARE envelopes
    — pass through untouched.

    Runs as an Arrow-batched pandas UDF: the blob write happens inside the
    executor task (the reference's bounded worker pool falls out of Spark's
    task parallelism, same stance as resolve_lfs).
    """
    if threshold_bytes < 1:
        raise ValueError("threshold_bytes must be positive")
    src = F.col(value_col).cast("string")

    @pandas_udf("string")
    def envelope_udf(values: pd.Series) -> pd.Series:
        out = []
        for v in values:
            if v is None:
                out.append(None)
                continue
            data = v.encode("utf-8")
            if len(data) <= threshold_bytes or _decode_envelope(v) is not None:
                out.append(v)
                continue
            sha = hashlib.sha256(data).hexdigest()
            store(bucket, sha, data)
            out.append(
                json.dumps(
                    {
                        LFS_MARKER: 1,
                        "bucket": bucket,
                        "key": sha,
                        "size": len(data),
                        "sha256": sha,
                    }
                )
            )
        return pd.Series(out)

    return df.withColumn(value_col, envelope_udf(src))
