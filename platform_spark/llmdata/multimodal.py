"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Spark-side plumbing is real (schemas, partition-friendly layouts, Arrow
batch shapes, deterministic feature extraction); the actual codec work is
stubbed — PIL/ffmpeg are not in this container — behind `decoder=` hooks
with a deterministic fake for tests. Swap the fake for a real decoder on a
cluster; every signature and batch shape stays the same.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical multimodal column family: the payload plus typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)


def fake_decode(content: bytes) -> dict:
    """Deterministic stand-in for a real image decode: derives pseudo pixel
    stats from the content hash. Replace with PIL/torchvision on a real
    cluster — the UDF plumbing does not change."""
    h = hashlib.sha256(content or b"").digest()
    w = 16 + h[0] % 64
    ht = 16 + h[1] % 64
    mean = sum(h) / len(h) / 255.0
    return {"width": w, "height": ht, "mean_intensity": round(mean, 6)}


def real_decode(content: bytes) -> dict:
    """Real decoder entry point — intentionally unimplemented here."""
    raise NotImplementedError(
        "image/audio decoding libraries are not available in this environment; "
        "pass decoder=fake_decode (tests) or a PIL/ffmpeg-backed callable"
    )


DECODE_SCHEMA = (
    "media_id bigint, width int, height int, mean_intensity double"
)


def decode_media(
    df: DataFrame,
    decoder: Callable[[bytes], dict] = real_decode,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Decode/inspect media payloads via Arrow-batched mapInPandas (the
    shape a real pipeline needs: bytes in, typed columns out, executed
    batch-wise on executors)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                d = decoder(bytes(content) if content is not None else b"")
                rows.append(
                    (
                        int(mid),
                        d.get("width"),
                        d.get("height"),
                        d.get("mean_intensity"),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "mean_intensity"]
            )

    return df.select(id_col, content_col).mapInPandas(run, DECODE_SCHEMA)


def content_features(
    df: DataFrame, content_col: str = "content", dim: int = 16
) -> DataFrame:
    """Deterministic binary-content feature vector (hash-projection sketch):
    a stand-in embedding that exercises the real downstream plumbing
    (ANN joins, dedup) without codec dependencies. Pure built-ins."""
    h = F.sha2(F.col(content_col), 256)
    feats = F.array(
        *[
            (
                F.conv(F.substring(h, 1 + 4 * i, 4), 16, 10).cast("double")
                / F.lit(65535.0)
            )
            for i in range(dim)
        ]
    )
    return df.withColumn("features", feats)


def frame_sample_plan(
    df: DataFrame,
    every_ms: int = 1000,
    duration_col: str = "duration_ms",
    id_col: str = "media_id",
) -> DataFrame:
    """Frame-sampling plan for video rows: one row per (media_id, frame_ts)
    at a fixed cadence — the explode the decode stage consumes. Built-ins
    only; the actual frame extraction belongs in decode_media's decoder."""
    n = (F.col(duration_col) / every_ms).cast("int")
    return df.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0))),
                lambda i: (i * every_ms).cast("bigint"),
            )
        ).alias("frame_ts_ms"),
    )


def fake_resize(content: bytes, width: int, height: int) -> dict:
    """Deterministic stand-in for a real resize: derives a pseudo payload
    (content hash + target dims) so tests can assert batch shape and
    determinism. Swap for PIL `Image.resize` on a real cluster."""
    h = hashlib.sha256(
        (content or b"") + struct.pack(">II", width, height)
    ).digest()
    return {"content": h, "width": width, "height": height}


def real_resize(content: bytes, width: int, height: int) -> dict:
    """Real resize entry point — intentionally unimplemented here."""
    raise NotImplementedError(
        "image libraries are not available in this environment; pass "
        "resizer=fake_resize (tests) or a PIL-backed callable"
    )


RESIZE_SCHEMA = "media_id bigint, content binary, width int, height int"


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], dict] = real_resize,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Resize media payloads via Arrow-batched mapInPandas — same
    executor-side batch shape as decode_media: bytes in, (bytes, dims)
    out, no driver round-trip, scan-parallel at any corpus size."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                d = resizer(
                    bytes(content) if content is not None else b"", width, height
                )
                rows.append(
                    (int(mid), d["content"], d["width"], d["height"])
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "content", "width", "height"]
            )

    return df.select(id_col, content_col).mapInPandas(run, RESIZE_SCHEMA)
