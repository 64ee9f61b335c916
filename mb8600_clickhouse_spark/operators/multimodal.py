"""Multimodal (image/audio/video) column plumbing.

Payloads are opaque ``binary`` columns with a typed metadata struct —
the Parquet-native representation (binary leaves stay columnar,
metadata prunes independently of payload bytes). Feature extraction and
decoding run as Arrow-batched ``mapInPandas`` operators so payload bytes
cross the JVM<->Python boundary once per batch, never per row.

The decode step itself is STUBBED (no image/audio libraries in this
container): ``decode_image_features`` produces a deterministic fake
feature vector derived from the payload bytes, and raises
``NotImplementedError`` when ``strict=True``. The Spark-side plumbing —
schema, partitioning, UDF signature, Arrow batch shape — is real and
tested (tests/test_multimodal.py).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType(), False), False),
    ]
)


def with_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Attach a binary payload column + metadata struct (here synthesized
    from text bytes; in production this is the raw image/audio bytes)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("media_meta"),
        F.sha2(payload, 256).alias("payload_sha256"),
    )


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: derive ``dim`` floats
    from the payload digest. Replace with PIL/torchvision/ffmpeg decode
    on a cluster that has them installed."""
    digest = hashlib.sha256(payload).digest()
    return [digest[i] / 255.0 for i in range(dim)]


def decode_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    dim: int = 8,
    strict: bool = False,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas (one Python worker per partition, batch-at-a-time).

    strict=True raises NotImplementedError — the marker that a real
    decoder backend is required; strict=False runs the deterministic
    fake so the distributed plumbing is exercisable in tests."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "image/audio decode backend not available in this container; "
                "plug a real decoder (PIL/ffmpeg) into decode_image_features"
            )
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                    "features": pdf[payload_col].map(lambda p: _fake_decode(bytes(p), dim)),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(extract, FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    strict: bool = False,
) -> DataFrame:
    """Arrow-batched image resize over binary payloads (mapInPandas).

    The pixel transform is STUBBED (no imaging libraries in this
    container): strict=True raises NotImplementedError; strict=False
    passes payload bytes through and stamps the target dimensions, so
    the distributed plumbing — schema, batch shape, partition-parallel
    execution — is real and testable. Swap the body for PIL/libvips on
    a cluster that has them."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "image resize backend not available; plug PIL/libvips into resize_images"
            )
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": width,
                    "height": height,
                    "payload": pdf[payload_col],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_sha256", T.StringType(), False),
    ]
)


def sample_frames(
    df: DataFrame,
    every_nth: int = 10,
    max_frames: int = 8,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    strict: bool = False,
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (mapInPandas fan-out — batches may EMIT MORE ROWS than they receive,
    the shape a real decoder needs).

    The decode is STUBBED: strict=True raises; strict=False derives
    deterministic per-frame digests from (payload, frame index) so
    row-count and fan-out semantics are exercisable without ffmpeg."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "video decode backend not available; plug ffmpeg into sample_frames"
            )
        for pdf in batches:
            ids, idxs, digests = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                n = min(max_frames, max(1, len(payload) // max(every_nth, 1)))
                for i in range(n):
                    ids.append(doc_id)
                    idxs.append(i * every_nth)
                    digests.append(
                        hashlib.sha256(bytes(payload) + i.to_bytes(4, "big")).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_sha256": digests}
            )

    return df.select(id_col, payload_col).mapInPandas(run, FRAMES_SCHEMA)
