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
