"""Baseline JPEG codec (operators/jpeg.py): round-trips, the
solid-color exactness property q78's analytic oracle rests on,
envelope rejections, and the strict Spark decode path."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from mb8600_clickhouse_spark.operators import multimodal as mm
from mb8600_clickhouse_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _gradient(h: int, w: int) -> np.ndarray:
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = (np.arange(w, dtype=np.int64)[None, :] * 9 % 256).astype(np.uint8)
    img[:, :, 1] = (np.arange(h, dtype=np.int64)[:, None] * 17 % 256).astype(np.uint8)
    img[:, :, 2] = 77
    return img


class TestRoundTrip:
    @given(
        r=st.integers(0, 255), g=st.integers(0, 255), b=st.integers(0, 255),
        h=st.integers(1, 20), w=st.integers(1, 20),
    )
    @settings(max_examples=30, deadline=None)
    def test_solid_color_is_exact(self, r, g, b, h, w):
        """The property q78's analytic oracle depends on: ANY solid
        color at ANY size round-trips bit-exact through the flat-quant
        encoder + float decoder (constant blocks carry only an integer
        DC; YCbCr quantization error < 1/16 stays far under the 0.5
        rounding threshold after the RGB inverse)."""
        img = np.full((h, w, 3), (r, g, b), dtype=np.uint8)
        assert np.array_equal(decode_jpeg(encode_jpeg(img)), img)

    def test_gradient_within_one_lsb(self):
        img = _gradient(16, 24)
        out = decode_jpeg(encode_jpeg(img))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 1

    def test_non_block_aligned_dims(self):
        img = _gradient(5, 13)
        out = decode_jpeg(encode_jpeg(img))
        assert out.shape == (5, 13, 3)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 1

    def test_deterministic_bytes(self):
        img = _gradient(8, 8)
        assert encode_jpeg(img) == encode_jpeg(img)


class TestEnvelope:
    def test_not_jpeg_raises(self):
        with pytest.raises(ValueError, match="not a JPEG"):
            decode_jpeg(b"PNG?????")

    def test_progressive_raises(self):
        """Swap SOF0 -> SOF2 in a valid stream: must be an explicit
        error, never a misdecode."""
        body = bytearray(encode_jpeg(_gradient(8, 8)))
        i = bytes(body).index(b"\xff\xc0")
        body[i + 1] = 0xC2
        with pytest.raises(ValueError, match="SOF2"):
            decode_jpeg(bytes(body))

    def test_truncated_raises(self):
        with pytest.raises(Exception):
            decode_jpeg(encode_jpeg(_gradient(8, 8))[:40])


class TestSparkPath:
    def test_strict_decode_image_features_accepts_jpeg(self, spark):
        img = _gradient(4, 8)
        df = spark.createDataFrame(
            [Row(doc_id=1, payload=bytearray(encode_jpeg(img)))]
        )
        row = mm.decode_image_features(df, strict=True).collect()[0]
        out = decode_jpeg(encode_jpeg(img))
        px = out.reshape(-1, 3).astype(np.float64) / 255.0
        assert row["features"][0] == 8.0 and row["features"][1] == 4.0
        np.testing.assert_allclose(row["features"][2:5], px.mean(axis=0), rtol=1e-6)

    def test_mixed_format_corpus_all_decode_strict(self, spark):
        """One corpus, four container formats, ONE strict decode pass —
        the sniff dispatch real mixed corpora need."""
        img = np.full((4, 8, 3), (10, 20, 30), dtype=np.uint8)
        payloads = [
            mm.encode_ppm(img),
            mm.encode_png(img),
            encode_jpeg(img),
        ]
        df = spark.createDataFrame(
            [Row(doc_id=i, payload=bytearray(p)) for i, p in enumerate(payloads)]
        )
        rows = mm.decode_image_features(df, strict=True).orderBy("doc_id").collect()
        assert len(rows) == 3
        for r in rows:
            np.testing.assert_allclose(
                r["features"][2:5], [10 / 255, 20 / 255, 30 / 255], atol=1e-6
            )
