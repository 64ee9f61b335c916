"""Real pure-numpy image decode paths (PPM P6 / 24-bit BMP): decoding,
feature extraction, and nearest-neighbor resize run for real — no
imaging library, no fake — including under strict=True."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import Row

from mb8600_clickhouse_spark.operators import multimodal as mm


def _gradient(h: int, w: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 test image."""
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = np.arange(w, dtype=np.uint8)[None, :] * 10
    img[:, :, 1] = np.arange(h, dtype=np.uint8)[:, None] * 20
    img[:, :, 2] = 7
    return img


def _bmp_bytes(img: np.ndarray, top_down: bool = False) -> bytes:
    """Minimal uncompressed 24-bit BMP encoder (BITMAPINFOHEADER)."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = img if top_down else img[::-1]
    body = b"".join(
        rows[y, :, ::-1].tobytes() + b"\x00" * (stride - w * 3) for y in range(h)
    )
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return hdr + dib + body


class TestPureDecoders:
    def test_ppm_roundtrip_with_comment(self):
        img = _gradient(3, 4)
        payload = mm.encode_ppm(img)
        # header comments are legal PPM; insert one
        commented = payload.replace(b"P6\n", b"P6\n# test comment\n", 1)
        for p in (payload, commented):
            got = mm.decode_ppm(p)
            assert got.shape == (3, 4, 3)
            assert np.array_equal(got, img)

    def test_bmp_bottom_up_and_top_down(self):
        img = _gradient(3, 5)  # w=5 -> 15-byte rows, 4-byte padding exercised
        for td in (False, True):
            got = mm.decode_bmp(_bmp_bytes(img, top_down=td))
            assert got.shape == (3, 5, 3)
            assert np.array_equal(got, img)

    def test_unsupported_variants_raise(self):
        with pytest.raises(ValueError):
            mm.decode_ppm(b"P3\n1 1\n255\n1 2 3")  # ASCII ppm
        with pytest.raises(ValueError):
            mm.decode_bmp(b"BM" + b"\x00" * 60)  # bpp 0
        assert mm.decode_image(b"\x89PNG....") is None  # no backend -> None


class TestSparkRealDecode:
    def _frame(self, spark):
        imgs = {1: _gradient(4, 6), 2: _gradient(3, 5)}
        return (
            spark.createDataFrame(
                [
                    Row(doc_id=1, payload=bytearray(mm.encode_ppm(imgs[1]))),
                    Row(doc_id=2, payload=bytearray(_bmp_bytes(imgs[2]))),
                ]
            ),
            imgs,
        )

    def test_features_are_real_pixel_moments_strict(self, spark):
        df, imgs = self._frame(spark)
        # strict=True: decodable formats must NOT raise — the stub is
        # only for formats without a numpy decoder
        feats = {
            r["doc_id"]: r["features"]
            for r in mm.decode_image_features(df, strict=True).collect()
        }
        for doc_id, img in imgs.items():
            h, w = img.shape[:2]
            px = img.reshape(-1, 3).astype(np.float64) / 255.0
            want = [float(w), float(h), *px.mean(axis=0), *px.std(axis=0)]
            assert feats[doc_id] == pytest.approx(want, abs=1e-6)

    def test_resize_real_nearest_neighbor(self, spark):
        df, imgs = self._frame(spark)
        out = {
            r["doc_id"]: r for r in mm.resize_images(df, 2, 2, strict=True).collect()
        }
        for doc_id, img in imgs.items():
            got = mm.decode_ppm(bytes(out[doc_id]["payload"]))
            h, w = img.shape[:2]
            yi = (np.arange(2) * h) // 2
            xi = (np.arange(2) * w) // 2
            assert np.array_equal(got, img[yi][:, xi])

    def test_mixed_corpus_fake_fallback_nonstrict(self, spark):
        """Undecodable payloads keep the deterministic fake under
        strict=False and raise under strict=True."""
        df = spark.createDataFrame([Row(doc_id=9, payload=bytearray(b"not-an-image"))])
        feats = mm.decode_image_features(df).collect()[0]["features"]
        assert feats == pytest.approx(mm._fake_decode(b"not-an-image"), abs=1e-6)
        with pytest.raises(Exception) as ei:
            mm.decode_image_features(df, strict=True).collect()
        assert "NotImplementedError" in str(ei.value) or "numpy decoder" in str(ei.value)
