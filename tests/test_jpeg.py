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


# ---------------------------------------------------------------------------
# decoder paths the shipping encoder never emits: 4:2:0 subsampling and
# restart markers (both ubiquitous in real-world files)
# ---------------------------------------------------------------------------
import struct

from mb8600_clickhouse_spark.operators.jpeg import (
    _A,
    _BitWriter,
    _block_symbols,
    _canonical_table,
    _mag_bits,
)


def _encode_custom(img: np.ndarray, subsample: bool, restart_interval: int = 0) -> bytes:
    """Test-local baseline encoder: optional 4:2:0 chroma subsampling
    (MCU = 16x16: four Y blocks + one averaged Cb + one Cr) and
    optional restart markers every `restart_interval` MCUs."""
    h, w = img.shape[:2]
    rgb = img.astype(np.float64)
    R, G, B = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    Y = 0.299 * R + 0.587 * G + 0.114 * B
    Cb = -0.168736 * R - 0.331264 * G + 0.5 * B + 128.0
    Cr = 0.5 * R - 0.418688 * G - 0.081312 * B + 128.0
    mcu = 16 if subsample else 8
    ph, pw = -(-h // mcu) * mcu, -(-w // mcu) * mcu
    Y, Cb, Cr = (
        np.pad(P, ((0, ph - h), (0, pw - w)), mode="edge") for P in (Y, Cb, Cr)
    )
    if subsample:  # average 2x2 chroma
        Cb = Cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        Cr = Cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

    def quant_blocks(P, y0, x0, n):
        out = []
        for by in range(n):
            for bx in range(n):
                f = P[y0 + by * 8 : y0 + by * 8 + 8, x0 + bx * 8 : x0 + bx * 8 + 8]
                out.append(np.round(_A @ (f - 128.0) @ _A.T))
        return out

    # pass 1: symbols per MCU (interleaved Y..Y Cb Cr)
    mcus = []
    dc_syms, ac_syms = set(), set()
    preds = [0, 0, 0]
    n_per_y = 2 if subsample else 1
    n_mcu = 0
    for my in range(ph // mcu):
        for mx in range(pw // mcu):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                preds = [0, 0, 0]  # predictors reset at restart
            comp_syms = []
            blocks_y = quant_blocks(Y, my * mcu, mx * mcu, n_per_y)
            chroma_y0, chroma_x0 = (my * 8, mx * 8) if subsample else (my * 8, mx * 8)
            blocks_cb = quant_blocks(Cb, chroma_y0, chroma_x0, 1)
            blocks_cr = quant_blocks(Cr, chroma_y0, chroma_x0, 1)
            for ci, blocks in ((0, blocks_y), (1, blocks_cb), (2, blocks_cr)):
                for Fq in blocks:
                    sym, preds[ci] = _block_symbols(Fq, preds[ci])
                    comp_syms.append(sym)
                    for kind, s, _v in sym:
                        (dc_syms if kind == "dc" else ac_syms).add(s)
            mcus.append(comp_syms)
            n_mcu += 1
    dc_bits, dc_vals, dc_enc = _canonical_table(dc_syms)
    ac_bits, ac_vals, ac_enc = _canonical_table(ac_syms)

    # pass 2: entropy-code with restart markers
    body = bytearray()
    bw = _BitWriter()
    n_mcu = 0
    for comp_syms in mcus:
        if restart_interval and n_mcu and n_mcu % restart_interval == 0:
            body += bw.flush()
            bw = _BitWriter()
            body += bytes([0xFF, 0xD0 + ((n_mcu // restart_interval - 1) % 8)])
        for sym in comp_syms:
            for kind, s, v in sym:
                ln, code = (dc_enc if kind == "dc" else ac_enc)[s]
                bw.write(code, ln)
                size = s if kind == "dc" else s & 0xF
                if size:
                    bw.write(_mag_bits(v, size), size)
        n_mcu += 1
    body += bw.flush()

    def seg(marker, payload_):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload_) + 2) + payload_

    hv = 0x22 if subsample else 0x11
    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    out += seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
        + bytes([1, hv, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + dc_vals)
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + ac_vals)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return out + bytes(body) + b"\xff\xd9"


class TestSubsamplingAndRestarts:
    def test_420_solid_color_exact(self):
        img = np.full((16, 32, 3), (120, 60, 200), dtype=np.uint8)
        out = decode_jpeg(_encode_custom(img, subsample=True))
        assert np.array_equal(out, img)

    def test_420_two_tone_within_tolerance(self):
        """Chroma averaged over 2x2 then replicated back: luma stays
        block-exact, chroma error bounded by the downsample."""
        img = np.zeros((16, 16, 3), np.uint8)
        img[:, :8] = (200, 40, 40)
        img[:, 8:] = (40, 200, 40)
        out = decode_jpeg(_encode_custom(img, subsample=True))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2

    def test_restart_markers_exact(self):
        # 8x48 = six 8x8 MCUs, restart every 2 -> two RST markers
        img = np.zeros((8, 48, 3), np.uint8)
        for i in range(6):
            img[:, i * 8 : (i + 1) * 8] = (40 * i + 10, 30 * i + 5, 20 * i + 3)
        payload = _encode_custom(img, subsample=False, restart_interval=2)
        assert b"\xff\xd0" in payload and b"\xff\xd1" in payload
        assert np.array_equal(decode_jpeg(payload), img)

    def test_restarts_with_subsampling(self):
        img = np.full((16, 64, 3), (17, 201, 99), dtype=np.uint8)  # 4 MCUs
        payload = _encode_custom(img, subsample=True, restart_interval=1)
        assert np.array_equal(decode_jpeg(payload), img)
