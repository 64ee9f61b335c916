"""FLAC codec (operators/flac.py): verbatim round-trips via the
encoder, plus hand-built frames exercising every decoder path the
encoder never emits — CONSTANT / FIXED / LPC subframes, Rice
residuals, escaped partitions, and left/side stereo decorrelation."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from mb8600_clickhouse_spark.operators import multimodal as mm
from mb8600_clickhouse_spark.operators.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_number,
    decode_flac,
    encode_flac,
)


class TestVerbatimRoundTrip:
    @given(
        n=st.integers(1, 5000),
        rate=st.sampled_from([8000, 44100, 48000]),
        seed=st.integers(0, 2**31),
    )
    @settings(max_examples=10, deadline=None)
    def test_mono(self, n, rate, seed):
        rng = np.random.default_rng(seed)
        s = rng.integers(-32768, 32768, n).astype(np.int16)
        r, frames = decode_flac(encode_flac(rate, s))
        assert r == rate and frames.shape == (n, 1)
        np.testing.assert_array_equal(frames[:, 0] * 32768.0, s.astype(np.float64))

    def test_stereo_and_multiframe(self):
        n = 10000  # spans three 4096 frames
        s = np.stack(
            [np.arange(n) % 30000 - 15000, -(np.arange(n) % 20000) + 10000], axis=1
        ).astype(np.int16)
        r, frames = decode_flac(encode_flac(22050, s))
        assert frames.shape == (n, 2)
        np.testing.assert_array_equal(frames * 32768.0, s.astype(np.float64))

    def test_rejections(self):
        with pytest.raises(ValueError, match="not a FLAC"):
            decode_flac(b"RIFFxxxxWAVE")


# ---------------------------------------------------------------------------
# hand-built frames for the compressed decode paths
# ---------------------------------------------------------------------------
def _streaminfo(rate: int, n_ch: int, bps: int, total: int) -> bytes:
    w = _BitWriter()
    w.write(16, 16); w.write(65535, 16); w.write(0, 24); w.write(0, 24)
    w.write(rate, 20); w.write(n_ch - 1, 3); w.write(bps - 1, 5)
    w.write(total, 36)
    return b"fLaC" + bytes([0x80]) + (len(bytes(w.out)) + 16).to_bytes(3, "big") + bytes(w.out) + bytes(16)


def _frame_header(n_ch_code: int, bsize: int, bps_code: int) -> bytes:
    hw = _BitWriter()
    hw.write(0x3FFE, 14); hw.write(0, 1); hw.write(0, 1)
    hw.write(7, 4)        # 16-bit block size at end of header
    hw.write(0, 4)        # rate from STREAMINFO
    hw.write(n_ch_code, 4)
    hw.write(bps_code, 3)
    hw.write(0, 1)
    hdr = bytes(hw.out) + _utf8_number(0) + struct.pack(">H", bsize - 1)
    return hdr + bytes([_crc8(hdr)])


def _rice_write(w: _BitWriter, v: int, k: int) -> None:
    z = (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1  # zigzag
    z = (v << 1) if v >= 0 else ((-v) << 1) - 1
    q = z >> k
    for _ in range(q):
        w.write(0, 1)
    w.write(1, 1)
    if k:
        w.write(z & ((1 << k) - 1), k)


def _assemble(streaminfo: bytes, body_bits: _BitWriter, hdr: bytes) -> bytes:
    body_bits.align()
    body = hdr + bytes(body_bits.out)
    return streaminfo + body + struct.pack(">H", _crc16(body))


class TestCompressedDecodePaths:
    def test_constant_subframe(self):
        n = 16
        w = _BitWriter()
        w.write(0, 1); w.write(0, 6); w.write(0, 1)  # CONSTANT
        w.write(1234 & 0xFFFF, 16)
        payload = _assemble(_streaminfo(8000, 1, 16, n), w, _frame_header(0, n, 4))
        _r, frames = decode_flac(payload)
        np.testing.assert_array_equal(frames[:, 0] * 32768.0, [1234.0] * n)

    def test_fixed_order1_with_rice_residuals(self):
        n = 16
        samples = [100 + 7 * i for i in range(n)]  # residual = constant 7
        w = _BitWriter()
        w.write(0, 1); w.write(9, 6); w.write(0, 1)  # FIXED order 1
        w.write(samples[0] & 0xFFFF, 16)             # warmup
        w.write(0, 2)                                # rice method 0
        w.write(0, 4)                                # partition order 0
        w.write(3, 4)                                # k = 3
        for i in range(1, n):
            _rice_write(w, samples[i] - samples[i - 1], 3)
        payload = _assemble(_streaminfo(8000, 1, 16, n), w, _frame_header(0, n, 4))
        _r, frames = decode_flac(payload)
        np.testing.assert_array_equal(frames[:, 0] * 32768.0, samples)

    def test_lpc_subframe(self):
        n = 12
        samples = [50]
        for i in range(1, n):
            samples.append(samples[-1] * 2 - samples[-1] // 3)  # arbitrary
        # LPC order 1, coeff 2, shift 1 => pred = (2*prev) >> 1 = prev
        w = _BitWriter()
        w.write(0, 1); w.write(32, 6); w.write(0, 1)  # LPC order 1 (32 + 1 - 1)
        w.write(samples[0] & 0xFFFF, 16)
        w.write(3, 4)   # precision-1 = 3 -> 4-bit coeffs
        w.write(1, 5)   # shift 1
        w.write(2, 4)   # coeff = +2
        w.write(0, 2); w.write(0, 4); w.write(6, 4)  # rice k=6
        for i in range(1, n):
            pred = (2 * samples[i - 1]) >> 1
            _rice_write(w, samples[i] - pred, 6)
        payload = _assemble(_streaminfo(8000, 1, 16, n), w, _frame_header(0, n, 4))
        _r, frames = decode_flac(payload)
        np.testing.assert_array_equal(frames[:, 0] * 32768.0, samples)

    def test_escaped_partition(self):
        n = 8
        samples = [3, -4, 5, -6, 7, -8, 9, -10]
        w = _BitWriter()
        w.write(0, 1); w.write(8, 6); w.write(0, 1)  # FIXED order 0
        w.write(0, 2); w.write(0, 4)
        w.write(0xF, 4)  # escape
        w.write(12, 5)   # raw 12-bit residuals
        for v in samples:
            w.write(v & 0xFFF, 12)
        payload = _assemble(_streaminfo(8000, 1, 16, n), w, _frame_header(0, n, 4))
        _r, frames = decode_flac(payload)
        np.testing.assert_array_equal(frames[:, 0] * 32768.0, samples)

    def test_left_side_stereo(self):
        n = 8
        left = [1000, -2000, 3000, -4000, 500, 600, -700, 800]
        right = [900, -1500, 2500, -3500, 400, 500, -600, 700]
        side = [l - r for l, r in zip(left, right)]
        w = _BitWriter()
        for vals, bits in ((left, 16), (side, 17)):
            w.write(0, 1); w.write(1, 6); w.write(0, 1)  # VERBATIM
            for v in vals:
                w.write(v & ((1 << bits) - 1), bits)
        payload = _assemble(
            _streaminfo(8000, 2, 16, n), w, _frame_header(8, n, 4)
        )
        _r, frames = decode_flac(payload)
        np.testing.assert_array_equal(frames[:, 0] * 32768.0, left)
        np.testing.assert_array_equal(frames[:, 1] * 32768.0, right)


class TestSparkPath:
    def test_strict_audio_features_accept_flac(self, spark):
        amp = 2000
        pattern = np.tile([amp, amp, -amp, -amp], 200).astype(np.int16)
        payload = encode_flac(8000, pattern)
        df = spark.createDataFrame([Row(doc_id=1, payload=bytearray(payload))])
        r = mm.decode_audio_features(df, strict=True).collect()[0]
        f = r["features"]
        assert f[0] == 8000.0 and f[1] == 1.0
        assert f[2] == pytest.approx(0.1)          # 800 / 8000 s
        assert f[3] == pytest.approx(amp / 32768)  # rms of a square wave
        assert f[4] == pytest.approx(amp / 32768)  # peak
        assert f[5] == pytest.approx(399 / 799)    # zero-crossing rate


class TestMoreDecodePaths:
    def test_right_side_stereo(self):
        n = 6
        left = [100, -200, 300, -400, 550, -660]
        right = [90, -150, 250, -350, 450, -560]
        side = [l - r for l, r in zip(left, right)]
        w = _BitWriter()
        # right/side: SIDE subframe first (bps+1), then RIGHT
        for vals, bits in ((side, 17), (right, 16)):
            w.write(0, 1); w.write(1, 6); w.write(0, 1)
            for v in vals:
                w.write(v & ((1 << bits) - 1), bits)
        payload = _assemble(_streaminfo(8000, 2, 16, n), w, _frame_header(9, n, 4))
        _r, frames = decode_flac(payload)
        np.testing.assert_array_equal(frames[:, 0] * 32768.0, left)
        np.testing.assert_array_equal(frames[:, 1] * 32768.0, right)

    def test_mid_side_stereo(self):
        n = 4
        left = [1000, -500, 250, 125]
        right = [800, -300, 150, 75]
        mid = [(l + r) >> 1 for l, r in zip(left, right)]
        side = [l - r for l, r in zip(left, right)]
        w = _BitWriter()
        for vals, bits in ((mid, 16), (side, 17)):
            w.write(0, 1); w.write(1, 6); w.write(0, 1)
            for v in vals:
                w.write(v & ((1 << bits) - 1), bits)
        payload = _assemble(_streaminfo(8000, 2, 16, n), w, _frame_header(10, n, 4))
        _r, frames = decode_flac(payload)
        np.testing.assert_array_equal(frames[:, 0] * 32768.0, left)
        np.testing.assert_array_equal(frames[:, 1] * 32768.0, right)

    def test_wasted_bits(self):
        """A subframe with 2 wasted bits: stored values are samples >> 2,
        reconstruction shifts back."""
        n = 4
        samples = [4, -8, 16, -32]  # all divisible by 4
        w = _BitWriter()
        w.write(0, 1); w.write(1, 6)  # VERBATIM
        w.write(1, 1)                 # wasted-bits flag
        w.write(0, 1); w.write(1, 1)  # unary 01 -> k=1 -> wasted = 2
        for v in samples:
            w.write((v >> 2) & ((1 << 14) - 1), 14)  # eff bps = 16 - 2
        payload = _assemble(_streaminfo(8000, 1, 16, n), w, _frame_header(0, n, 4))
        _r, frames = decode_flac(payload)
        np.testing.assert_array_equal(frames[:, 0] * 32768.0, samples)
