"""Property tests for the pure-numpy codecs: any image roundtrips
through PPM encode/decode; any BMP layout decodes to the same pixels;
any 16-bit PCM signal survives WAV encode/decode within quantization.
Pure-python properties (no Spark session) — they run in milliseconds
and sweep shapes/values the example tests can't."""

from __future__ import annotations

import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mb8600_clickhouse_spark.operators import multimodal as mm


def _rand_img(draw, max_side=16):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    data = draw(
        st.binary(min_size=h * w * 3, max_size=h * w * 3)
    )
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


@st.composite
def images(draw):
    return _rand_img(draw)


class TestImageRoundtripProperties:
    @given(images())
    @settings(max_examples=60, deadline=None)
    def test_ppm_roundtrip_any_image(self, img):
        got = mm.decode_ppm(mm.encode_ppm(img))
        assert np.array_equal(got, img)

    @given(images(), st.booleans())
    @settings(max_examples=60, deadline=None)
    def test_bmp_decodes_any_image_both_orders(self, img, top_down):
        h, w = img.shape[:2]
        stride = (w * 3 + 3) & ~3
        rows = img if top_down else img[::-1]
        body = b"".join(
            rows[y, :, ::-1].tobytes() + b"\x00" * (stride - w * 3)
            for y in range(h)
        )
        dib = struct.pack(
            "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0,
            len(body), 2835, 2835, 0, 0,
        )
        hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
        assert np.array_equal(mm.decode_bmp(hdr + dib + body), img)

    @given(images())
    @settings(max_examples=30, deadline=None)
    def test_features_bounded_and_deterministic(self, img):
        f1 = mm._image_features(img, 8)
        f2 = mm._image_features(img, 8)
        assert f1 == f2
        w, h = f1[0], f1[1]
        assert (w, h) == (img.shape[1], img.shape[0])
        assert all(0.0 <= x <= 1.0 for x in f1[2:5])  # channel means
        assert all(0.0 <= x <= 0.5 for x in f1[5:8])  # channel stds


@st.composite
def pcm_signals(draw):
    n = draw(st.integers(1, 400))
    n_ch = draw(st.integers(1, 2))
    samples = draw(
        st.lists(
            st.integers(-32768, 32767), min_size=n * n_ch, max_size=n * n_ch
        )
    )
    return np.array(samples, dtype="<i2").reshape(n, n_ch)


class TestWavRoundtripProperties:
    @given(pcm_signals(), st.sampled_from([8000, 16000, 44100]))
    @settings(max_examples=60, deadline=None)
    def test_wav_roundtrip_any_signal(self, frames, rate):
        n_ch = frames.shape[1]
        pcm = frames.tobytes()
        fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16)
        payload = (
            b"RIFF"
            + struct.pack("<I", 4 + 24 + 8 + len(pcm))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm
        )
        got_rate, got = mm.decode_wav(payload)
        assert got_rate == rate
        assert got.shape == frames.shape
        assert np.array_equal(np.round(got * 32768.0), frames.astype(np.float64))
