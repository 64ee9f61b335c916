"""AVI/MJPEG video path (operators/avi.py + multimodal video ops):
container round-trip, real frame sampling, and end-to-end demux +
JPEG-decode + featurize through Spark."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import Row

from mb8600_clickhouse_spark.operators import multimodal as mm
from mb8600_clickhouse_spark.operators.avi import encode_avi_mjpeg, parse_avi
from mb8600_clickhouse_spark.operators.jpeg import encode_jpeg


def _mjpeg_avi(colors, w=8, h=4, fps=30) -> bytes:
    frames = [
        encode_jpeg(np.full((h, w, 3), c, dtype=np.uint8)) for c in colors
    ]
    return encode_avi_mjpeg(frames, w, h, fps=fps)


class TestContainer:
    def test_roundtrip(self):
        colors = [(10, 20, 30), (40, 50, 60), (70, 80, 90)]
        payload = _mjpeg_avi(colors, fps=25)
        meta = parse_avi(payload)
        assert (meta["width"], meta["height"]) == (8, 4)
        assert meta["fps"] == 25.0 and meta["n_frames"] == 3
        # every frame chunk is a complete JPEG that decodes to its color
        for fr, c in zip(meta["frames"], colors):
            img = mm.decode_image(fr)
            assert img.shape == (4, 8, 3)
            assert tuple(img[0, 0]) == c

    def test_not_avi_raises(self):
        with pytest.raises(ValueError, match="not a RIFF/AVI"):
            parse_avi(b"RIFFxxxxWAVEdata")


class TestSampleFramesReal:
    def test_real_sampling_digests_frame_payloads(self, spark):
        colors = [(i * 10, i * 5, i * 3) for i in range(6)]
        payload = _mjpeg_avi(colors)
        meta = parse_avi(payload)
        df = spark.createDataFrame([Row(doc_id=7, payload=bytearray(payload))])
        rows = (
            mm.sample_frames(df, every_nth=2, max_frames=2, strict=True)
            .orderBy("frame_idx")
            .collect()
        )
        # frames 0 and 2 (every 2nd, capped at 2), digests of RAW chunks
        assert [(r["doc_id"], r["frame_idx"]) for r in rows] == [(7, 0), (7, 2)]
        assert rows[0]["frame_sha256"] == hashlib.sha256(meta["frames"][0]).hexdigest()
        assert rows[1]["frame_sha256"] == hashlib.sha256(meta["frames"][2]).hexdigest()

    def test_non_avi_still_strict_raises(self, spark):
        df = spark.createDataFrame([Row(doc_id=1, payload=bytearray(b"mp4?" * 10))])
        with pytest.raises(Exception, match="NotImplementedError|demuxer"):
            mm.sample_frames(df, strict=True).collect()


class TestVideoFeatures:
    def test_end_to_end_demux_decode_featurize(self, spark):
        colors = [(100, 0, 0), (0, 100, 0), (0, 0, 100)]
        df = spark.createDataFrame(
            [Row(doc_id=1, payload=bytearray(_mjpeg_avi(colors, fps=10)))]
        )
        rows = (
            mm.video_frame_features(df, every_nth=1, max_frames=8, strict=True)
            .orderBy("frame_idx")
            .collect()
        )
        assert len(rows) == 3
        for r, c in zip(rows, colors):
            assert r["n_frames"] == 3 and r["fps"] == 10.0
            np.testing.assert_allclose(
                r["features"][2:5], [x / 255 for x in c], atol=1e-6
            )
