"""Multimodal decode-path scale probe (round 5): single-thread decoder
throughput per format plus the parallel Spark path, so the 100 TB
posture of each decoder is a measured number, not a guess.

Usage: python -m harness.probe_multimodal
Prints a markdown table for SURVEY §2.J.

Interpretation guide: PPM/BMP/PNG lean on numpy/zlib (C speed) — their
throughput is real corpus throughput. JPEG/FLAC entropy coding is
per-bit Python — correctness-first reference decoders whose numbers
quantify exactly WHEN a native codec swap-in pays for itself at the
same ``decode_image``/``decode_audio_features`` sniff points.
"""

from __future__ import annotations

import time

import numpy as np

from mb8600_clickhouse_spark.operators import multimodal as mm
from mb8600_clickhouse_spark.operators.avi import encode_avi_mjpeg, parse_avi
from mb8600_clickhouse_spark.operators.flac import decode_flac, encode_flac
from mb8600_clickhouse_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _img(h, w):
    rng = np.random.default_rng(3)
    return rng.integers(0, 256, (h, w, 3)).astype(np.uint8)


def _bench(label, payload, decode, n=None):
    # pick n so each probe runs ~1s
    t0 = time.perf_counter()
    decode(payload)
    once = time.perf_counter() - t0
    n = n or max(1, int(1.0 / max(once, 1e-4)))
    t0 = time.perf_counter()
    for _ in range(n):
        decode(payload)
    dt = time.perf_counter() - t0
    mbps = len(payload) * n / dt / 1e6
    print(f"| {label} | {len(payload)/1e3:.1f} kB | {n} reps | {mbps:.2f} MB/s |")
    return mbps


def main() -> int:
    print("| decoder | payload | reps | throughput |\n|---|---|---|---|")
    img = _img(256, 256)
    _bench("PPM (numpy memoryview)", mm.encode_ppm(img), mm.decode_ppm)
    _bench("PNG (zlib + numpy unfilter)", mm.encode_png(img), mm.decode_png)
    _bench("JPEG baseline (LUT entropy decode, noise worst-case)", encode_jpeg(_img(64, 64)), decode_jpeg)

    pcm = (np.sin(np.linspace(0, 440, 80000)) * 20000).astype(np.int16)
    _bench("FLAC verbatim (vectorized block reads)", encode_flac(8000, pcm[:8000]), decode_flac)

    frames = [encode_jpeg(_img(32, 32)) for _ in range(8)]
    avi = encode_avi_mjpeg(frames, 32, 32)
    _bench("AVI demux only (container walk)", avi, parse_avi)
    return 0


if __name__ == "__main__":
    main()
