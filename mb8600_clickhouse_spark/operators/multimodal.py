"""Multimodal (image/audio/video) column plumbing.

Payloads are opaque ``binary`` columns with a typed metadata struct —
the Parquet-native representation (binary leaves stay columnar,
metadata prunes independently of payload bytes). Feature extraction and
decoding run as Arrow-batched ``mapInPandas`` operators so payload bytes
cross the JVM<->Python boundary once per batch, never per row.

Decoders: PPM (binary P6), BMP (24-bit uncompressed), PNG (8-bit
depth, all five standard filters, gray/RGB/palette/alpha color types,
stdlib zlib inflate + numpy un-filtering) and baseline JPEG (SOF0,
per-file Huffman/quant tables, chroma subsampling to 2x2, restart
markers — ``operators/jpeg.py``) are decoded for REAL — no imaging
library needed — including feature extraction and nearest-neighbor
resize. Audio: 16-bit PCM WAV and FLAC (complete subframe set incl.
LPC and Rice residuals — ``operators/flac.py``). Formats that
genuinely need an external codec (progressive JPEG, MP3, video):
``strict=True`` raises ``NotImplementedError`` and ``strict=False``
falls back to a deterministic digest-derived fake so the distributed
plumbing stays exercisable end-to-end
(tests/test_multimodal_decode.py, tests/test_jpeg.py,
tests/test_flac.py).
"""

from __future__ import annotations

import hashlib
import struct as _struct
from typing import Iterator

import numpy as np
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
    """Deterministic stand-in for formats without a pure-numpy decoder:
    derive ``dim`` floats from the payload digest. Swap for
    PIL/torchvision/ffmpeg on a cluster that has them installed."""
    digest = hashlib.sha256(payload).digest()
    return [digest[i] / 255.0 for i in range(dim)]


# ---------------------------------------------------------------------------
# Real pure-numpy decoders (PPM P6, 24-bit BMP)
# ---------------------------------------------------------------------------


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode a binary PPM (P6) payload to an (h, w, 3) uint8 array.
    Handles '#' comments and arbitrary whitespace in the header; only
    maxval 255 (the universal case) is supported."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic + 3 integers, tokenized with comment stripping
    vals: list[int] = []
    i = 2
    while len(vals) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        vals.append(int(payload[i:j]))
        i = j
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    i += 1  # exactly one whitespace byte after maxval
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return px.reshape(h, w, 3)


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6) bytes."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP payload to (h, w, 3) uint8 RGB.
    Supports the BITMAPINFOHEADER layout (40-byte DIB header, BI_RGB),
    both bottom-up (positive height) and top-down (negative) row order;
    rows are 4-byte padded per the format."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = _struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = _struct.unpack_from("<Iii", payload, 14)
    planes, bpp = _struct.unpack_from("<HH", payload, 26)
    compression = _struct.unpack_from("<I", payload, 30)[0]
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (dib={hdr_size}, bpp={bpp}, comp={compression})"
        )
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img if top_down else img[::-1]


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: channels per pixel for each PNG color type (3 = palette index)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def encode_png(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> PNG bytes (8-bit color type 2, filter 0
    rows, one zlib-compressed IDAT). Pure stdlib — used by tests and
    the q77 fixture synthesis."""
    import zlib

    h, w = img.shape[:2]
    img = np.ascontiguousarray(img, dtype=np.uint8)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            _struct.pack(">I", len(data))
            + typ
            + data
            + _struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = _struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG payload to an (h, w, 3) uint8 RGB array — REAL
    decompression (stdlib zlib) + per-row un-filtering in numpy.

    Supported: 8-bit depth; color types 0 (gray), 2 (RGB), 3 (palette),
    4 (gray+alpha), 6 (RGBA); all five standard row filters (None, Sub,
    Up, Average, Paeth); multiple IDAT chunks. Alpha is dropped, gray is
    replicated to RGB. Not supported (raise): 1/2/4/16-bit depths and
    Adam7 interlace — rare in ML corpora and an explicit error beats a
    silent misdecode.

    The Sub filter's row-prefix dependency vectorizes as a cumulative
    sum mod 256 per channel lane; Average/Paeth are inherently
    byte-sequential, so those rows fall back to a per-byte loop —
    correctness-first; a large-corpus hot path would swap in a native
    codec behind the same mapInPandas plumbing."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(payload):
        ln = _struct.unpack_from(">I", payload, pos)[0]
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            ihdr = _struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln  # len + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, ctype, comp, filt_method, interlace = ihdr
    if depth != 8 or comp != 0 or filt_method != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, interlace={interlace})"
        )
    if ctype not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {ctype}")
    nch = _PNG_CHANNELS[ctype]
    stride = w * nch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) < h * (1 + stride):
        raise ValueError("PNG scanline data truncated")

    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    rpos = 0
    for y in range(h):
        f = raw[rpos]
        rpos += 1
        rec = np.frombuffer(raw, np.uint8, stride, rpos).astype(np.int32)
        rpos += stride
        if f == 0:
            pass
        elif f == 1:  # Sub: recon[x] = filt[x] + recon[x-nch] => cumsum/lane
            for i in range(nch):
                rec[i::nch] = np.cumsum(rec[i::nch]) & 0xFF
        elif f == 2:  # Up
            rec = (rec + prev) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = rec[i - nch] if i >= nch else 0
                rec[i] = (rec[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = int(rec[i - nch]) if i >= nch else 0
                b = int(prev[i])
                c = int(prev[i - nch]) if i >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[i] = (rec[i] + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        out[y] = rec
        prev = rec
    px = out.reshape(h, w, nch)
    if ctype == 2:
        return px
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        return plte[px[..., 0]]
    if ctype == 4:
        return np.repeat(px[..., :1], 3, axis=2)
    return px[..., :3]  # ctype 6: drop alpha


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a RIFF/WAVE payload with 16-bit PCM samples to
    (sample_rate, (n_frames, n_channels) float64 array in [-1, 1]).
    Walks RIFF chunks (fmt may be followed by fact/LIST before data);
    only format tag 1 (PCM) at 16 bits is supported."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = _struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = _struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, n_ch, rate, _, _, bits = fmt
    if tag != 1 or bits != 16:
        raise ValueError(f"unsupported WAV encoding (tag={tag}, bits={bits})")
    samples = np.frombuffer(data, dtype="<i2")
    frames = samples[: len(samples) - len(samples) % n_ch].reshape(-1, n_ch)
    return rate, frames.astype(np.float64) / 32768.0


def _audio_features(rate: int, frames: np.ndarray, dim: int) -> list[float]:
    """Real audio features: [sample_rate, n_channels, duration_s, rms,
    peak, zero_crossing_rate], padded/truncated to ``dim`` — the cheap
    corpus-curation stats (silence/clipping/noise filters)."""
    mono = frames.mean(axis=1)
    zc = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if len(mono) > 1 else 0.0
    feats = [
        float(rate),
        float(frames.shape[1]),
        frames.shape[0] / rate,
        float(np.sqrt(np.mean(mono * mono))) if len(mono) else 0.0,
        float(np.max(np.abs(frames))) if frames.size else 0.0,
        zc,
    ]
    feats = feats[:dim]
    return feats + [0.0] * (dim - len(feats))


def decode_audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    dim: int = 8,
    strict: bool = False,
) -> DataFrame:
    """Arrow-batched audio feature extraction (mapInPandas), same
    contract as ``decode_image_features``: 16-bit PCM WAV decodes for
    REAL (pure numpy); other formats raise under ``strict=True`` and
    fall back to the digest fake otherwise."""

    def _features(p) -> list[float]:
        b = bytes(p)
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            return _audio_features(*decode_wav(b), dim)
        if b[:4] == b"fLaC":
            from .flac import decode_flac

            return _audio_features(*decode_flac(b), dim)
        if strict:
            raise NotImplementedError(
                "no pure-numpy decoder for this audio format; plug a real "
                "backend (ffmpeg/soundfile) into decode_audio_features"
            )
        return _fake_decode(b, dim)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                    "features": pdf[payload_col].map(_features),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(extract, FEATURES_SCHEMA)


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash (dHash) of an (h, w[, 3]) uint8 image:
    grayscale (channel mean) → block-mean resize to 9x8 → per-row
    adjacent-column comparisons → 64 bits, bit (row*8 + col) set when
    the right block mean exceeds the left. The classic perceptual hash
    for image near-dup: robust to re-encoding/resizing, 8 bytes per
    image, Hamming-comparable (compose with ``dedup.simhash``'s
    pigeonhole segment blocking for banded near-dup search at scale).
    Returned as a Python int in [0, 2^64) (store as int64 with
    wraparound for bit 63)."""
    g = img.astype(np.float64)
    if g.ndim == 3:
        g = g.mean(axis=2)
    # images smaller than the 9x8 grid (tracking pixels are everywhere
    # in real crawls) first nearest-neighbor upscale so no block is
    # empty (an empty block's mean is NaN and every comparison bit
    # silently collapses to 0)
    if g.shape[0] < 8:
        g = np.repeat(g, -(-8 // g.shape[0]), axis=0)
    if g.shape[1] < 9:
        g = np.repeat(g, -(-9 // g.shape[1]), axis=1)
    rows = [r.mean(axis=0) for r in np.array_split(g, 8, axis=0)]
    cols = np.stack(
        [np.array([c.mean() for c in np.array_split(r, 9)]) for r in rows]
    )
    bits = (cols[:, 1:] > cols[:, :-1]).astype(np.uint64).ravel()
    return int((bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))


def image_dhash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    strict: bool = False,
) -> DataFrame:
    """(doc_id, dhash, decode_ok): Arrow-batched perceptual hashing
    over image payloads — decode (PPM/BMP/PNG/baseline-JPEG, the
    ``decode_image`` sniffing) then ``dhash64``. The hash is stored as
    int64 (two's-complement wraparound for bit 63). Undecodable
    payloads under ``strict=False`` get a NULL dhash and
    ``decode_ok=false`` — never a content-hash stand-in, which would
    make byte-identical files look like distance-0 'perceptual' dups
    while re-encoded identical images look unrelated (downstream
    near-dup statistics must be able to separate the two populations).
    Pure projection: zero shuffle; downstream dedup groups by the
    8-byte hash, never the pixels."""

    def _hash(p):
        img = decode_image(bytes(p))
        if img is None:
            if strict:
                raise NotImplementedError(
                    "no pure-numpy decoder for this image format; plug a "
                    "real backend (Pillow/libvips) into image_dhash"
                )
            return None
        u = dhash64(img)
        return u - (1 << 64) if u >= (1 << 63) else u

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = pdf[payload_col].map(_hash)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "dhash": hashes.astype("Int64"),
                    "decode_ok": hashes.notna(),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        extract, "doc_id long, dhash long, decode_ok boolean"
    )


#: (doc_id, n_frames, dom_bin, centroid, low_frac) — the spectral rollup
SPECTRAL_SCHEMA = (
    "doc_id long, n_frames int, dom_bin int, centroid double, low_frac double"
)


def spectral_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    n_fft: int = 256,
    low_bin: int = 16,
    strict: bool = False,
) -> DataFrame:
    """Frequency-domain audio features (mapInPandas — the real-DSP
    sibling of ``decode_audio_features``'s time-domain stats): decode,
    frame into non-overlapping ``n_fft`` windows, real FFT per frame
    (rectangular window — the analytic-oracle contract of q144 needs
    closed-form bin powers), average the power spectra over frames
    (DC excluded), then per document:

    - ``dom_bin``: argmax power bin (integer — exact cross-engine);
    - ``centroid``: the spectral centroid  sum(k*P)/sum(P);
    - ``low_frac``: power fraction in bins 1..``low_bin``.

    Ratios, not raw powers, on purpose: bin power scales with
    amplitude^2 (~1e8 at full-scale PCM), where a 4-decimal snap is
    ulp-relative and flaky; the ratios are O(1)-scaled and
    amplitude-invariant. Arrow-batched numpy throughout — per batch one
    (frames x n_fft) rfft; zero shuffle, embarrassingly parallel (the
    decode_*_features scale posture)."""

    def _spec(p) -> tuple[int, int, float, float]:
        b = bytes(p)
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            _rate, samples = decode_wav(b)
        elif b[:4] == b"fLaC":
            from .flac import decode_flac

            _rate, samples = decode_flac(b)
        elif strict:
            raise NotImplementedError(
                "no pure-numpy decoder for this audio format; plug a real "
                "backend (ffmpeg/soundfile) into spectral_features"
            )
        else:
            rng = np.random.default_rng(
                int.from_bytes(hashlib.md5(b).digest()[:4], "big")
            )
            samples = rng.normal(0.0, 0.1, n_fft)
        x = np.asarray(samples, dtype=np.float64)
        nf = len(x) // n_fft
        if nf == 0:
            return 0, 0, 0.0, 0.0
        frames = x[: nf * n_fft].reshape(nf, n_fft)
        X = np.fft.rfft(frames, axis=1)
        P = (X.real**2 + X.imag**2).mean(axis=0)
        P[0] = 0.0
        tot = P.sum()
        if tot == 0.0:
            return nf, 0, 0.0, 0.0
        k = np.arange(len(P), dtype=np.float64)
        return (
            nf,
            int(np.argmax(P)),
            float((k * P).sum() / tot),
            float(P[: low_bin + 1].sum() / tot),
        )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[payload_col].map(_spec)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_frames": feats.map(lambda t: t[0]).astype("int32"),
                    "dom_bin": feats.map(lambda t: t[1]).astype("int32"),
                    "centroid": feats.map(lambda t: t[2]),
                    "low_frac": feats.map(lambda t: t[3]),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(extract, SPECTRAL_SCHEMA)


def decode_image(payload: bytes) -> np.ndarray | None:
    """Sniff the payload magic and decode if a pure-numpy decoder
    exists; None for formats that need an external backend."""
    head = bytes(payload[:2])
    if head == b"P6":
        return decode_ppm(payload)
    if head == b"BM":
        return decode_bmp(payload)
    if bytes(payload[:8]) == _PNG_SIG:
        return decode_png(payload)
    if head == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    return None


def _image_features(img: np.ndarray, dim: int) -> list[float]:
    """Real feature vector from decoded pixels: [w, h, mean RGB (3),
    std RGB (3)], zero-padded / truncated to ``dim``. Channel moments
    are the classic cheap embedding for corpus-level stats (brightness/
    colorfulness filters) and are deterministic across platforms."""
    h, w = img.shape[:2]
    px = img.reshape(-1, 3).astype(np.float64) / 255.0
    feats = [float(w), float(h), *px.mean(axis=0), *px.std(axis=0)]
    feats = feats[:dim]
    return feats + [0.0] * (dim - len(feats))


def decode_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    dim: int = 8,
    strict: bool = False,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas (one Python worker per partition, batch-at-a-time).

    PPM/BMP payloads are decoded for REAL (pure numpy; see
    ``decode_image``) into [w, h, mean RGB, std RGB] features. For
    other formats: strict=True raises NotImplementedError — the marker
    that an external decoder backend is required; strict=False runs the
    deterministic digest fake so the distributed plumbing stays
    exercisable."""

    def _features(p) -> list[float]:
        img = decode_image(bytes(p))
        if img is not None:
            return _image_features(img, dim)
        if strict:
            raise NotImplementedError(
                "no pure-numpy decoder for this payload format; plug a real "
                "backend (PIL/ffmpeg) into decode_image_features"
            )
        return _fake_decode(bytes(p), dim)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                    "features": pdf[payload_col].map(_features),
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

    PPM/BMP payloads are resized for REAL: pure-numpy nearest-neighbor
    index sampling, re-encoded as PPM (P6). For other formats:
    strict=True raises NotImplementedError; strict=False passes payload
    bytes through and stamps the target dimensions, keeping the
    distributed plumbing testable. Swap in PIL/libvips for filtered
    resampling of compressed formats."""

    def _resize(p):
        img = decode_image(bytes(p))
        if img is None:
            if strict:
                raise NotImplementedError(
                    "no pure-numpy decoder for this payload format; plug "
                    "PIL/libvips into resize_images"
                )
            return bytes(p)
        h, w = img.shape[:2]
        yi = (np.arange(height) * h) // height
        xi = (np.arange(width) * w) // width
        return encode_ppm(img[yi][:, xi])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": width,
                    "height": height,
                    "payload": pdf[payload_col].map(_resize),
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

    MJPEG AVI payloads sample for REAL (round 5): the RIFF container is
    walked (``operators/avi.py``), every ``every_nth``-th frame chunk is
    taken up to ``max_frames``, and the digest is of the raw frame
    payload — real per-frame extraction, no ffmpeg. Other containers/
    codecs: strict=True raises; strict=False derives deterministic
    digests from (payload, frame index) so the fan-out plumbing stays
    exercisable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .avi import parse_avi

        for pdf in batches:
            ids, idxs, digests = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                    meta = parse_avi(b)
                    picked = meta["frames"][:: max(every_nth, 1)][:max_frames]
                    for i, fr in enumerate(picked):
                        ids.append(doc_id)
                        idxs.append(i * every_nth)
                        digests.append(hashlib.sha256(fr).hexdigest())
                    continue
                if strict:
                    raise NotImplementedError(
                        "no pure-python demuxer for this container; plug "
                        "ffmpeg into sample_frames (MJPEG AVI decodes for real)"
                    )
                n = min(max_frames, max(1, len(b) // max(every_nth, 1)))
                for i in range(n):
                    ids.append(doc_id)
                    idxs.append(i * every_nth)
                    digests.append(
                        hashlib.sha256(b + i.to_bytes(4, "big")).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_sha256": digests}
            )

    return df.select(id_col, payload_col).mapInPandas(run, FRAMES_SCHEMA)


VIDEO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("fps", T.DoubleType(), False),
        T.StructField("features", T.ArrayType(T.FloatType(), False), False),
    ]
)


def video_frame_features(
    df: DataFrame,
    every_nth: int = 1,
    max_frames: int = 8,
    dim: int = 8,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    strict: bool = False,
) -> DataFrame:
    """REAL end-to-end video feature extraction (round 5): AVI container
    walk (``operators/avi.py``) + per-frame MJPEG decode
    (``operators/jpeg.py``) + the same pixel-moment features as
    ``decode_image_features`` — one output row per sampled frame. The
    full video path a training-data pipeline needs (demux, frame
    sample, decode, featurize) with zero external dependencies.
    Non-AVI containers / non-JPEG frame codecs: strict=True raises,
    strict=False emits digest-fake features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .avi import parse_avi

        for pdf in batches:
            ids, idxs, counts, fpss, feats = [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                if not (b[:4] == b"RIFF" and b[8:12] == b"AVI "):
                    if strict:
                        raise NotImplementedError(
                            "no pure-python demuxer for this container"
                        )
                    ids.append(doc_id)
                    idxs.append(0)
                    counts.append(0)
                    fpss.append(0.0)
                    feats.append(_fake_decode(b, dim))
                    continue
                meta = parse_avi(b)
                picked = meta["frames"][:: max(every_nth, 1)][:max_frames]
                for i, fr in enumerate(picked):
                    img = decode_image(fr)
                    if img is None:
                        if strict:
                            raise NotImplementedError(
                                "frame codec needs an external decoder"
                            )
                        f = _fake_decode(fr, dim)
                    else:
                        f = _image_features(img, dim)
                    ids.append(doc_id)
                    idxs.append(i * every_nth)
                    counts.append(meta["n_frames"])
                    fpss.append(float(meta["fps"]))
                    feats.append(f)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "n_frames": counts,
                    "fps": fpss,
                    "features": feats,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, VIDEO_FEATURES_SCHEMA)
