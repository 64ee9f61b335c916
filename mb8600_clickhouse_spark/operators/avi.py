"""AVI (RIFF) container parsing + MJPEG video synthesis — pure stdlib.

The video analogue of ``operators/jpeg.py``/``flac.py``: an AVI file is
a RIFF tree (same chunk grammar as WAV — compare
``multimodal.decode_wav``) whose ``movi`` LIST carries one chunk per
frame; in an MJPEG AVI each ``00dc`` chunk is a complete baseline JPEG.
Parsing the container is therefore exact and cheap, and per-frame
decode composes with ``jpeg.decode_jpeg`` — giving a REAL video path
(container walk + frame sample + pixel decode) with no external codec.

``encode_avi_mjpeg`` synthesizes a minimal-but-valid MJPEG AVI
(``hdrl`` with avih + one video ``strl``, ``movi`` with ``00dc``
chunks, ``idx1`` index) for fixtures and tests. Codecs beyond MJPEG
(H.264 etc.) are out of pure-python reach by design — the strict path
raises for them at the frame-decode step.
"""

from __future__ import annotations

import struct as _struct


def _chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) walking a RIFF chunk run;
    chunks are word-aligned (same rule as WAV's walker)."""
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        size = _struct.unpack_from("<I", data, pos + 4)[0]
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)


def parse_avi(payload: bytes) -> dict:
    """Parse an AVI payload: returns {"width", "height", "fps",
    "n_frames", "frames": [bytes, ...]} where frames are the raw codec
    payloads (complete JPEGs for MJPEG)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    width = height = 0
    usec_per_frame = 0
    rate = scale = 0
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal width, height, usec_per_frame, rate, scale
        for cid, body, size in _chunks(payload, pos, end):
            if cid == b"LIST":
                walk(body + 4, body + size)  # skip the list type fourcc
            elif cid == b"avih":
                usec_per_frame = _struct.unpack_from("<I", payload, body)[0]
                width, height = _struct.unpack_from("<II", payload, body + 32)
            elif cid == b"strh":
                fcc_type = payload[body : body + 4]
                if fcc_type == b"vids":
                    scale, rate = _struct.unpack_from("<II", payload, body + 20)
            elif cid[2:4] in (b"dc", b"db"):
                frames.append(payload[body : body + size])

    walk(12, len(payload))
    if rate and scale:
        fps = rate / scale
    elif usec_per_frame:
        fps = 1_000_000 / usec_per_frame
    else:
        fps = 0.0
    return {
        "width": width,
        "height": height,
        "fps": fps,
        "n_frames": len(frames),
        "frames": frames,
    }


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 30
) -> bytes:
    """Wrap pre-encoded JPEG frames in a minimal valid MJPEG AVI."""

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + _struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    usec = 1_000_000 // fps
    avih = _struct.pack(
        "<IIIIIIIIIIIIII",
        usec, 0, 0, 0x10, len(frames), 0, 1, 0, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + _struct.pack(
            "<IHHIIIIIIII",
            0, 0, 0, 0, 1, fps, 0, len(frames), 0, 0xFFFFFFFF, 0,
        )
        + _struct.pack("<4H", 0, 0, width, height)
    )
    strf = _struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame (offset relative to movi list body start)
    off = 4
    entries = []
    for f in frames:
        entries.append(b"00dc" + _struct.pack("<III", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) & 1)
    idx1 = chunk(b"idx1", b"".join(entries))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + _struct.pack("<I", len(riff_body)) + riff_body
