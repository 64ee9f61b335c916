"""WARC (Web ARChive, ISO 28500) record parsing — the container format
web corpora actually arrive in (Common Crawl ships WARC/WAT/WET): the
ingestion step BEFORE q146's HTML extraction and q131's URL curation.

Pure-Python byte framing over Arrow batches (``mapInPandas``): WARC is
version line + CRLF headers + ``Content-Length`` octets + CRLF CRLF,
concatenated — so record splitting is exact length-directed slicing,
never a regex over the payload (bodies legally contain ``WARC/1.0``).
Per the q71/q77 posture: payloads never shuffle; only the parsed
columns leave the scan.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

#: (doc_id, rec_idx, warc_type, url, status, body)
WARC_SCHEMA = (
    "doc_id long, rec_idx int, warc_type string, url string, "
    "status int, body string"
)


def parse_warc_bytes(payload: bytes) -> list[dict]:
    """Parse one WARC file's bytes into records. Returns dicts with
    ``warc_type``, ``url`` (WARC-Target-URI or ''), ``status`` (HTTP
    status for response records, None otherwise) and ``body`` (the
    HTTP payload for responses, the raw block otherwise, utf-8 with
    replacement). Length-directed: Content-Length frames each block;
    the inter-record CRLF CRLF is skipped by scanning to the next
    version line. Raises ValueError on a missing/invalid
    Content-Length (truncated captures should fail loudly, not
    silently mis-frame every later record)."""
    records: list[dict] = []
    i = 0
    while True:
        # any WARC/x.y version line — 1.0 and 1.1 (ISO 28500:2017) share
        # the frame layout; an unrecognized major version fails loudly
        # rather than parsing to zero records (the find starts past the
        # previous record's length-framed block, so body bytes that
        # happen to contain 'WARC/' are never scanned)
        j = payload.find(b"WARC/", i)
        if j < 0:
            break
        if payload[j : j + 7] != b"WARC/1.":
            ver = payload[j : j + 8].decode("ascii", "replace")
            raise ValueError(f"unsupported WARC version line {ver!r}")
        hdr_end = payload.find(b"\r\n\r\n", j)
        if hdr_end < 0:
            raise ValueError("WARC header block missing CRLF CRLF terminator")
        headers: dict[str, str] = {}
        for line in payload[j:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError(f"WARC record without valid Content-Length: {exc}")
        block = payload[hdr_end + 4 : hdr_end + 4 + clen]
        if len(block) < clen:
            raise ValueError("WARC record truncated before Content-Length")
        wtype = headers.get("warc-type", "")
        url = headers.get("warc-target-uri", "")
        status = None
        body = block
        if wtype == "response" and block[:5] == b"HTTP/":
            sp = block.split(b"\r\n\r\n", 1)
            status_line = sp[0].split(b"\r\n", 1)[0].split(b" ")
            if len(status_line) >= 2 and status_line[1].isdigit():
                status = int(status_line[1])
            body = sp[1] if len(sp) > 1 else b""
        records.append(
            {
                "warc_type": wtype,
                "url": url,
                "status": status,
                "body": body.decode("utf-8", "replace"),
            }
        )
        i = hdr_end + 4 + clen
    return records


def parse_warc(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Explode WARC payloads into one row per record (Arrow-batched).
    Output: (doc_id, rec_idx, warc_type, url, status, body). Compose
    with ``text.html_to_text`` (q146) and ``text.url_normalize``
    (q131) for the full crawl→corpus path. Zero shuffle — a pure
    flat-map over the payload scan."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "rec_idx": [], "warc_type": [], "url": [],
                "status": [], "body": [],
            }
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                for idx, rec in enumerate(parse_warc_bytes(bytes(p))):
                    out["doc_id"].append(did)
                    out["rec_idx"].append(idx)
                    out["warc_type"].append(rec["warc_type"])
                    out["url"].append(rec["url"])
                    out["status"].append(rec["status"])
                    out["body"].append(rec["body"])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "rec_idx": pd.Series(out["rec_idx"], dtype="int32"),
                    "warc_type": pd.Series(out["warc_type"], dtype="object"),
                    "url": pd.Series(out["url"], dtype="object"),
                    "status": pd.Series(out["status"], dtype="object"),
                    "body": pd.Series(out["body"], dtype="object"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(extract, WARC_SCHEMA)


def encode_warc_response(
    url: str, html: str, status: int = 200, reason: str = "OK"
) -> bytes:
    """Minimal WARC response record (test/fixture encoder — the round
    trip partner of ``parse_warc_bytes``)."""
    http = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: text/html\r\n\r\n"
    ).encode() + html.encode()
    hdr = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: " + url.encode() + b"\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n"
    )
    return hdr + b"\r\n" + http + b"\r\n\r\n"


def encode_warcinfo(info: str = "software: spark-engine") -> bytes:
    body = info.encode()
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n"
        b"\r\n" + body + b"\r\n\r\n"
    )
