"""Wire-compatible ClickHouse egress over the HTTP interface.

The reference deployment's sink INSERTs scrape rows into the ``docsis``
ClickHouse table (``mb8600.py:294-311`` consumer task; the 9-column
INSERT string at ``mb8600.py:426``; DDL ``tables.sql:5-30``). The
engine's native landing path is its own ManifestTable
(``docs/MIGRATION.md``), but a user running both systems side by side
needs a writer that speaks ClickHouse's wire — this module provides it
without any client library: plain HTTP POSTs of
``INSERT INTO t (cols) FORMAT TabSeparated`` bodies, rendered with
ClickHouse's exact TSV escaping rules (including nested
array-of-tuple values for the ``Array(Nested(...))`` channel columns).

Execution model — Spark-first, not a driver loop:

- ``write_batch(df, sink)`` ships the sink config (a small picklable
  object) to every partition via ``foreachPartition``; each executor
  POSTs its own rows in ``batch_rows`` chunks. No collect, no driver
  bottleneck — egress bandwidth scales with the cluster exactly like
  the reference's asyncio queue never could.
- ``sink.foreach_batch()`` adapts the same writer to Structured
  Streaming's ``writeStream.foreachBatch`` for the live scrape path.

Delivery semantics — deliberate IMPROVEMENT over the reference, which
logs + sleeps 5 s + drops the row on insert failure (at-most-once,
silent data loss, ``mb8600.py:308-311``): here a failed POST retries
with exponential backoff and then RAISES, so Spark retries the task —
at-least-once. Pair with a ReplicatedMergeTree target (identical
insert-block dedup) or an idempotency-keyed table for effective
exactly-once; the trade is documented, not silent.

The HTTP transport is injectable exactly like ``sources/hnap.py``'s —
tests run against a fake or a local ``http.server`` without a
ClickHouse instance (this container has none). TLS verification stays
ON by default for https URLs.
"""

from __future__ import annotations

import datetime as dt
import io
import time
import urllib.parse
import urllib.request
from dataclasses import dataclass, field
from decimal import Decimal
from typing import Any, Callable, Iterable, Iterator, Sequence

#: the reference sink's column list, verbatim (mb8600.py:426)
DOCSIS_COLUMNS: tuple[str, ...] = (
    "modem_name",
    "modem_config_filename",
    "modem_uptime",
    "modem_version",
    "modem_model",
    "downstream_channels",
    "upstream_channels",
    "scrape_latency",
    "timestamp",
)

# ---------------------------------------------------------------------------
# ClickHouse TabSeparated rendering
# ---------------------------------------------------------------------------
_TOP_ESCAPES = {"\\": "\\\\", "\t": "\\t", "\n": "\\n", "\r": "\\r"}
_QUOTED_ESCAPES = {**_TOP_ESCAPES, "'": "\\'"}


def _escape(s: str, table: dict[str, str]) -> str:
    return "".join(table.get(ch, ch) for ch in s)


def tsv_value(v: Any, nested: bool = False) -> str:
    """Render one value in ClickHouse TabSeparated syntax.

    Top-level strings are escaped but unquoted; strings INSIDE composite
    values (arrays/tuples) are single-quoted with backslash escapes —
    ClickHouse's documented TSV rules. NULL is ``\\N`` at top level and
    ``NULL`` inside composites. Spark Rows / dicts render as tuples
    (the wire shape of a Nested element), lists as arrays."""
    if v is None:
        return "NULL" if nested else "\\N"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, (int, float, Decimal)):
        return repr(v) if isinstance(v, float) else str(v)
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        v = bytes(v).decode("latin-1")
    if isinstance(v, str):
        if nested:
            return "'" + _escape(v, _QUOTED_ESCAPES) + "'"
        return _escape(v, _TOP_ESCAPES)
    # Spark Row -> tuple rendering (Nested element); asDict is the
    # public Row accessor and dicts keep insertion (schema) order
    if hasattr(v, "asDict"):
        vals = list(v.asDict().values())
        return "(" + ",".join(tsv_value(x, nested=True) for x in vals) + ")"
    if isinstance(v, dict):
        return "(" + ",".join(tsv_value(x, nested=True) for x in v.values()) + ")"
    if isinstance(v, (list, tuple)):
        if isinstance(v, tuple):
            return "(" + ",".join(tsv_value(x, nested=True) for x in v) + ")"
        return "[" + ",".join(tsv_value(x, nested=True) for x in v) + "]"
    raise TypeError(f"no ClickHouse TSV rendering for {type(v).__name__}")


def row_to_tsv(row: Any, columns: Sequence[str]) -> str:
    """One TabSeparated line for `row` (a Spark Row / mapping) in
    `columns` order."""
    return "\t".join(tsv_value(row[c]) for c in columns)


def insert_query(table: str, columns: Sequence[str]) -> str:
    """The INSERT statement the HTTP body's rows attach to — same shape
    as the reference's (mb8600.py:426), FORMAT TabSeparated."""
    return f"INSERT INTO {table} ({', '.join(columns)}) FORMAT TabSeparated"


def _default_transport(
    url: str, body: bytes, headers: dict[str, str], timeout: float
) -> tuple[int, str]:
    req = urllib.request.Request(url, data=body, headers=headers, method="POST")
    # TLS verification stays ON (urlopen default) — reversing the
    # reference's verify=False posture, same as sources/hnap.py
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status, resp.read().decode("utf-8", "replace")


@dataclass
class ClickHouseHttpSink:
    """Picklable egress config + the partition writer.

    ``transport`` must be a picklable callable
    ``(url, body_bytes, headers, timeout) -> (status, body_text)``;
    None selects the stdlib urllib transport on each executor."""

    url: str  # e.g. "http://clickhouse:8123"
    table: str
    columns: Sequence[str] = DOCSIS_COLUMNS
    user: str | None = None
    password: str | None = None
    batch_rows: int = 10_000
    max_retries: int = 5
    backoff_s: float = 0.5
    timeout_s: float = 30.0
    transport: Callable[..., tuple[int, str]] | None = None
    settings: dict[str, str] = field(default_factory=dict)

    # -- wire plumbing -----------------------------------------------------
    def _endpoint(self) -> str:
        params = {"query": insert_query(self.table, self.columns), **self.settings}
        return f"{self.url.rstrip('/')}/?{urllib.parse.urlencode(params)}"

    def _headers(self) -> dict[str, str]:
        h = {"Content-Type": "text/tab-separated-values"}
        if self.user is not None:
            h["X-ClickHouse-User"] = self.user
        if self.password is not None:
            h["X-ClickHouse-Key"] = self.password
        return h

    def _post(self, body: bytes) -> None:
        send = self.transport or _default_transport
        endpoint, headers = self._endpoint(), self._headers()
        last: Exception | None = None
        for attempt in range(self.max_retries):
            try:
                status, text = send(endpoint, body, headers, self.timeout_s)
                if status == 200:
                    return
                last = RuntimeError(f"ClickHouse HTTP {status}: {text[:500]}")
                if 400 <= status < 500:
                    # 4xx (parse/auth/schema) is deterministic — the
                    # same body fails the same way; retrying burns the
                    # whole backoff schedule for nothing
                    break
            except Exception as e:  # noqa: BLE001 — network errors retry
                last = e
            if attempt + 1 < self.max_retries:  # no sleep after the last try
                time.sleep(self.backoff_s * (2**attempt))
        # raise -> Spark retries the task: at-least-once, never the
        # reference's silent drop (mb8600.py:308-311)
        raise RuntimeError(
            f"ClickHouse insert failed after {self.max_retries} attempts"
        ) from last

    # -- Spark integration ---------------------------------------------------
    def write_partition(self, rows: Iterator[Any]) -> None:
        """foreachPartition body: stream the partition out in
        ``batch_rows``-line POSTs — bounded memory per executor."""
        buf = io.StringIO()
        n = 0
        for row in rows:
            buf.write(row_to_tsv(row, self.columns))
            buf.write("\n")
            n += 1
            if n >= self.batch_rows:
                self._post(buf.getvalue().encode("utf-8"))
                buf, n = io.StringIO(), 0
        if n:
            self._post(buf.getvalue().encode("utf-8"))

    def write_batch(self, df) -> None:
        """Distributed batch egress: executor-parallel POSTs, no driver
        collect. Column selection is explicit so the INSERT column list
        and the row order always agree."""
        df.select(*self.columns).foreachPartition(self.write_partition)

    def foreach_batch(self) -> Callable[[Any, int], None]:
        """Adapter for ``writeStream.foreachBatch(...)`` — the streaming
        scrape path (reference A5 surface) egressing to ClickHouse."""

        def _fn(batch_df, _epoch_id: int) -> None:
            self.write_batch(batch_df)

        return _fn
