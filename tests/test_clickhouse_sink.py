"""Wire-compatible ClickHouse egress (sinks/clickhouse.py): TSV
rendering exactness, retry/chunking behavior against a fake transport,
and a real end-to-end Spark foreachPartition write into a local HTTP
server standing in for ClickHouse's 8123 interface."""

from __future__ import annotations

import datetime as dt
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import Row

from mb8600_clickhouse_spark.sinks.clickhouse import (
    ClickHouseHttpSink,
    DOCSIS_COLUMNS,
    insert_query,
    row_to_tsv,
    tsv_value,
)


class TestTsvRendering:
    def test_scalars(self):
        assert tsv_value(None) == "\\N"
        assert tsv_value(True) == "1" and tsv_value(False) == "0"
        assert tsv_value(42) == "42"
        assert tsv_value(1.5) == "1.5"
        assert tsv_value(dt.datetime(2026, 3, 2, 14, 37, 11)) == "2026-03-02 14:37:11"
        assert tsv_value(dt.date(2026, 3, 2)) == "2026-03-02"

    def test_string_escaping_top_level_vs_nested(self):
        s = "a\tb\nc\\d'e"
        assert tsv_value(s) == "a\\tb\\nc\\\\d'e"  # unquoted at top level
        assert tsv_value(s, nested=True) == "'a\\tb\\nc\\\\d\\'e'"  # quoted inside

    def test_array_of_struct_renders_as_array_of_tuples(self):
        chans = [
            Row(channel_id=1, frequency=549000000.0, modulation="QAM256"),
            Row(channel_id=2, frequency=555000000.0, modulation="QAM256"),
        ]
        assert tsv_value(chans) == (
            "[(1,549000000.0,'QAM256'),(2,555000000.0,'QAM256')]"
        )

    def test_null_inside_composite(self):
        assert tsv_value([None, "x"]) == "[NULL,'x']"

    def test_row_to_tsv_follows_column_order(self):
        row = Row(b="two", a=1)
        assert row_to_tsv(row, ["a", "b"]) == "1\ttwo"

    def test_insert_query_is_reference_shaped(self):
        q = insert_query("docsis", DOCSIS_COLUMNS)
        assert q.startswith("INSERT INTO docsis (modem_name, ")
        assert q.endswith("timestamp) FORMAT TabSeparated")
        assert len(DOCSIS_COLUMNS) == 9  # mb8600.py:426's column list


class _FakeTransport:
    """Records posts; fails the first `fail_n` calls."""

    def __init__(self, fail_n: int = 0):
        self.calls: list[tuple[str, bytes, dict]] = []
        self.fail_n = fail_n

    def __call__(self, url, body, headers, timeout):
        self.calls.append((url, body, headers))
        if len(self.calls) <= self.fail_n:
            return 500, "simulated failure"
        return 200, ""


class TestSinkBehavior:
    def _sink(self, transport, **kw):
        return ClickHouseHttpSink(
            url="http://ch:8123",
            table="docsis",
            columns=["a", "b"],
            transport=transport,
            backoff_s=0.0,
            **kw,
        )

    def test_chunking(self):
        t = _FakeTransport()
        self._sink(t, batch_rows=2).write_partition(
            iter([Row(a=i, b=f"r{i}") for i in range(5)])
        )
        assert [c[1] for c in t.calls] == [
            b"0\tr0\n1\tr1\n",
            b"2\tr2\n3\tr3\n",
            b"4\tr4\n",
        ]

    def test_query_string_and_auth_headers(self):
        t = _FakeTransport()
        sink = ClickHouseHttpSink(
            url="http://ch:8123",
            table="docsis",
            columns=["a"],
            transport=t,
            user="u",
            password="p",
            backoff_s=0.0,
        )
        sink.write_partition(iter([Row(a=1)]))
        url, _body, headers = t.calls[0]
        qs = urllib.parse.parse_qs(urllib.parse.urlparse(url).query)
        assert qs["query"] == ["INSERT INTO docsis (a) FORMAT TabSeparated"]
        assert headers["X-ClickHouse-User"] == "u"
        assert headers["X-ClickHouse-Key"] == "p"

    def test_retry_then_success(self):
        t = _FakeTransport(fail_n=2)
        self._sink(t).write_partition(iter([Row(a=1, b="x")]))
        assert len(t.calls) == 3  # 2 failures + 1 success

    def test_exhausted_retries_raise_not_drop(self):
        """The reference drops the row after an insert error
        (mb8600.py:308-311, at-most-once); this sink must RAISE so the
        task retries — at-least-once, never silent loss."""
        t = _FakeTransport(fail_n=99)
        with pytest.raises(RuntimeError, match="after 3 attempts"):
            self._sink(t, max_retries=3).write_partition(iter([Row(a=1, b="x")]))
        assert len(t.calls) == 3

    def test_empty_partition_posts_nothing(self):
        t = _FakeTransport()
        self._sink(t).write_partition(iter([]))
        assert t.calls == []


# ---------------------------------------------------------------------------
# end-to-end: executors POST to a local HTTP "ClickHouse"
# ---------------------------------------------------------------------------
_received: list[bytes] = []
_lock = threading.Lock()


class _ChHandler(BaseHTTPRequestHandler):
    def do_POST(self):  # noqa: N802 (http.server API)
        body = self.rfile.read(int(self.headers["Content-Length"]))
        with _lock:
            _received.append(body)
        self.send_response(200)
        self.end_headers()

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def ch_server():
    _received.clear()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _ChHandler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


class TestEndToEnd:
    def test_docsis_shaped_batch_egress(self, spark, ch_server):
        """The reference sink's exact 9-column docsis shape, written
        distributed (foreachPartition on executors) into the local
        HTTP endpoint; every row arrives exactly once."""
        rows = [
            Row(
                modem_name="mb8600",
                modem_config_filename=None if i % 2 else "cfg.bin",
                modem_uptime=3600 * i,
                modem_version="8600-19.2.18",
                modem_model="MB8600",
                downstream_channels=[
                    Row(
                        channel_id=1,
                        frequency=549000000.0,
                        modulation="QAM256",
                        power=1.5,
                        snr=43.0,
                        corrected_errors=10 + i,
                        uncorrected_errors=0,
                    )
                ],
                upstream_channels=[
                    Row(
                        channel_id=4,
                        frequency=23800000.0,
                        modulation="SC-QAM",
                        power=46.0,
                        width=6400000.0,
                    )
                ],
                scrape_latency=0.25,
                timestamp=dt.datetime(2026, 3, 2, 14, 0, i),
            )
            for i in range(7)
        ]
        df = spark.createDataFrame(rows).repartition(3)
        sink = ClickHouseHttpSink(url=ch_server, table="docsis", batch_rows=2)
        sink.write_batch(df)

        lines = sorted(
            line
            for body in _received
            for line in body.decode().splitlines()
            if line
        )
        assert len(lines) == 7
        expected = sorted(row_to_tsv(r, DOCSIS_COLUMNS) for r in rows)
        assert lines == expected
        # spot-check the wire shape of one line
        sample = lines[0]
        assert "[(1,549000000.0,'QAM256'," in sample
        assert "\\N" in "".join(lines)  # the None config filename

    def test_foreach_batch_adapter(self, spark, ch_server):
        sink = ClickHouseHttpSink(
            url=ch_server, table="t", columns=["v"], batch_rows=100
        )
        df = spark.createDataFrame([Row(v=i) for i in range(4)])
        sink.foreach_batch()(df, 0)
        got = sorted(
            int(x)
            for body in _received
            for x in body.decode().split()
        )
        assert got == [0, 1, 2, 3]
