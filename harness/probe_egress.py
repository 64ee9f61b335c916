"""ClickHouse egress sink throughput probe (round 5): measure
`sinks.ClickHouseHttpSink` end-to-end against a local HTTP endpoint —
TSV rendering + chunked executor POSTs — so the egress path's posture
is a number, not a guess.

Usage: python -m harness.probe_egress [n_rows]
"""

from __future__ import annotations

import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import functions as F

from mb8600_clickhouse_spark.session import get_spark
from mb8600_clickhouse_spark.sinks.clickhouse import ClickHouseHttpSink

_bytes = [0]
_posts = [0]
_lock = threading.Lock()


class _H(BaseHTTPRequestHandler):
    def do_POST(self):  # noqa: N802
        n = int(self.headers["Content-Length"])
        self.rfile.read(n)
        with _lock:
            _bytes[0] += n
            _posts[0] += 1
        self.send_response(200)
        self.end_headers()

    def log_message(self, *a):
        pass


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark("probe-egress")
    df = (
        spark.range(n)
        .select(
            F.lit("mb8600").alias("modem_name"),
            F.lit("cfg.bin").alias("modem_config_filename"),
            (F.col("id") % 100000).alias("modem_uptime"),
            F.lit("8600-19.2.18").alias("modem_version"),
            F.lit("MB8600").alias("modem_model"),
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("channel_id"),
                        (F.lit(549000000.0) + F.col("id")).alias("frequency"),
                        F.lit("QAM256").alias("modulation"),
                        F.lit(1.5).alias("power"),
                        F.lit(43.0).alias("snr"),
                        (F.col("id") % 1000).alias("corrected_errors"),
                        F.lit(0).alias("uncorrected_errors"),
                    )
                    for c in range(4)
                ]
            ).alias("downstream_channels"),
            F.array(
                F.struct(
                    F.lit(4).alias("channel_id"),
                    F.lit(23800000.0).alias("frequency"),
                    F.lit("SC-QAM").alias("modulation"),
                    F.lit(46.0).alias("power"),
                    F.lit(6400000.0).alias("width"),
                )
            ).alias("upstream_channels"),
            F.lit(0.25).alias("scrape_latency"),
            F.to_timestamp(F.lit("2026-03-02 14:00:00")).alias("timestamp"),
        )
        .repartition(8)
        .localCheckpoint(eager=True)  # pre-materialize: probe times egress only
    )
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    sink = ClickHouseHttpSink(
        url=f"http://127.0.0.1:{srv.server_port}", table="docsis", batch_rows=10_000
    )
    t0 = time.perf_counter()
    sink.write_batch(df)
    dt = time.perf_counter() - t0
    srv.shutdown()
    mb = _bytes[0] / 1e6
    print(
        f"| egress {n} docsis rows | {dt:.2f}s | {n/dt:,.0f} rows/s | "
        f"{mb/dt:.1f} MB/s wire | {_posts[0]} POSTs |"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
