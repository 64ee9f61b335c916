"""The HNAP Python DataSource: format("hnap") must stream payload
records that the ingest parse path turns into valid docsis rows."""

from __future__ import annotations

import time

import pytest

from mb8600_clickhouse_spark.sources import hnap_datasource
from mb8600_clickhouse_spark.streaming import ingest


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    hnap_datasource.register(spark)


def _run_polls(spark, tmp_path, name: str, min_rows: int, transform=None):
    src = (
        spark.readStream.format("hnap")
        .option("modem_name", "MB8600-test")
        .load()
    )
    if transform is not None:
        src = transform(src)
    q = (
        src.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 60
    while spark.table(name).count() < min_rows and time.time() < deadline:
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(30)
    return spark.table(name)


def test_stream_emits_one_record_per_poll(spark, tmp_path):
    got = _run_polls(spark, tmp_path, "hnap_raw", min_rows=3)
    rows = got.collect()
    assert len(rows) >= 3
    assert {r["modem_name"] for r in rows} == {"MB8600-test"}
    # monotone poll timestamps, 10s apart (deterministic fake modem)
    ts = sorted(r["ts"] for r in rows)
    assert ts[1] - ts[0] == pytest.approx(10.0)


def test_stream_parses_to_docsis_rows(spark, tmp_path):
    got = _run_polls(
        spark, tmp_path, "hnap_parsed", min_rows=2, transform=ingest.parse_payloads
    )
    rows = got.collect()
    assert len(rows) >= 2
    r = sorted(rows, key=lambda r: r["timestamp"])[0]
    assert r["modem_model"] == "MB8600"
    assert len(r["downstream_channels"]) == 4
    assert len(r["upstream_channels"]) == 2
    assert r["modem_uptime"] >= 2 * 86400
    # channel 4 is OFDM PLC with raw SNR 15.0 < 20 -> corrected x2.5
    by_id = {c["channel_id"]: c for c in r["downstream_channels"]}
    assert by_id[4]["modulation"] == "OFDM PLC"
    assert by_id[4]["snr"] == pytest.approx(15.0 * 2.5)
    assert by_id[1]["modulation"] == "QAM256"
