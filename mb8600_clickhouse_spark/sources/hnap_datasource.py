"""HNAP poll source as a first-class Spark 4 Python DataSource.

``spark.readStream.format("hnap")`` becomes a real streaming source:
each micro-batch polls the modem once and emits one payload record
(SURVEY.md §2.A1 — the reference's scrape loop, ``mb8600.py:313-443``,
re-expressed as a checkpointable source instead of a hand-rolled loop).

Built on ``SimpleDataSourceStreamReader``, which executes on the driver —
exactly right for a low-rate poll source (one HTTP round trip per
trigger; the reference polls every 10s, ``mb8600.py:109``). Offsets are
poll sequence numbers, so a restarted query resumes at its checkpointed
count and `readBetweenOffsets` replays are deterministic for the fake
transport (at-least-once against a live modem, where a true replay is
physically impossible — the modem's state moved on; documented
deviation, same as every at-source-replay poll connector).

Options:

- ``modem_url``, ``username``, ``password``: live-modem connection (the
  transport is urllib-based and only imported when used);
- ``fake="true"`` (default when no URL): a deterministic synthetic modem
  generating valid packed channel strings — the test/CI path, and the
  same payload shape the parse pipeline (streaming/ingest.py) consumes.
"""

from __future__ import annotations

import json
from typing import Iterator, Tuple

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

PAYLOAD_DDL = "modem_name string, payload string, scrape_latency double, ts double"


def fake_payload(seq: int, modem_name: str) -> dict:
    """Deterministic synthetic HNAP envelope for poll #``seq`` — valid
    wire format (10-field ^-packed downstream records, 8-field upstream,
    reference mb8600.py:370-371, :390-391)."""
    ds = "|+|".join(
        f"{i}^Locked^{'OFDM PLC' if i == 4 else 'QAM256'}^{i}^"
        f"{489.0 + 6 * i}^{1.0 + (seq % 7) / 10.0}^"
        f"{15.0 if i == 4 else 40.0 + (seq + i) % 5}^{seq * 10 + i}^{seq + i}^x"
        for i in range(1, 5)
    )
    us = "|+|".join(
        f"{i}^Locked^SC-QAM^{i}^6400.0^{35.6 + i}^{45.0 + (seq % 3)}^x"
        for i in range(1, 3)
    )
    uptime_s = 86400 * 2 + seq * 10
    d, rem = divmod(uptime_s, 86400)
    h, rem = divmod(rem, 3600)
    m, sec = divmod(rem, 60)
    return {
        "GetMultipleHNAPsResponse": {
            "GetMultipleHNAPsResult": "OK",
            "GetMotoStatusStartupSequenceResponse": {
                "MotoConnConfigurationFileComment": "bc1000.cm"
            },
            "GetMotoStatusConnectionInfoResponse": {
                "MotoConnSystemUpTime": f"{d}days {h:02d}h:{m:02d}m:{sec:02d}s"
            },
            "GetMotoStatusDownstreamChannelInfoResponse": {
                "MotoConnDownstreamChannel": ds
            },
            "GetMotoStatusUpstreamChannelInfoResponse": {"MotoConnUpstreamChannel": us},
            "GetMotoStatusSoftwareResponse": {"StatusSoftwareSfVer": "8600-19.2.18"},
        }
    }


class HnapStreamReader(SimpleDataSourceStreamReader):
    """One poll per micro-batch; offset = number of polls completed."""

    BASE_TS = 1_748_736_000.0  # deterministic epoch base for the fake modem

    def __init__(self, options: dict):
        self.modem_name = options.get("modem_name", "MB8600")
        self.fake = options.get("fake", "true").lower() == "true" or not options.get(
            "modem_url"
        )
        self.options = options
        self._session = None

    def initialOffset(self) -> dict:
        return {"polls": 0}

    def _poll(self, seq: int) -> Tuple[str, float, float]:
        if self.fake:
            return json.dumps(fake_payload(seq, self.modem_name)), 0.25, (
                self.BASE_TS + 10.0 * seq
            )
        import time as _time
        import urllib.request

        from .hnap import HnapSession

        if self._session is None:
            def transport(url, headers, cookies, body):
                req = urllib.request.Request(
                    url,
                    data=json.dumps(body).encode(),
                    headers={
                        **headers,
                        "Content-Type": "application/json",
                        "Cookie": "; ".join(f"{k}={v}" for k, v in cookies.items()),
                    },
                )
                with urllib.request.urlopen(req, timeout=30) as resp:
                    # modem serves JSON as text/html (mb8600.py:351)
                    return json.loads(resp.read())

            self._session = HnapSession(
                base_url=self.options["modem_url"],
                username=self.options.get("username", "admin"),
                password=self.options.get("password", ""),
                transport=transport,
            )
        t0 = _time.perf_counter()
        payload = self._session.poll_status()
        return json.dumps(payload), _time.perf_counter() - t0, _time.time()

    def read(self, start: dict) -> Tuple[Iterator[tuple], dict]:
        seq = start["polls"]
        payload, latency, ts = self._poll(seq)
        return iter([(self.modem_name, payload, latency, ts)]), {"polls": seq + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # replay for recovery: deterministic for the fake modem;
        # re-polls (at-least-once, fresh data) against a live one
        rows = []
        for seq in range(start["polls"], end["polls"]):
            payload, latency, ts = self._poll(seq)
            rows.append((self.modem_name, payload, latency, ts))
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass


class HnapDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "hnap"

    def schema(self) -> str:
        return PAYLOAD_DDL

    def simpleStreamReader(self, schema) -> HnapStreamReader:
        return HnapStreamReader(self.options)


def register(spark) -> None:
    """Make ``format("hnap")`` available in this session."""
    spark.dataSource.register(HnapDataSource)
