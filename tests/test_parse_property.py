"""Property-based round-trip tests (SURVEY.md §5.2.4, Q31 shape).

Random channel lists -> packed wire string -> Catalyst parse -> equals
the original values under the reference's documented transforms
(MHz->Hz, kHz->Hz, OFDM SNR correction).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from mb8600_clickhouse_spark import parse

MODULATIONS = ["QAM256", "QAM64", "OFDM PLC"]

channel_st = st.fixed_dictionaries(
    {
        "modulation": st.sampled_from(MODULATIONS),
        "channel_id": st.integers(min_value=0, max_value=255),
        # one-decimal floats keep str() representation exact in float32
        "freq_mhz": st.integers(min_value=100, max_value=9000).map(lambda x: x / 10.0),
        "power": st.integers(min_value=-150, max_value=150).map(lambda x: x / 10.0),
        "snr": st.integers(min_value=0, max_value=500).map(lambda x: x / 10.0),
        "corrected": st.integers(min_value=-(2**40), max_value=2**40),
        "uncorrected": st.integers(min_value=-(2**40), max_value=2**40),
    }
)


def expected_snr(modulation: str, snr: float) -> float:
    return snr * 2.5 if (modulation == "OFDM PLC" and snr < 20.0) else snr


def pack_ds(ch: dict) -> str:
    return (
        f"1^Locked^{ch['modulation']}^{ch['channel_id']}^{ch['freq_mhz']}"
        f"^{ch['power']}^{ch['snr']}^{ch['corrected']}^{ch['uncorrected']}^x"
    )


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(channel_st, min_size=1, max_size=8))
def test_downstream_roundtrip(spark, channels):
    raw = "|+|".join(pack_ds(c) for c in channels)
    df = spark.createDataFrame([Row(raw=raw)])
    parsed = df.select(parse.parse_downstream(F.col("raw")).alias("ch")).first()["ch"]
    assert len(parsed) == len(channels)
    for got, want in zip(parsed, channels):
        assert got.channel_id == want["channel_id"]
        assert got.modulation == want["modulation"]
        assert got.frequency == pytest.approx(want["freq_mhz"] * 1e6, rel=1e-6)
        assert got.power == pytest.approx(want["power"], rel=1e-6)
        assert got.snr == pytest.approx(expected_snr(want["modulation"], want["snr"]), rel=1e-6)
        assert got.corrected_errors == want["corrected"]
        assert got.uncorrected_errors == want["uncorrected"]


uptime_st = st.fixed_dictionaries(
    {
        "days": st.one_of(st.none(), st.integers(min_value=0, max_value=999)),
        "hours": st.one_of(st.none(), st.integers(min_value=0, max_value=23)),
        "minutes": st.one_of(st.none(), st.integers(min_value=0, max_value=59)),
        "seconds": st.one_of(st.none(), st.integers(min_value=0, max_value=59)),
    }
)


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(uptime_st)
def test_uptime_any_subset_of_groups(spark, parts):
    raw = ""
    if parts["days"] is not None:
        raw += f"{parts['days']}days "
    if parts["hours"] is not None:
        raw += f"{parts['hours']:02d}h:"
    if parts["minutes"] is not None:
        raw += f"{parts['minutes']:02d}m:"
    if parts["seconds"] is not None:
        raw += f"{parts['seconds']:02d}s"
    want = (
        (parts["days"] or 0) * 86400
        + (parts["hours"] or 0) * 3600
        + (parts["minutes"] or 0) * 60
        + (parts["seconds"] or 0)
    )
    df = spark.createDataFrame([Row(raw=raw)])
    got = df.select(parse.parse_uptime(F.col("raw")).alias("s")).first()["s"]
    assert got == want
