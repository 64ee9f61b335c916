"""Unit tests for the parse path (SURVEY.md §2.B, §5.2.3).

Covers the reference's edge cases with hand-computed expectations:
OFDM SNR boundary (mb8600.py:372-376), uptime strings with missing
groups (the reference's int(None) crash at mb8600.py:404-410 — this
engine coalesces to 0), negative/wrapped error counters
(tables.sql:19), empty channel strings, and the MHz/kHz unit
conversions (mb8600.py:380,394,397).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mb8600_clickhouse_spark import parse


def _ds_record(
    modulation="QAM256",
    channel_id=3,
    freq_mhz=495.0,
    power=1.5,
    snr=43.2,
    corrected=17,
    uncorrected=4,
):
    # 10 ^-separated fields; positions per mb8600.py:371 (1-indexed 3..9 used)
    return f"1^Locked^{modulation}^{channel_id}^{freq_mhz}^{power}^{snr}^{corrected}^{uncorrected}^x"


def _us_record(modulation="SC-QAM", channel_id=1, width_khz=6400.0, freq_mhz=35.6, power=45.0):
    # 8 fields; positions per mb8600.py:391 (3..7 used)
    return f"1^Locked^{modulation}^{channel_id}^{width_khz}^{freq_mhz}^{power}^x"


def _parse_ds(spark, raw: str):
    df = spark.createDataFrame([Row(raw=raw)])
    return df.select(parse.parse_downstream(F.col("raw")).alias("ch")).first()["ch"]


def _parse_us(spark, raw: str):
    df = spark.createDataFrame([Row(raw=raw)])
    return df.select(parse.parse_upstream(F.col("raw")).alias("ch")).first()["ch"]


class TestDownstream:
    def test_single_channel_fields(self, spark):
        [ch] = _parse_ds(spark, _ds_record())
        assert ch.channel_id == 3
        assert ch.modulation == "QAM256"
        assert ch.frequency == pytest.approx(495.0e6)
        assert ch.power == pytest.approx(1.5)
        assert ch.snr == pytest.approx(43.2)
        assert ch.corrected_errors == 17
        assert ch.uncorrected_errors == 4

    def test_multi_record_split(self, spark):
        raw = "|+|".join(_ds_record(channel_id=i) for i in range(1, 5))
        chans = _parse_ds(spark, raw)
        assert [c.channel_id for c in chans] == [1, 2, 3, 4]

    def test_negative_wrapped_counters_preserved(self, spark):
        # tables.sql:19 — firmware overflow can yield negatives; keep signed
        [ch] = _parse_ds(spark, _ds_record(corrected=-123, uncorrected=-9999999999))
        assert ch.corrected_errors == -123
        assert ch.uncorrected_errors == -9999999999

    def test_malformed_fields_null_not_crash(self, spark):
        [ch] = _parse_ds(spark, "1^Locked^QAM256^notanint^x^x^x^x^x^x")
        assert ch.channel_id is None
        assert ch.frequency is None


class TestOfdmSnrCorrection:
    # mb8600.py:372-376: modulation=='OFDM PLC' and snr<20.0 -> snr*2.5
    @pytest.mark.parametrize(
        ("modulation", "snr_in", "snr_out"),
        [
            ("OFDM PLC", 19.9, 19.9 * 2.5),
            ("OFDM PLC", 5.0, 12.5),
            ("OFDM PLC", 20.0, 20.0),  # boundary: NOT corrected
            ("OFDM PLC", 43.0, 43.0),
            ("QAM256", 5.0, 5.0),  # wrong modulation: never corrected
        ],
    )
    def test_correction(self, spark, modulation, snr_in, snr_out):
        [ch] = _parse_ds(spark, _ds_record(modulation=modulation, snr=snr_in))
        assert ch.snr == pytest.approx(snr_out, rel=1e-6)


class TestUpstream:
    def test_fields_and_units(self, spark):
        [ch] = _parse_us(spark, _us_record())
        assert ch.channel_id == 1
        assert ch.modulation == "SC-QAM"
        assert ch.frequency == pytest.approx(35.6e6)  # MHz -> Hz
        assert ch.width == pytest.approx(6400.0e3)  # kHz -> Hz
        assert ch.power == pytest.approx(45.0)


class TestUptime:
    @pytest.mark.parametrize(
        ("raw", "seconds"),
        [
            ("7days 03h:21m:09s", 7 * 86400 + 3 * 3600 + 21 * 60 + 9),
            ("11h:02m:33s", 11 * 3600 + 2 * 60 + 33),
            # missing groups — the reference crashes here (mb8600.py:404-410)
            ("45m:10s", 45 * 60 + 10),
            ("09s", 9),
            ("3days ", 3 * 86400),
            ("", 0),
            ("garbage", 0),
        ],
    )
    def test_uptime_seconds(self, spark, raw, seconds):
        df = spark.createDataFrame([Row(raw=raw)])
        got = df.select(parse.parse_uptime(F.col("raw")).alias("s")).first()["s"]
        assert got == seconds
