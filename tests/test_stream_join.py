"""Stream-stream interval join (streaming/joins.py): batch semantics
unit checks + real streaming parity (the same interval_join expression
over the same rows must emit identical pairs from stream state and
from a batch scan)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mb8600_clickhouse_spark.plans import ManifestTable
from mb8600_clickhouse_spark.sources import manifest_datasource
from mb8600_clickhouse_spark.streaming.joins import interval_join


def _t(m):
    return dt.datetime(2024, 1, 1, 10, m)


@pytest.fixture()
def sides(spark):
    left = spark.createDataFrame(
        [
            Row(lid=1, user_id=1, l_ts=_t(0)),
            Row(lid=2, user_id=1, l_ts=_t(40)),
            Row(lid=3, user_id=2, l_ts=_t(5)),
        ]
    )
    right = spark.createDataFrame(
        [
            Row(rid=10, user_id=1, r_ts=_t(10)),   # within 30m of lid=1
            Row(rid=11, user_id=1, r_ts=_t(45)),   # within 30m of lid=2
            Row(rid=12, user_id=2, r_ts=_t(50)),   # too late for lid=3
            Row(rid=13, user_id=3, r_ts=_t(6)),    # no matching key
        ]
    )
    return left, right


class TestBatchSemantics:
    def test_interval_bounds_and_key(self, spark, sides):
        left, right = sides
        got = sorted(
            (r["lid"], r["rid"])
            for r in interval_join(
                left, right, "user_id", "l_ts", "r_ts", 0, 1800
            ).collect()
        )
        assert got == [(1, 10), (2, 11)]

    def test_lower_bound_excludes_earlier(self, spark, sides):
        left, right = sides
        # window [-60s, +60s]: only exact-adjacent pairs qualify -> none
        got = interval_join(left, right, "user_id", "l_ts", "r_ts", -60, 60).collect()
        assert got == []


class TestStreamingParity:
    def test_stream_state_emits_batch_pairs(self, spark, tmp_path, sides):
        manifest_datasource.register(spark)
        left, right = sides
        ManifestTable(str(tmp_path / "l")).append(left.coalesce(1))
        ManifestTable(str(tmp_path / "r")).append(right.coalesce(1))
        ls = (
            spark.readStream.format("manifest")
            .option("path", str(tmp_path / "l"))
            .load()
            .withWatermark("l_ts", "2 hours")
        )
        rs = (
            spark.readStream.format("manifest")
            .option("path", str(tmp_path / "r"))
            .load()
            .withWatermark("r_ts", "2 hours")
        )
        q = (
            interval_join(ls, rs, "user_id", "l_ts", "r_ts", 0, 1800)
            .writeStream.format("memory")
            .queryName("ssj_parity")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        assert q.awaitTermination(120), "stream did not drain"
        streamed = sorted(
            (r["lid"], r["rid"]) for r in spark.table("ssj_parity").collect()
        )
        batch = sorted(
            (r["lid"], r["rid"])
            for r in interval_join(
                left, right, "user_id", "l_ts", "r_ts", 0, 1800
            ).collect()
        )
        assert streamed == batch == [(1, 10), (2, 11)]
