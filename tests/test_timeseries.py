"""Gap filling / interpolation (ClickHouse WITH FILL [INTERPOLATE])."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from mb8600_clickhouse_spark.operators import timeseries as ts


def _h(i: int) -> dt.datetime:
    return dt.datetime(2026, 1, 1) + dt.timedelta(hours=i)


def _series(spark, points: dict[int, float], key="a"):
    return spark.createDataFrame(
        [Row(k=key, hour=_h(i), v=float(x)) for i, x in points.items()]
    )


class TestFillGaps:
    def test_missing_buckets_get_defaults(self, spark):
        df = _series(spark, {0: 1.0, 3: 4.0})
        out = ts.fill_gaps(df, ["k"], "hour", "1 hour", {"v": 0.0})
        got = {r["hour"]: r["v"] for r in out.collect()}
        assert got == {_h(0): 1.0, _h(1): 0.0, _h(2): 0.0, _h(3): 4.0}

    def test_spine_is_per_key_range(self, spark):
        df = _series(spark, {0: 1.0, 2: 2.0}, key="a").unionByName(
            _series(spark, {5: 9.0, 6: 8.0}, key="b")
        )
        out = ts.fill_gaps(df, ["k"], "hour", "1 hour", {"v": -1.0})
        by_key = {}
        for r in out.collect():
            by_key.setdefault(r["k"], []).append((r["hour"], r["v"]))
        # key a spans hours 0-2 only; key b spans 5-6 only (no cross fill)
        assert sorted(h for h, _ in by_key["a"]) == [_h(0), _h(1), _h(2)]
        assert sorted(h for h, _ in by_key["b"]) == [_h(5), _h(6)]
        assert dict(by_key["a"])[_h(1)] == -1.0

    def test_columns_without_default_stay_null(self, spark):
        df = _series(spark, {0: 1.0, 2: 2.0})
        out = ts.fill_gaps(df, ["k"], "hour", "1 hour", {})
        assert {r["v"] for r in out.filter("hour = '2026-01-01 01:00:00'").collect()} == {None}


class TestInterpolateLinear:
    def test_single_gap_is_midpoint(self, spark):
        df = _series(spark, {0: 10.0, 2: 20.0})
        filled = ts.fill_gaps(df, ["k"], "hour", "1 hour", {})
        out = ts.interpolate_linear(filled, ["k"], "hour", ["v"])
        got = {r["hour"]: r["v"] for r in out.collect()}
        assert got[_h(1)] == 15.0

    def test_run_of_gaps_is_linear(self, spark):
        df = _series(spark, {0: 0.0, 4: 8.0})
        filled = ts.fill_gaps(df, ["k"], "hour", "1 hour", {})
        out = ts.interpolate_linear(filled, ["k"], "hour", ["v"])
        got = {r["hour"]: r["v"] for r in out.collect()}
        assert [got[_h(i)] for i in range(5)] == [0.0, 2.0, 4.0, 6.0, 8.0]

    def test_real_points_untouched_and_boundaries_null(self, spark):
        # hour 1 has a real value; make an open left boundary by
        # inserting a null bucket BEFORE any observation via a second key
        df = _series(spark, {1: 5.0, 3: 7.0})
        filled = ts.fill_gaps(df, ["k"], "hour", "1 hour", {})
        out = ts.interpolate_linear(filled, ["k"], "hour", ["v"])
        got = {r["hour"]: r["v"] for r in out.collect()}
        assert got[_h(1)] == 5.0 and got[_h(3)] == 7.0
        assert got[_h(2)] == 6.0
