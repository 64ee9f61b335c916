"""Unit tests for the as-of join operator (merge formulation)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from mb8600_clickhouse_spark.operators.asof import asof_join


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute, 0)


def _frames(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", ts=_ts(0), lid=1),   # before any right row
            Row(k="a", ts=_ts(10), lid=2),  # exactly at right ts
            Row(k="a", ts=_ts(15), lid=3),  # between right rows
            Row(k="a", ts=_ts(40), lid=4),  # after all right rows
            Row(k="b", ts=_ts(10), lid=5),  # key with no right rows
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", ts=_ts(10), price=100.0),
            Row(k="a", ts=_ts(20), price=200.0),
        ]
    )
    return left, right


def test_asof_less_equal_semantics(spark):
    left, right = _frames(spark)
    out = {
        r["lid"]: (r["asof_ts"], r["asof_price"])
        for r in asof_join(left, right, on=["k"]).collect()
    }
    assert out[1] == (None, None)           # nothing at or before 12:00
    assert out[2] == (_ts(10), 100.0)       # ties match (<=)
    assert out[3] == (_ts(10), 100.0)       # latest at-or-before 12:15
    assert out[4] == (_ts(20), 200.0)       # latest overall
    assert out[5] == (None, None)           # key never appears on right


def test_asof_strict_excludes_ties(spark):
    left, right = _frames(spark)
    out = {
        r["lid"]: r["asof_price"]
        for r in asof_join(left, right, on=["k"], strict=True).collect()
    }
    assert out[2] is None  # 12:10 tie excluded under strict <
    assert out[3] == 100.0


def test_asof_preserves_left_rowcount(spark):
    left, right = _frames(spark)
    assert asof_join(left, right, on=["k"]).count() == left.count()
