"""Incremental materialized-view maintenance: the rollup table must
always equal a from-scratch batch aggregation of the full source, while
each refresh reads only the NEW files (manifest-stream offsets) and
merges additively."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mb8600_clickhouse_spark.plans import ManifestTable
from mb8600_clickhouse_spark.streaming import incremental

AGGS = {
    "n": ("count", "*"),
    "total": ("sum", "value"),
    "vmin": ("min", "value"),
    "vmax": ("max", "value"),
}


def _df(spark, rows):
    return spark.createDataFrame([Row(k=k, value=v) for k, v in rows])


def _batch_truth(spark, table):
    return {
        (r["k"], r["n"], r["total"], r["vmin"], r["vmax"])
        for r in table.read(spark)
        .groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("total"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        .collect()
    }


def _rollup_rows(spark, path):
    return {tuple(r) for r in ManifestTable(path).read(spark).collect()}


def _refresh(spark, src, roll, ck):
    q = incremental.maintain_rollup(
        spark, src, roll, ["k"], AGGS, ck, available_now=True
    )
    q.awaitTermination(120)


class TestIncrementalRollup:
    def test_catchup_then_incremental_refresh(self, spark, tmp_path):
        src, roll, ck = (
            str(tmp_path / "src"),
            str(tmp_path / "roll"),
            str(tmp_path / "ck"),
        )
        t = ManifestTable(src)
        t.append(_df(spark, [("a", 1), ("a", 5), ("b", 2)]))
        t.append(_df(spark, [("b", 7), ("c", 3)]))
        _refresh(spark, src, roll, ck)
        assert _rollup_rows(spark, roll) == _batch_truth(spark, t)

        # appends while the stream is down; the resumed refresh reads
        # ONLY the new commits (fresh keys + updates to old keys)
        t.append(_df(spark, [("a", 10), ("d", -4)]))
        before = ManifestTable(roll).latest_version()
        _refresh(spark, src, roll, ck)
        assert _rollup_rows(spark, roll) == _batch_truth(spark, t)
        assert ManifestTable(roll).latest_version() > before

    def test_noop_refresh_commits_nothing(self, spark, tmp_path):
        src, roll, ck = (
            str(tmp_path / "src"),
            str(tmp_path / "roll"),
            str(tmp_path / "ck"),
        )
        ManifestTable(src).append(_df(spark, [("a", 1)]))
        _refresh(spark, src, roll, ck)
        v = ManifestTable(roll).latest_version()
        _refresh(spark, src, roll, ck)  # no new source commits
        # availableNow with an empty backlog plans no batch -> no commit
        assert ManifestTable(roll).latest_version() == v

    def test_epoch_replay_is_noop(self, spark, tmp_path):
        roll = str(tmp_path / "roll")
        sink = incremental.rollup_sink(roll, ["k"], AGGS)
        batch = _df(spark, [("a", 1), ("b", 2)])
        sink(batch, 7)
        v = ManifestTable(roll).latest_version()
        sink(batch, 7)  # checkpoint-recovery replay of the same epoch
        assert ManifestTable(roll).latest_version() == v
        sink(batch, 8)  # a NEW epoch does merge
        assert _rollup_rows(spark, roll) == {
            ("a", 2, 2, 1, 1),
            ("b", 2, 4, 2, 2),
        }

    def test_non_additive_agg_rejected(self, spark, tmp_path):
        with pytest.raises(ValueError, match="non-additive"):
            incremental.rollup_sink(
                str(tmp_path / "r"), ["k"], {"p": ("percentile", "value")}
            )
