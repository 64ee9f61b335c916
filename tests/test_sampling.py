"""hash_split (operators/sampling.py): determinism, coverage, fractions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mb8600_clickhouse_spark.operators.sampling import hash_split, split_cut_points


def test_cut_points_default():
    cuts = split_cut_points({"train": 0.8, "val": 0.1, "test": 0.1})
    assert cuts[0] == ("train", "cccd")
    assert cuts[1] == ("val", "e666")
    assert cuts[2][0] == "test"


def test_cut_points_reject_bad_sum():
    with pytest.raises(ValueError):
        split_cut_points({"a": 0.5, "b": 0.2})


def test_split_total_coverage_and_determinism(spark):
    df = spark.range(0, 20000).select(F.col("id"))
    lab = df.select("id", hash_split(F.col("id")).alias("s"))
    counts = {r["s"]: r["n"] for r in lab.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 20000  # total, disjoint by construction
    # fractions within 2% absolute of target on 20k uniform keys
    assert abs(counts["train"] / 20000 - 0.8) < 0.02
    assert abs(counts["val"] / 20000 - 0.1) < 0.02
    assert abs(counts["test"] / 20000 - 0.1) < 0.02
    # byte-identical on re-evaluation (pure function of key)
    again = {r["s"]: r["n"] for r in lab.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert counts == again


def test_salt_re_deals(spark):
    df = spark.range(0, 2000)
    a = df.select(hash_split(F.col("id"), salt="v1").alias("s")).collect()
    b = df.select(hash_split(F.col("id"), salt="v2").alias("s")).collect()
    assert [r["s"] for r in a] != [r["s"] for r in b]


def test_two_way_split(spark):
    df = spark.range(0, 5000)
    lab = df.select(hash_split(F.col("id"), {"train": 0.95, "holdout": 0.05}).alias("s"))
    counts = {r["s"]: r["n"] for r in lab.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "holdout"}
    assert abs(counts["holdout"] / 5000 - 0.05) < 0.015


class TestTemperatureSample:
    def _df(self, spark):
        from pyspark.sql import Row

        rows = [Row(doc_id=i, lang="en") for i in range(400)] + [
            Row(doc_id=1000 + i, lang="zh") for i in range(16)
        ]
        return spark.createDataFrame(rows)

    def test_rarest_group_kept_whole(self, spark):
        from mb8600_clickhouse_spark.operators import sampling

        kept = sampling.temperature_sample(self._df(spark), "lang", "doc_id")
        by = {r["lang"]: 0 for r in kept.collect()}
        for r in kept.collect():
            by[r["lang"]] += 1
        # zh weight 1/sqrt(16) is the max -> rate 1.0 -> all 16 kept
        assert by["zh"] == 16
        # en rate = sqrt(16/400) = 0.2 -> substantially down-sampled
        assert 0 < by["en"] < 200

    def test_replay_stable(self, spark):
        from mb8600_clickhouse_spark.operators import sampling

        a = {r["doc_id"] for r in sampling.temperature_sample(self._df(spark)).collect()}
        b = {r["doc_id"] for r in sampling.temperature_sample(self._df(spark)).collect()}
        assert a == b


class TestBudgetMix:
    """sampling.budget_mix — the fill-until-crossing contract."""

    def test_crossing_doc_kept_and_weights(self, spark):
        from mb8600_clickhouse_spark.operators.sampling import budget_mix

        df = spark.createDataFrame(
            [
                # src a: 4 docs x 10 tokens each
                *[(i, "a", "tok " * 10) for i in range(4)],
                # src b: 2 docs x 10
                *[(10 + i, "b", "tok " * 10) for i in range(2)],
                # src c: unlisted -> dropped
                (20, "c", "tok " * 10),
            ],
            "doc_id: long, source: string, text: string",
        )
        out = budget_mix(
            df, weights={"a": 0.5, "b": 0.5}, token_budget=50
        ).collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r.source, []).append(r)
        # target 25 tokens each: src a takes 3 docs (10+10 before the
        # third, 20 < 25 -> crossing doc kept; 30 >= 25 stops the 4th)
        assert len(by_src["a"]) == 3
        assert sorted(r.cum_before for r in by_src["a"]) == [0, 10, 20]
        # src b has only 20 tokens -> contributes everything
        assert len(by_src["b"]) == 2
        assert "c" not in by_src

    def test_replay_stable(self, spark):
        from mb8600_clickhouse_spark.operators.sampling import budget_mix

        df = spark.createDataFrame(
            [(i, "a", f"w{i} " * (i % 7 + 1)) for i in range(40)],
            "doc_id: long, source: string, text: string",
        )
        a = sorted(r.doc_id for r in budget_mix(df, {"a": 1.0}, 60).collect())
        b = sorted(r.doc_id for r in budget_mix(df, {"a": 1.0}, 60).collect())
        assert a == b and 0 < len(a) < 40

    def test_two_phase_identical_kept_set(self, spark):
        # the giant-single-source lever: bucket-major md5 order equals
        # global md5 order, so the kept set and audit columns must be
        # IDENTICAL to the one-window spelling — including with more
        # buckets than rows and a multi-source mix
        from mb8600_clickhouse_spark.operators.sampling import budget_mix

        df = spark.createDataFrame(
            [
                *[(i, "giant", f"w{i} " * (i % 11 + 1)) for i in range(300)],
                *[(1000 + i, "small", "tok " * 5) for i in range(8)],
            ],
            "doc_id: long, source: string, text: string",
        )
        w = {"giant": 0.8, "small": 0.2}
        for n_ranges in (4, 64, 1024):
            one = {
                (r.doc_id, r.cum_before)
                for r in budget_mix(df, w, 800).collect()
            }
            two = {
                (r.doc_id, r.cum_before)
                for r in budget_mix(
                    df, w, 800, two_phase=True, n_ranges=n_ranges
                ).collect()
            }
            assert one == two, f"n_ranges={n_ranges}"
            assert 0 < len(two) < 308

    def test_two_phase_window_is_bucket_partitioned(self, spark):
        # plan shape: the corpus window must partition by (source,
        # bucket), never by source alone — the lever's entire point
        from mb8600_clickhouse_spark.operators.sampling import budget_mix

        df = spark.createDataFrame(
            [(i, "a", "tok tok") for i in range(10)],
            "doc_id: long, source: string, text: string",
        )
        plan = (
            budget_mix(df, {"a": 1.0}, 10, two_phase=True)
            ._jdf.queryExecution().optimizedPlan().toString()
        )
        import re

        corpus_windows = [
            ln for ln in plan.splitlines()
            if "Window" in ln and "_k" in ln
        ]
        assert corpus_windows and all("_bkt" in ln for ln in corpus_windows)
