"""Salting primitives: results must equal the unsalted equivalents, and
salts must be deterministic (replay-safe)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mb8600_clickhouse_spark.operators import skew
from mb8600_clickhouse_spark.tables import load_tables


def _events(spark):
    return load_tables(spark, "/root/testdata/sf0.001")["events"]


def test_salt_is_deterministic(spark):
    ev = _events(spark)
    a = {(r["event_id"], r["_salt"]) for r in skew.with_salt(ev, "user_id", 8).collect()}
    b = {(r["event_id"], r["_salt"]) for r in skew.with_salt(ev, "user_id", 8).collect()}
    assert a == b
    assert all(0 <= s < 8 for _, s in a)


def test_salted_agg_matches_plain(spark):
    ev = _events(spark)
    salted = skew.salted_agg(
        ev,
        ["event_type"],
        [
            ("n", "value", F.count, F.sum),
            ("total", "value", F.sum, F.sum),
            ("mx", "value", F.max, F.max),
        ],
        salt_from="event_id",
        n_salts=8,
    )
    plain = ev.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.sum("value").alias("total"),
        F.max("value").alias("mx"),
    )
    a = {r["event_type"]: (r["n"], round(r["total"], 6), r["mx"]) for r in salted.collect()}
    b = {r["event_type"]: (r["n"], round(r["total"], 6), r["mx"]) for r in plain.collect()}
    assert a == b


def test_salted_join_matches_plain(spark):
    t = load_tables(spark, "/root/testdata/sf0.001")
    fact, dim = t["orders"], t["customer"].withColumnRenamed("c_custkey", "o_custkey")
    salted = skew.salted_join(fact, dim, "o_custkey", n_salts=4)
    plain = fact.join(dim, "o_custkey")
    assert salted.count() == plain.count()
    a = sorted(r["o_orderkey"] for r in salted.select("o_orderkey").collect())
    b = sorted(r["o_orderkey"] for r in plain.select("o_orderkey").collect())
    assert a == b


def test_salted_join_rejects_outer(spark):
    import pytest

    t = load_tables(spark, "/root/testdata/sf0.001")
    fact, dim = t["orders"], t["customer"].withColumnRenamed("c_custkey", "o_custkey")
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError):
            skew.salted_join(fact, dim, "o_custkey", how=how)


def test_salted_join_default_salt_spreads_hot_key(spark):
    """With the default all-columns salt, rows of ONE join key must land
    on multiple salts (salting by the key itself would put them all on
    one — the shape the default exists to prevent)."""
    ev = _events(spark).limit(2000).withColumn("k", F.lit(1))
    salted = skew.with_salt(ev, ev.columns, 8)
    assert salted.select("_salt").distinct().count() > 1


def test_salted_join_spreads_hot_key(spark):
    ev = _events(spark)
    salted = skew.with_salt(ev, "event_id", 8)
    # one logical key per salt bucket at most 8 groups
    n_groups = (
        salted.filter(F.col("user_id") == 0)
        .select("user_id", "_salt")
        .distinct()
        .count()
    )
    assert 1 < n_groups <= 8
