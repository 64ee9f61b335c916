"""Bucketed-table convention: co-located joins and aggregations must run
without a shuffle on the bucketed key."""

from __future__ import annotations

from pyspark.sql import functions as F

from mb8600_clickhouse_spark.plans.layout import write_bucketed_table
from mb8600_clickhouse_spark.tables import load_tables


def _exchanges_in(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


def _fresh_table(spark, name):
    import shutil
    from pathlib import Path

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    loc = Path(spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")) / name
    shutil.rmtree(loc, ignore_errors=True)


def test_bucketed_join_needs_no_exchange(spark):
    t = load_tables(spark, "/root/testdata/sf0.001")
    _fresh_table(spark, "cust_b")
    _fresh_table(spark, "ord_b")
    write_bucketed_table(
        t["customer"], "cust_b", ("c_custkey",), n_buckets=8, sort_cols=("c_custkey",)
    )
    write_bucketed_table(
        t["orders"], "ord_b", ("o_custkey",), n_buckets=8, sort_cols=("o_custkey",)
    )
    c = spark.table("cust_b")
    o = spark.table("ord_b")

    # force SMJ so the assertion can't be satisfied by a broadcast plan
    joined = c.hint("merge").join(o, c.c_custkey == o.o_custkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert _exchanges_in(joined) == 0  # both sides pre-placed by bucket
    assert joined.count() > 0

    # the same sort-merge join against UNBUCKETED parquet must shuffle
    # both sides (hint forces SMJ — at this tiny scale Spark would
    # otherwise broadcast, which hides the comparison)
    plain = t["customer"].hint("merge").join(
        t["orders"], t["customer"].c_custkey == t["orders"].o_custkey
    )
    assert _exchanges_in(plain) >= 2

    # aggregation on the bucket key is also exchange-free
    agg = o.groupBy("o_custkey").agg(F.count("*").alias("n"))
    assert _exchanges_in(agg) == 0


def test_bucketed_results_match_plain_join(spark):
    t = load_tables(spark, "/root/testdata/sf0.001")
    c = spark.table("cust_b")
    o = spark.table("ord_b")
    a = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    b = (
        t["customer"]
        .join(t["orders"], t["customer"].c_custkey == t["orders"].o_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
