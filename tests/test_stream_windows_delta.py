"""q188 streaming deltaSum: stream-vs-batch parity (the F6 rule —
every streaming operator pins to its batch equivalent)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_stream_delta_sum_equals_batch(spark):
    from mb8600_clickhouse_spark.queries import all_queries
    from mb8600_clickhouse_spark.tables import load_tables

    sf_dir = "/root/testdata/sf0.001"
    got = {
        (r.user_id, r.w_start): (r.n_events, r.delta_sum)
        for r in all_queries()["q188_stream_delta_sum"]
        .fn(spark, sf_dir)
        .collect()
    }
    ev = load_tables(spark, sf_dir)["events"].filter(F.col("user_id") < 30)
    base = ev.select(
        "user_id",
        F.window("ts", "6 hours").getField("start").alias("w_start"),
        "event_id",
        (F.col("value").cast("decimal(18,4)") * 10000)
        .cast("bigint")
        .alias("v"),
    )
    w = Window.partitionBy("user_id", "w_start").orderBy("event_id", "v")
    batch = (
        base.withColumn(
            "d",
            F.greatest(F.col("v") - F.lag("v").over(w), F.lit(0)),
        )
        .groupBy("user_id", "w_start")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum("d").cast("double") / 10000.0).alias("delta_sum"),
        )
    )
    want = {
        (r.user_id, r.w_start): (r.n_events, r.delta_sum)
        for r in batch.collect()
    }
    assert got == want and len(got) > 50
