"""Q36-Q37: streaming-semantics queries executed in batch mode.

Structured Streaming queries share the same logical-plan vocabulary as
batch; these run the streaming shapes (sessionization, tumbling windows)
as batch queries for oracle verification. The stream-vs-batch parity tests
live in tests/test_streaming.py, which runs the identical plan through a
micro-batch stream and asserts equal results (SURVEY.md §5.2.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..tables import load_tables
from . import query
from .relational import dsum4


# ---------------------------------------------------------------------------
# Q36 sessionization (F6, batch form)
# ---------------------------------------------------------------------------
@query(
    "q36_sessionization",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions
    FROM g GROUP BY user_id ORDER BY user_id
    """,
)
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag + boundary-flag
    running sum — the batch twin of session_window streaming.

    Gap compared at MICROSECOND precision (unix_micros), matching the
    oracle's exact interval comparison: a second-truncated cast would
    disagree with the oracle for gaps within 1s of the 30-min boundary
    (latent on current fixtures, wrong in general)."""
    ev = load_tables(spark, sf_dir)["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), F.lit(1)).otherwise(F.lit(0)),
    )
    return (
        flagged.groupBy("user_id")
        .agg(F.sum("new_session").alias("n_sessions"))
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Q37 tumbling event-time window (D6), batch execution
# ---------------------------------------------------------------------------
@query(
    "q37_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) + (minute(ts) // 15) * INTERVAL 15 MINUTE AS window_start,
           event_type, COUNT(*) AS n,
           (CAST(SUM(CAST(round(CAST(value AS DOUBLE) * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0) AS sum_value
    FROM events
    GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
)
def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 15-minute event-time window aggregation using the real
    streaming ``window()`` operator (epoch-aligned, same as the oracle's
    quarter-hour truncation)."""
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.groupBy(F.window("ts", "15 minutes"), "event_type")
        .agg(F.count("*").alias("n"), dsum4(F.col("value")).alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )
