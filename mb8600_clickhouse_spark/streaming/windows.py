"""Streaming analytics: watermarked windows, streaming dedup, stateful
sessionization.

The reference has NO watermarks/windows/stateful ops (SURVEY.md §2.D6) —
ordering in its world comes from the MergeTree sort key. These operators
are the north-star additions, defined over the ``events`` fixture and
verified by batch/stream parity tests (tests/test_streaming.py): the same
function runs on a batch DataFrame and a streaming one, and results must
match (Spark guarantees the semantics; the tests pin them).

Every aggregation here is expressed with built-in window functions so the
streaming state store handles scale-out; the only Python-in-the-loop
operator is ``sessionize_with_state`` (applyInPandasWithState), which
exists to cover the custom-stateful-operator pattern (SURVEY.md §2.F6).
"""

from __future__ import annotations

from typing import Iterable, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def tumbling_counts(
    events: DataFrame,
    width: str = "15 minutes",
    watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window count+sum per event_type (Q37 shape). With a
    watermark the same plan runs as an append-mode stream; without one it
    is the batch query."""
    src = events.withWatermark(ts_col, watermark) if watermark else events
    return (
        src.groupBy(F.window(ts_col, width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_avg(
    events: DataFrame,
    width: str = "30 minutes",
    slide: str = "15 minutes",
    watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding-window average value per event_type."""
    src = events.withWatermark(ts_col, watermark) if watermark else events
    return (
        src.groupBy(F.window(ts_col, width, slide).alias("w"), "event_type")
        .agg(F.round(F.avg("value"), 4).alias("avg_value"), F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "avg_value",
            "n",
        )
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Native session windows per user: a session closes after ``gap`` of
    inactivity (the built-in streaming equivalent of Q36's batch
    lag-based sessionization)."""
    src = events.withWatermark(ts_col, watermark) if watermark else events
    return (
        src.groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup with bounded state: duplicates arriving
    within the watermark horizon are dropped, state older than the
    horizon is evicted (F1's streaming form)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


# --- custom stateful operator: applyInPandasWithState sessionization -------

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize_with_state(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Custom stateful sessionization via applyInPandasWithState
    (SURVEY.md §2.F6): per-user open-session state carried across
    micro-batches; a session is emitted when the gap is exceeded by a
    later event or when the state times out past the watermark.

    Kept deliberately minimal — it demonstrates the
    arbitrary-stateful-operator pattern (Arrow-batched, event-time
    timeout) rather than replacing the native ``session_window``
    (preferred when its semantics fit)."""
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: Tuple[int],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                }
            )
            return

        ts_us = (
            pd.concat([pdf[ts_col] for pdf in pdfs])
            .astype("datetime64[us]")
            .astype("int64")
            .sort_values()
        )
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = int(ts_us.iloc[0]), int(ts_us.iloc[0]), 0
        closed = []
        for t in ts_us:
            t = int(t)
            if n > 0 and t - last_us > gap_us:
                closed.append((start_us, last_us, n))
                start_us, n = t, 0
            last_us = max(last_us, t)
            n += 1
        state.update((start_us, last_us, n))
        state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [c for _, _, c in closed],
                }
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
