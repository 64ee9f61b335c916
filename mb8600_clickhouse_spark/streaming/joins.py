"""Stream-stream interval joins.

The one major Structured Streaming capability the windows/MV surface
didn't yet exercise: joining two UNBOUNDED streams on a key within an
event-time interval (clicks x purchases attribution, scrape x config
correlation). Spark buffers both sides in watermark-bounded state and
emits matches as they become provable — state for a row is dropped the
moment the other side's watermark passes its interval, so memory is
bounded by (watermark window x input rate), not by history.

``interval_join`` builds the join CONDITION identically for batch and
streaming frames, which is what makes the semantics differentially
testable: the same expression over the same rows must produce the same
pairs whether the engine buffered them as stream state or scanned them
as a table (q84 runs the REAL streaming machinery; the pytest parity
check runs both paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    how: str = "inner",
) -> DataFrame:
    """Join rows sharing ``key`` where ``right_ts`` lies within
    ``[left_ts + lower_s, left_ts + upper_s]`` seconds.

    Works unchanged on batch AND streaming DataFrames. For streaming
    inputs BOTH sides must carry a watermark (``withWatermark``) so
    Spark can bound the join state; the time-range condition below is
    exactly the shape its state-cleanup analysis recognizes. Column
    names must be disjoint apart from ``key`` (alias upstream)."""
    cond = (
        (left[key] == right[key])
        & (right[right_ts] >= left[left_ts] + F.expr(f"INTERVAL {lower_s} SECOND"))
        & (right[right_ts] <= left[left_ts] + F.expr(f"INTERVAL {upper_s} SECOND"))
    )
    return left.join(right, cond, how).drop(right[key])
