"""Arbitrary stateful streaming on Spark 4's ``transformWithState``
API (the successor to ``applyInPandasWithState`` used by the
sessionization operator in ``windows.py``): typed per-key state
handles (value/list/map), timers, and TTL — the surface a custom
streaming operator at 100 TB actually wants, because state lives in
the state store (RocksDB on a cluster) keyed and partitioned like any
shuffle, never on one node.

``RunningTotalsProcessor`` is the demonstration operator: per-key
running event count and value sum, emitted per input row, with the
running state carried ACROSS micro-batches in a ValueState. Rows are
sorted by a sequence column inside each batch, so with batches that
partition the sequence in order the output equals the batch engine's
cumulative window (the parity check in tests/test_stateful.py).

ENVIRONMENT GATE: Spark's TransformWithStateInPySpark runner talks to
the JVM state server over protobuf; this container ships NO
google.protobuf and installs are not possible, so the runner crashes
at initialization (measured: ``ImportError: cannot import name
'descriptor' from 'google.protobuf'`` inside
STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE). The operator is
therefore NOT registered as a declared query; the parity test skips
via ``pytest.importorskip``. On any cluster with protobuf installed
(i.e. every real deployment — pyspark declares it as a dependency)
the code below runs as-is. The exercised arbitrary-state surface in
THIS container remains ``applyInPandasWithState`` (sessionization,
``windows.py``, q36-q39).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

import pandas as pd
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame


#: output schema of RunningTotalsProcessor (DDL string form)
RUNNING_TOTALS_SCHEMA = (
    "user_id BIGINT, event_id BIGINT, running_n BIGINT, running_total DOUBLE"
)


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key cumulative (count, sum) over a sequenced event stream.

    State: one ValueState holding (n, total). Each batch's rows for a
    key are sorted by ``seq_col`` before folding, so output order
    within a batch is deterministic; ordering ACROSS batches is the
    source's commit order (q95 splits its commits so the global
    sequence is partitioned in order, making the composition equal to
    the batch cumulative window)."""

    def __init__(self, seq_col: str = "event_id", value_col: str = "value"):
        self.seq_col = seq_col
        self.value_col = value_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.totals = handle.getValueState("totals", "n BIGINT, total DOUBLE")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(rows)).sort_values(self.seq_col)
        if self.totals.exists():
            n, total = self.totals.get()
        else:
            n, total = 0, 0.0
        out_n, out_t = [], []
        for v in batch[self.value_col]:
            n += 1
            total += float(v)
            out_n.append(n)
            out_t.append(total)
        self.totals.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(batch),
                "event_id": batch[self.seq_col].to_numpy(),
                "running_n": out_n,
                "running_total": out_t,
            }
        )

    def close(self) -> None:
        pass


def running_totals(
    grouped, seq_col: str = "event_id", value_col: str = "value"
) -> "DataFrame":
    """Attach the processor to a (streaming) GroupedData:
    ``running_totals(stream.groupBy("user_id"))``."""
    return grouped.transformWithStateInPandas(
        RunningTotalsProcessor(seq_col, value_col),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
