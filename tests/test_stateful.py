"""transformWithState running-totals operator (streaming/stateful.py).

Two tiers (r07 verdict #7):

- STRUCTURAL tests that RUN in this container: the protobuf gate is at
  runner INITIALIZATION (execution), not plan construction — so the
  query builds, the analyzed plan carries the TransformWithState node,
  the output schema is pinned, and the processor's fold logic executes
  against a fake state handle across simulated micro-batches.
- The full end-to-end streaming parity test stays gated on
  google.protobuf (absent here; present on every real deployment —
  pyspark declares it) via importorskip INSIDE the test.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mb8600_clickhouse_spark.streaming.stateful import (
    RUNNING_TOTALS_SCHEMA,
    RunningTotalsProcessor,
    running_totals,
)


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema):
        self.states.setdefault(name, _FakeValueState())
        assert schema == "n BIGINT, total DOUBLE"
        return self.states[name]


class TestProcessorLogic:
    """The fold itself, executed — no Spark runner involved."""

    def test_state_carries_across_batches(self):
        p = RunningTotalsProcessor()
        p.init(_FakeHandle())
        batches = [
            pd.DataFrame({"event_id": [2, 0, 1], "value": [2.0, 0.0, 1.0]}),
            pd.DataFrame({"event_id": [4, 3], "value": [4.0, 3.0]}),
        ]
        out = pd.concat(
            [next(p.handleInputRows((7,), iter([b]), None)) for b in batches]
        )
        # cumulative over the batch-sorted sequence: n=1..5, totals
        # 0,1,3,6,10 — batch 2 resumes from batch 1's state
        assert list(out["event_id"]) == [0, 1, 2, 3, 4]
        assert list(out["running_n"]) == [1, 2, 3, 4, 5]
        assert list(out["running_total"]) == [0.0, 1.0, 3.0, 6.0, 10.0]
        assert set(out["user_id"]) == {7}

    def test_keys_isolated(self):
        p = RunningTotalsProcessor()
        h = _FakeHandle()
        p.init(h)
        next(p.handleInputRows((1,), iter([pd.DataFrame(
            {"event_id": [0], "value": [5.0]})]), None))
        # a second processor instance (new key partition) starts fresh
        p2 = RunningTotalsProcessor()
        p2.init(_FakeHandle())
        out = next(p2.handleInputRows((2,), iter([pd.DataFrame(
            {"event_id": [0], "value": [1.0]})]), None))
        assert list(out["running_total"]) == [1.0]


class TestPlanStructure:
    """The query BUILDS against a real SparkSession without protobuf:
    analyzed plan carries the TransformWithState node with the declared
    state/output schema — executed evidence the operator is wired into
    Spark 4's arbitrary-state API short of a full (env-blocked) run."""

    def test_analyzed_plan_and_schema(self, spark):
        stream = (
            spark.readStream.format("rate").option("rowsPerSecond", 1).load()
            .selectExpr(
                "value AS user_id",
                "value AS event_id",
                "CAST(value AS DOUBLE) AS value",
            )
        )
        df = running_totals(stream.groupBy("user_id"))
        assert df.isStreaming
        assert df.schema.simpleString() == (
            "struct<user_id:bigint,event_id:bigint,"
            "running_n:bigint,running_total:double>"
        )
        plan = df._jdf.queryExecution().analyzed().toString()
        assert "TransformWithState" in plan
        # grouping key threaded through: the node lists user_id first
        assert "user_id" in plan.split("\n")[0]

    def test_custom_columns_resolve(self, spark):
        stream = (
            spark.readStream.format("rate").load()
            .selectExpr(
                "value AS user_id", "value AS seq", "CAST(1.5 AS DOUBLE) AS v"
            )
        )
        df = running_totals(
            stream.groupBy("user_id"), seq_col="seq", value_col="v"
        )
        assert [f.name for f in df.schema.fields] == [
            "user_id", "event_id", "running_n", "running_total",
        ]


class TestRunningTotals:
    """Full streaming parity — needs the protobuf-backed state runner."""

    def test_state_survives_micro_batches(self, spark, tmp_path):
        pytest.importorskip(
            "google.protobuf",
            reason="transformWithState runner needs protobuf "
            "(absent in this container)",
        )
        from mb8600_clickhouse_spark.plans import ManifestTable
        from mb8600_clickhouse_spark.sources import manifest_datasource

        manifest_datasource.register(spark)
        rows = [
            Row(user_id=u, event_id=i, value=float(i + u))
            for u in (1, 2)
            for i in range(6)
        ]
        df = spark.createDataFrame(rows)
        t = ManifestTable(str(tmp_path / "src"))
        # two commits partitioning the sequence in order
        t.append(df.filter(F.col("event_id") < 3).coalesce(1))
        t.append(df.filter(F.col("event_id") >= 3).coalesce(1))
        stream = (
            spark.readStream.format("manifest")
            .option("path", str(tmp_path / "src"))
            .load()
        )
        q = (
            running_totals(stream.groupBy("user_id"))
            .writeStream.format("memory")
            .queryName("tws_parity")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        assert q.awaitTermination(120)
        got = {
            (r["user_id"], r["event_id"]): (r["running_n"], r["running_total"])
            for r in spark.table("tws_parity").collect()
        }
        # batch cumulative window reference
        n, tot = {}, {}
        for r in sorted(rows, key=lambda r: (r.user_id, r.event_id)):
            n[r.user_id] = n.get(r.user_id, 0) + 1
            tot[r.user_id] = tot.get(r.user_id, 0.0) + r.value
            assert got[(r.user_id, r.event_id)] == (n[r.user_id], tot[r.user_id])
