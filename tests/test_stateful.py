"""transformWithState running-totals operator (streaming/stateful.py).

The whole module is gated on google.protobuf: Spark's
TransformWithStateInPySpark runner requires it and this container does
not ship it (see the operator docstring for the measured failure). On
a protobuf-equipped cluster these tests run and assert cross-batch
state parity with the batch cumulative window."""

from __future__ import annotations

import pytest

pytest.importorskip(
    "google.protobuf",
    reason="transformWithState needs protobuf (absent in this container)",
)

from pyspark.sql import Row  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from mb8600_clickhouse_spark.plans import ManifestTable  # noqa: E402
from mb8600_clickhouse_spark.sources import manifest_datasource  # noqa: E402
from mb8600_clickhouse_spark.streaming.stateful import running_totals  # noqa: E402


class TestRunningTotals:
    def test_state_survives_micro_batches(self, spark, tmp_path):
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
