"""Streaming reads over ManifestTable (``format("manifest")``): each
snapshot version is an offset; a micro-batch consumes exactly the files
added by the append commits it covers — the Delta "table as a stream"
idiom on the engine's own table format."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import Row

from mb8600_clickhouse_spark.plans import ManifestTable
from mb8600_clickhouse_spark.sources import manifest_datasource


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    manifest_datasource.register(spark)


def _df(spark, lo, hi):
    return spark.createDataFrame([Row(k=i, v=f"row{i}") for i in range(lo, hi)])


def _start(spark, path, name, ckpt, **options):
    reader = spark.readStream.format("manifest").option("path", path)
    for k, v in options.items():
        reader = reader.option(k, v)
    return (
        reader.load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )


def _await_rows(spark, name, n, timeout=90):
    deadline = time.time() + timeout
    while spark.table(name).count() < n and time.time() < deadline:
        time.sleep(0.3)
    return sorted(r["k"] for r in spark.table(name).collect())


class TestManifestStream:
    def test_appends_stream_through_exactly_once(self, spark, tmp_path):
        t = ManifestTable(str(tmp_path / "t"))
        t.append(_df(spark, 0, 3))  # pre-stream history: emitted (startingVersion=0)
        q = _start(spark, str(tmp_path / "t"), "ms_basic", str(tmp_path / "ck"))
        try:
            assert _await_rows(spark, "ms_basic", 3) == [0, 1, 2]
            t.append(_df(spark, 3, 6))
            t.append(_df(spark, 6, 8))
            assert _await_rows(spark, "ms_basic", 8) == list(range(8))
        finally:
            q.stop()
            q.awaitTermination(30)
        # exactly the appended rows, no duplicates
        assert spark.table("ms_basic").count() == 8

    def test_restart_resumes_from_checkpoint(self, spark, tmp_path):
        """Stop after v0, append v1 while down, restart on the same
        checkpoint: the resumed stream must emit ONLY v1's rows (memory
        sink can't recover checkpoints, so this goes through a file
        sink, the durable path a real pipeline uses)."""
        t = ManifestTable(str(tmp_path / "t"))
        t.append(_df(spark, 0, 4))
        ck, out = str(tmp_path / "ck"), str(tmp_path / "out")

        def run_until(n_total):
            q = (
                spark.readStream.format("manifest")
                .option("path", str(tmp_path / "t"))
                .load()
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ck)
                .trigger(processingTime="0 seconds")
                .start()
            )
            try:
                deadline = time.time() + 90
                while time.time() < deadline:
                    try:
                        if spark.read.parquet(out).count() >= n_total:
                            break
                    except Exception:
                        pass
                    time.sleep(0.3)
            finally:
                q.stop()
                q.awaitTermination(30)
            return sorted(r["k"] for r in spark.read.parquet(out).collect())

        assert run_until(4) == list(range(4))
        t.append(_df(spark, 4, 7))  # committed while the stream is down
        # resumed stream adds exactly v1's rows — no replay of v0
        assert run_until(7) == list(range(7))

    def test_change_commit_fails_stream_by_default(self, spark, tmp_path):
        t = ManifestTable(str(tmp_path / "t"))
        t.append(_df(spark, 0, 3))
        q = _start(spark, str(tmp_path / "t"), "ms_fail", str(tmp_path / "ck"))
        try:
            assert _await_rows(spark, "ms_fail", 3) == [0, 1, 2]
            t.delete_where(spark, "k = 1")  # history rewrite mid-stream
            with pytest.raises(Exception, match="skipChangeCommits"):
                deadline = time.time() + 60
                while q.isActive and time.time() < deadline:
                    time.sleep(0.3)
                q.awaitTermination(5)
        finally:
            q.stop()

    def test_skip_change_commits_streams_past_rewrites(self, spark, tmp_path):
        t = ManifestTable(str(tmp_path / "t"))
        t.append(_df(spark, 0, 3))
        t.compact(spark, sort_cols=["k"])  # overwrite commit in history
        q = _start(
            spark,
            str(tmp_path / "t"),
            "ms_skip",
            str(tmp_path / "ck"),
            skipChangeCommits="true",
        )
        try:
            t.append(_df(spark, 10, 12))
            # v0 append (0-2) + v2 append (10-11); the compact's files skipped
            assert _await_rows(spark, "ms_skip", 5) == [0, 1, 2, 10, 11]
        finally:
            q.stop()
            q.awaitTermination(30)

    def test_starting_version_latest_skips_history(self, spark, tmp_path):
        t = ManifestTable(str(tmp_path / "t"))
        t.append(_df(spark, 0, 5))
        q = _start(
            spark,
            str(tmp_path / "t"),
            "ms_latest",
            str(tmp_path / "ck"),
            startingVersion="latest",
        )
        try:
            # wait for the first micro-batch so initialOffset (= "latest")
            # is pinned BEFORE the new append commits, else it's skipped too
            deadline = time.time() + 60
            while q.lastProgress is None and time.time() < deadline:
                time.sleep(0.2)
            t.append(_df(spark, 100, 102))
            assert _await_rows(spark, "ms_latest", 2) == [100, 101]
        finally:
            q.stop()
            q.awaitTermination(30)
        assert spark.table("ms_latest").count() == 2


class TestStreamSchemaEvolution:
    def test_stream_pads_pre_evolution_files(self, spark, tmp_path):
        """Files appended BEFORE a schema evolution lack the new column;
        the stream must serve the manifest schema and null-pad them."""
        t = ManifestTable(str(tmp_path / "t"))
        t.append(_df(spark, 0, 2))
        t.append(
            spark.createDataFrame([Row(k=5, v="row5", extra=1.25)]),
            merge_schema=True,
        )
        q = _start(spark, str(tmp_path / "t"), "ms_evo", str(tmp_path / "ck"))
        try:
            assert _await_rows(spark, "ms_evo", 3) == [0, 1, 5]
        finally:
            q.stop()
            q.awaitTermination(30)
        got = {r["k"]: r["extra"] for r in spark.table("ms_evo").collect()}
        assert got == {0: None, 1: None, 5: 1.25}
