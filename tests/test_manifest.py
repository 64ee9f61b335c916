"""ManifestTable: atomic snapshot commits over plain parquet — the
engine's stand-in for a transactional table format (SURVEY §1.1/§4.2;
Delta/Iceberg jars are unavailable in this container)."""

from __future__ import annotations

import json

from pyspark.sql import Row

from mb8600_clickhouse_spark.plans import ManifestTable


def _df(spark, lo, hi):
    return spark.createDataFrame([Row(k=i, v=f"row{i}") for i in range(lo, hi)])


def _keys(df):
    return sorted(r["k"] for r in df.collect())


class TestCommitProtocol:
    def test_append_then_read(self, spark, tmp_path):
        t = ManifestTable(str(tmp_path / "t"))
        assert t.append(_df(spark, 0, 5)) == 0
        assert t.append(_df(spark, 5, 8)) == 1
        assert _keys(t.read(spark)) == list(range(8))

    def test_overwrite_replaces_snapshot(self, spark, tmp_path):
        t = ManifestTable(str(tmp_path / "t"))
        t.append(_df(spark, 0, 5))
        t.overwrite(_df(spark, 100, 103))
        assert _keys(t.read(spark)) == [100, 101, 102]

    def test_time_travel(self, spark, tmp_path):
        t = ManifestTable(str(tmp_path / "t"))
        v0 = t.append(_df(spark, 0, 3))
        t.overwrite(_df(spark, 10, 12))
        assert _keys(t.read(spark, version=v0)) == [0, 1, 2]
        assert _keys(t.read(spark)) == [10, 11]

    def test_uncommitted_write_invisible(self, spark, tmp_path):
        """A writer that dies after writing data files but before the
        manifest link leaves the table exactly as it was — the
        concurrent-reader-during-compaction hazard closed."""
        t = ManifestTable(str(tmp_path / "t"))
        t.append(_df(spark, 0, 4))
        t._write_data_files(_df(spark, 50, 60))  # orphaned: never committed
        assert _keys(t.read(spark)) == [0, 1, 2, 3]

    def test_commit_race_retries_to_next_version(self, spark, tmp_path):
        """Losing the exclusive-create race must re-read and land on the
        next free version with BOTH writers' rows visible (append
        semantics merge file lists)."""
        t = ManifestTable(str(tmp_path / "t"))
        t.append(_df(spark, 0, 2))
        # simulate a concurrent committer claiming v1 between our read
        # of latest() and our link(): pre-create v1 referencing new data
        rival_files = t._write_data_files(_df(spark, 90, 92))
        rival = {
            "version": 1,
            "parent": 0,
            "op": "append",
            "files": t.snapshot_files(0) + rival_files,
        }
        t._manifest_path(1).write_text(json.dumps(rival))
        v = t.append(_df(spark, 2, 4))
        assert v == 2
        assert _keys(t.read(spark)) == [0, 1, 2, 3, 90, 91]

    def test_compact_is_metadata_swap(self, spark, tmp_path):
        t = ManifestTable(str(tmp_path / "t"))
        for i in range(4):
            t.append(_df(spark, i * 2, i * 2 + 2))
        before_files = len(t.snapshot_files())
        want = _keys(t.read(spark))
        t.compact(spark, sort_cols=["k"])
        assert len(t.snapshot_files()) < before_files
        assert _keys(t.read(spark)) == want
        # pre-compaction snapshot still readable (no destructive window)
        assert _keys(t.read(spark, version=3)) == want

    def test_exactly_once_epoch_sink(self, spark, tmp_path):
        """A replayed foreachBatch epoch must be a no-op: the manifest
        ledger already holds it, so no duplicate rows and no fencing
        column needed on read."""
        from mb8600_clickhouse_spark.plans import ManifestTable
        from mb8600_clickhouse_spark.streaming.ingest import manifest_epoch_sink

        path = str(tmp_path / "stream_t")
        sink = manifest_epoch_sink(path)
        sink(_df(spark, 0, 3), epoch_id=0)
        sink(_df(spark, 3, 5), epoch_id=1)
        sink(_df(spark, 3, 5), epoch_id=1)  # replay after crash
        t = ManifestTable(path)
        assert _keys(t.read(spark)) == [0, 1, 2, 3, 4]
        assert t.committed_epochs() == {0, 1}

    def test_delete_where_copy_on_write(self, spark, tmp_path):
        t = ManifestTable(str(tmp_path / "t"))
        t.append(_df(spark, 0, 6))
        v = t.delete_where(spark, "k % 2 = 0")
        assert _keys(t.read(spark)) == [1, 3, 5]
        assert _keys(t.read(spark, version=v - 1)) == list(range(6))  # time travel intact

    def test_update_where_copy_on_write(self, spark, tmp_path):
        t = ManifestTable(str(tmp_path / "t"))
        t.append(_df(spark, 0, 4))
        v = t.update_where(spark, "k >= 2", {"v": "concat(v, '!')", "k": "k + 10"})
        rows = {r["k"]: r["v"] for r in t.read(spark).collect()}
        assert rows == {0: "row0", 1: "row1", 12: "row2!", 13: "row3!"}
        # assignments see the PRE-update row; prior version time-travels
        assert _keys(t.read(spark, version=v - 1)) == [0, 1, 2, 3]

    def test_upsert_replaces_and_inserts(self, spark, tmp_path):
        t = ManifestTable(str(tmp_path / "t"))
        t.append(_df(spark, 0, 4))
        src = spark.createDataFrame(
            [Row(k=2, v="UPDATED"), Row(k=99, v="NEW")]
        )
        t.upsert(spark, src, ["k"])
        rows = {r["k"]: r["v"] for r in t.read(spark).collect()}
        assert rows == {0: "row0", 1: "row1", 2: "UPDATED", 3: "row3", 99: "NEW"}

    def test_vacuum_drops_unreferenced(self, spark, tmp_path):
        t = ManifestTable(str(tmp_path / "t"))
        t.append(_df(spark, 0, 4))
        t.overwrite(_df(spark, 10, 12))
        deleted = t.vacuum(keep_versions=1)
        assert deleted  # v0's files gone
        assert _keys(t.read(spark)) == [10, 11]
        assert not t._manifest_path(0).exists()  # old manifest dropped
