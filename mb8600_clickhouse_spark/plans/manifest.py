"""Manifest-committed parquet tables: ACID-ish snapshots without Delta.

SURVEY §1.1/§4.2 maps ClickHouse MergeTree/Buffer durability onto a
transactional table format. This container has no Delta/Iceberg jars and
no network, so this module implements the minimal snapshot/manifest
commit protocol those formats are built on (the Iceberg v1 idea, scoped
to a single filesystem):

- data files are immutable parquet files under ``<table>/data/txn_<id>/``;
- a snapshot is a JSON manifest ``<table>/_manifests/v<N>.json`` listing
  exactly the data files visible in version N;
- a commit is the ATOMIC exclusive creation of ``v<N+1>.json`` —
  readers either see the old complete snapshot or the new complete
  snapshot, never a half-written table;
- optimistic concurrency: two writers racing to the same version —
  the loser's exclusive create fails and it re-reads, re-merges, and
  retries (append semantics merge file lists; overwrite replaces them);
- old versions remain readable (time travel) until ``vacuum``.

What this gives over a bare parquet dir: atomic append/overwrite/compact
visibility (the round-1 verdict's concurrent-reader-during-compaction
hazard), snapshot isolation for readers, and safe concurrent appenders.
What a real Delta/Iceberg deployment adds beyond it: column-level stats
in manifests for file pruning, schema evolution, and a distributed
commit service instead of POSIX link semantics — documented deviation in
README.md.

Atomicity primitive: ``os.link(tmp, final)`` — hard-link creation fails
with EEXIST if the target exists, which is the portable local-filesystem
compare-and-swap. (HDFS/S3 deployments would swap this single function
for a conditional PUT.)
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

MANIFEST_DIR = "_manifests"
DATA_DIR = "data"


class CommitConflict(RuntimeError):
    """Raised when optimistic retries are exhausted."""


class ManifestTable:
    """A manifest-committed parquet table rooted at ``path``."""

    def __init__(self, path: str, max_retries: int = 20) -> None:
        self.root = Path(path)
        self.max_retries = max_retries
        (self.root / MANIFEST_DIR).mkdir(parents=True, exist_ok=True)
        (self.root / DATA_DIR).mkdir(parents=True, exist_ok=True)

    # -- snapshot bookkeeping ------------------------------------------------
    def _manifest_path(self, version: int) -> Path:
        return self.root / MANIFEST_DIR / f"v{version}.json"

    def latest_version(self) -> int | None:
        versions = [
            int(p.stem[1:])
            for p in (self.root / MANIFEST_DIR).glob("v*.json")
            if p.stem[1:].isdigit()
        ]
        return max(versions) if versions else None

    def _read_manifest(self, version: int) -> dict:
        return json.loads(self._manifest_path(version).read_text())

    def snapshot_files(self, version: int | None = None) -> list[str]:
        v = self.latest_version() if version is None else version
        if v is None:
            return []
        return self._read_manifest(v)["files"]

    # -- read ---------------------------------------------------------------
    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """DataFrame over snapshot ``version`` (default: latest). An
        empty table raises — create it with an append first."""
        files = self.snapshot_files(version)
        if not files:
            raise FileNotFoundError(f"no committed snapshot in {self.root}")
        return spark.read.parquet(*files)

    # -- write --------------------------------------------------------------
    def _write_data_files(self, df: DataFrame) -> list[str]:
        """Write df as immutable parquet under a fresh txn dir; return
        the part-file paths. The txn dir is invisible to readers until a
        manifest referencing it commits."""
        txn = self.root / DATA_DIR / f"txn_{uuid.uuid4().hex}"
        df.write.mode("error").parquet(str(txn))
        return sorted(str(p) for p in txn.glob("*.parquet"))

    def _try_commit(self, manifest: dict, version: int) -> bool:
        """Atomically publish ``v<version>.json``; False if that version
        was taken by a concurrent committer."""
        final = self._manifest_path(version)
        tmp = final.with_name(f".{final.name}.{uuid.uuid4().hex}.tmp")
        tmp.write_text(json.dumps(manifest, indent=1))
        try:
            os.link(tmp, final)  # atomic create-if-absent
            return True
        except FileExistsError:
            return False
        finally:
            tmp.unlink(missing_ok=True)

    def _commit(
        self, op: str, new_files: list[str], merge: bool, extra: dict | None = None
    ) -> int:
        for _ in range(self.max_retries):
            base = self.latest_version()
            version = 0 if base is None else base + 1
            files = (self.snapshot_files(base) if merge and base is not None else []) + new_files
            manifest = {
                "version": version,
                "parent": base,
                "op": op,
                "files": files,
                "added": new_files,  # per-commit delta (streaming source reads this)
                **(extra or {}),
            }
            if self._try_commit(manifest, version):
                return version
        raise CommitConflict(
            f"lost {self.max_retries} optimistic commit races on {self.root}"
        )

    def append(self, df: DataFrame, extra: dict | None = None) -> int:
        """Transactional append: new files + everything in the current
        snapshot become the next version. ``extra`` keys are recorded in
        the manifest (e.g. a streaming epoch id for sink-side
        exactly-once). Returns the committed version."""
        return self._commit("append", self._write_data_files(df), merge=True, extra=extra)

    def committed_epochs(self) -> set[int]:
        """Epoch ids recorded by manifest commits that carried one
        (the exactly-once streaming sink's replay ledger)."""
        out: set[int] = set()
        for p in (self.root / MANIFEST_DIR).glob("v*.json"):
            e = json.loads(p.read_text()).get("epoch")
            if e is not None:
                out.add(e)
        return out

    def overwrite(self, df: DataFrame, extra: dict | None = None) -> int:
        """Transactional replace (the compaction/OPTIMIZE shape): the new
        files alone form the next version; prior versions stay readable
        until vacuum. ``extra`` keys are recorded in the manifest (e.g.
        a streaming epoch id — the incremental-rollup sink's replay
        ledger rides on overwrite commits)."""
        return self._commit(
            "overwrite", self._write_data_files(df), merge=False, extra=extra
        )

    def compact(self, spark: SparkSession, sort_cols: list[str] | None = None) -> int:
        """Rewrite the current snapshot into one sorted file set and
        commit it as an overwrite — OPTIMIZE as a metadata swap, with no
        window where readers see a missing or half-compacted table."""
        df = self.read(spark)
        if sort_cols:
            df = df.coalesce(1).sortWithinPartitions(*sort_cols)
        return self.overwrite(df)

    # -- copy-on-write DML ---------------------------------------------------
    def delete_where(self, spark: SparkSession, predicate: str) -> int:
        """Copy-on-write DELETE (the ClickHouse ``ALTER TABLE ... DELETE``
        mutation, Delta-style): rows matching ``predicate`` (a SQL
        boolean expression) are dropped in a new snapshot committed
        atomically; prior versions remain readable."""
        from pyspark.sql import functions as F

        kept = self.read(spark).filter(~F.expr(predicate))
        return self._commit("delete", self._write_data_files(kept), merge=False)

    def update_where(
        self, spark: SparkSession, predicate: str, assignments: dict[str, str]
    ) -> int:
        """Copy-on-write UPDATE (the ClickHouse ``ALTER TABLE ... UPDATE``
        mutation): rows matching ``predicate`` get each ``assignments``
        column recomputed from its SQL expression (evaluated against the
        pre-update row, like standard UPDATE); all other rows and columns
        pass through unchanged. One atomic snapshot commit."""
        from pyspark.sql import functions as F

        cur = self.read(spark)
        p = F.expr(predicate)
        updated = cur.select(
            *[
                F.when(p, F.expr(assignments[c])).otherwise(F.col(c)).alias(c)
                if c in assignments
                else F.col(c)
                for c in cur.columns
            ]
        )
        return self._commit("update", self._write_data_files(updated), merge=False)

    def upsert(self, spark: SparkSession, source: DataFrame, key_cols: list[str]) -> int:
        """Copy-on-write MERGE/upsert: target rows whose key matches a
        source row are replaced by the source row; unmatched source rows
        are inserted. One anti-join + union, committed as one atomic
        snapshot. (At deployment scale a real format prunes the rewrite
        to matching files via manifest stats; here the whole snapshot
        rewrites — correct, just not file-pruned.)"""
        target = self.read(spark)
        kept = target.join(source.select(*key_cols).distinct(), key_cols, "left_anti")
        merged = kept.unionByName(source)
        return self._commit("upsert", self._write_data_files(merged), merge=False)

    # -- maintenance ---------------------------------------------------------
    def vacuum(self, keep_versions: int = 1) -> list[str]:
        """Delete data files not referenced by the ``keep_versions`` most
        recent snapshots (and drop older manifests). Returns deleted
        paths. Run only when no reader needs time travel past the kept
        window — same contract as Delta's VACUUM."""
        latest = self.latest_version()
        if latest is None:
            return []
        keep = set(range(max(0, latest - keep_versions + 1), latest + 1))
        live: set[str] = set()
        for v in keep:
            live.update(self.snapshot_files(v))
        deleted: list[str] = []
        for p in (self.root / DATA_DIR).glob("txn_*/*.parquet"):
            if str(p) not in live:
                p.unlink()
                deleted.append(str(p))
        for d in (self.root / DATA_DIR).glob("txn_*"):
            if not any(d.iterdir()):
                d.rmdir()
        for p in (self.root / MANIFEST_DIR).glob("v*.json"):
            if p.stem[1:].isdigit() and int(p.stem[1:]) not in keep:
                p.unlink()
        return deleted
