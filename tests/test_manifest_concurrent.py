"""Cross-process commit races on ManifestTable: the os.link CAS is the
only coordination point, so two OS processes (each with its own JVM)
hammering append/compact on one table must never lose a commit and must
produce a linear, gapless version history. This is the concurrency
contract a real multi-writer deployment relies on (manifest.py module
docstring); in-process races are covered by test_manifest.py, this file
covers genuinely independent processes."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

from mb8600_clickhouse_spark.plans import ManifestTable

_WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import Row, SparkSession

from mb8600_clickhouse_spark.plans import ManifestTable

worker_id = int(sys.argv[1])
path = sys.argv[2]
n_appends = int(sys.argv[3])
do_compact = sys.argv[4] == "1"

spark = (
    SparkSession.builder.master("local[2]")
    .appName(f"mtstress-{{worker_id}}")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
t = ManifestTable(path)
for i in range(n_appends):
    t.append(
        spark.createDataFrame(
            [Row(k=worker_id * 1000 + i * 10 + j, w=worker_id) for j in range(10)]
        ).coalesce(1)
    )
    if do_compact and i == n_appends // 2:
        # compaction races the other worker's appends: its overwrite
        # must land on a fresh version and lose no concurrent rows
        # committed BEFORE its snapshot read; rows appended after are
        # preserved by the optimistic retry of the appender.
        t.compact(spark, sort_cols=["k"], n_files=2)
print("OK", worker_id)
"""


def test_two_process_append_compact_race(tmp_path):
    repo = str(Path(__file__).resolve().parent.parent)
    table_path = str(tmp_path / "t")
    n_appends = 5

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER.format(repo=repo), str(w), table_path,
             str(n_appends), "1" if w == 1 else "0"],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for w in (1, 2)
    ]
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]
        assert b"OK" in out

    t = ManifestTable(table_path)
    latest = t.latest_version()
    # linear, gapless version history: v0..vN all present, each child's
    # parent is exactly the previous version (no forks, no lost commits)
    versions = sorted(
        int(p.stem[1:]) for p in (Path(table_path) / "_manifests").glob("v*.json")
    )
    assert versions == list(range(latest + 1))
    # 2 workers x 5 appends + 1 compact = 11 commits
    assert latest == 2 * n_appends
    ops = []
    for v in versions:
        m = json.loads((Path(table_path) / "_manifests" / f"v{v}.json").read_text())
        assert m["version"] == v
        if v > 0:
            assert m["parent"] == v - 1
        ops.append(m["op"])
    assert ops.count("append") == 2 * n_appends
    assert ops.count("overwrite") == 1

    # no lost rows, no duplicated rows: every appended key exactly once
    import duckdb

    files = t.snapshot_files()
    got = sorted(
        r[0]
        for r in duckdb.connect()
        .execute(
            "SELECT k FROM read_parquet([" + ",".join(f"'{f}'" for f in files) + "])"
        )
        .fetchall()
    )
    want = sorted(
        w * 1000 + i * 10 + j for w in (1, 2) for i in range(5) for j in range(10)
    )
    assert got == want
