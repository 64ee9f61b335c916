"""Table-layout policy tests: the write path must produce the physical
properties the scan path depends on (partition directories, within-file
sort, prunable scans)."""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from mb8600_clickhouse_spark.plans import EVENTS_LAYOUT, write_table
from mb8600_clickhouse_spark.tables import load_tables


def test_write_table_layout_properties(spark, tmp_path):
    ev = load_tables(spark, "/root/testdata/sf0.001")["events"]
    path = str(tmp_path / "events_tbl")
    write_table(ev, EVENTS_LAYOUT, path)

    # date-partitioned directory layout
    dirs = [p.name for p in Path(path).iterdir() if p.name.startswith("date=")]
    assert len(dirs) > 1

    # files are sorted within partitions on (user_id, ts)
    some_dir = sorted(Path(path).glob("date=*/*.parquet"))[0]
    t = pq.read_table(some_dir, columns=["user_id", "ts"]).to_pandas()
    keys = list(zip(t["user_id"], t["ts"]))
    assert keys == sorted(keys)

    # scans prune: date predicate shows up as a partition filter
    df = spark.read.parquet(path).filter(F.col("date") == dirs[0].split("=")[1])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan

    # round-trip preserves the data
    assert spark.read.parquet(path).count() == ev.count()
