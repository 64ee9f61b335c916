"""Z-order clustering: interleave math plus the actual physical
property — per-file min/max ranges stay bounded on BOTH columns."""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq
from pyspark.sql import Row
from pyspark.sql import functions as F

from mb8600_clickhouse_spark.plans.layout import write_zordered, zorder_key


def test_interleave_known_values(spark):
    df = spark.createDataFrame([Row(a=0b101, b=0b011)])
    [r] = df.select(zorder_key(F.col("a"), F.col("b"), bits=4).alias("z")).collect()
    # a bits (even positions): 1,0,1 ; b bits (odd positions): 1,1,0
    # z = b2 a2 b1 a1 b0 a0 = 0 1 1 0 1 1 = 0b011011
    assert r["z"] == 0b011011


def test_zorder_is_monotone_in_quadrants(spark):
    df = spark.createDataFrame([Row(a=a, b=b) for a in range(4) for b in range(4)])
    rows = df.select("a", "b", zorder_key(F.col("a"), F.col("b"), 2).alias("z")).collect()
    z = {(r["a"], r["b"]): r["z"] for r in rows}
    assert len(set(z.values())) == 16  # bijective on the 4x4 grid
    # quadrant ordering: all of the (0-1, 0-1) quadrant precedes (2-3, 2-3)
    assert max(z[(a, b)] for a in (0, 1) for b in (0, 1)) < min(
        z[(a, b)] for a in (2, 3) for b in (2, 3)
    )


def test_zordered_files_bound_both_columns(spark, tmp_path):
    n = 64
    grid = spark.createDataFrame(
        [Row(x=i % n, y=i // n) for i in range(n * n)]
    )
    path = str(tmp_path / "z")
    write_zordered(grid, path, F.col("x"), F.col("y"), bits=6, n_files=16)

    spans_x, spans_y = [], []
    for f in Path(path).glob("*.parquet"):
        t = pq.read_table(f).to_pandas()
        spans_x.append(t["x"].max() - t["x"].min())
        spans_y.append(t["y"].max() - t["y"].min())
    # a single-column sort would leave the OTHER column spanning the full
    # domain (span 63) in every file; Z-order bounds both dimensions
    assert max(spans_x) < n - 1
    assert max(spans_y) < n - 1
    assert sum(spans_y) / len(spans_y) <= n / 2
