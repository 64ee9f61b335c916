"""Round-10 scale-convergence probe for the q164 statistical-aggregate
family (VERDICT r09 #1): the limb-split BIGINT moment lane is wired
into the dialect bridge, and at verification SF the query is
FLOOR-bound — this probe shows the convergence as data grows, which is
the 100 TB design point.

Method: replicate sf events 10x (one in-memory source registered as
the ``events`` view on both engines — Spark temp view, DuckDB parquet
view over the same written copy), then min-of-3 noop-write walls for:

- the FULL q164 statement through ``ch_sql`` under BOTH stats lanes
  (limb default vs the boxed DECIMAL(38,0) fallback), vs the exact
  q164 oracle on DuckDB;
- the isolated 4-aggregate moment scan (the family's hot core), plus
  the snap-cast-only and raw-BIGINT controls that decompose the
  residual: Spark's double -> DECIMAL(18,4) cast stringifies per row,
  and that snap — not the digit algebra — is the remaining gap
  (digit algebra alone measures at oracle parity).

Usage: python -m harness.probe_q164_scale [sf_dir] [replicas]
Prints a markdown table ready for SURVEY §2.J.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

import duckdb
from pyspark.sql import functions as F

from mb8600_clickhouse_spark.functions import chsql
from mb8600_clickhouse_spark.functions.chsql import (
    rewrite_clickhouse_sql,
    stats_agg_sql,
)
from mb8600_clickhouse_spark.queries.analytics import (
    _Q164_CLICKHOUSE_SQL,
    _q164_oracle,
)
from mb8600_clickhouse_spark.session import get_spark
from mb8600_clickhouse_spark.tables import load_tables

_DUCK = dict(int128="HUGEINT", dialect="duck")

MOMENT_CH = (
    "SELECT event_type, skewPop(value) AS sp, skewSamp(value) AS ss, "
    "kurtPop(value) AS kp, kurtSamp(value) AS ks "
    "FROM events GROUP BY event_type"
)


def _min3(fn) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("probe-q164")
    from mb8600_clickhouse_spark.functions.clickhouse import (
        register_clickhouse_functions,
    )

    register_clickhouse_functions(spark)
    ev = load_tables(spark, sf_dir)["events"]
    reps = spark.range(replicas).select(F.col("id").alias("rep"))
    scaled = (
        ev.crossJoin(F.broadcast(reps)).drop("rep").localCheckpoint(eager=True)
    )
    tmp = tempfile.mkdtemp(prefix="q164probe_")
    path = f"{tmp}/events.parquet"
    scaled.write.mode("overwrite").parquet(path)
    big = spark.read.parquet(path)
    big.createOrReplaceTempView("events")
    n = big.count()
    print(f"events x{replicas}: {n:,} rows")

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    # Spark writes a part-file directory; DuckDB reads it via glob
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    print("| probe | wall (min-of-3) | vs oracle |")
    print("|---|---|---|")
    oracle_sql = _q164_oracle()
    t_orc = _min3(lambda: con.execute(oracle_sql).fetchall())
    print(f"| q164 FULL oracle (DuckDB, HUGEINT lane) | {t_orc:.2f}s | 1.0x |")
    for lane in ("limb", "decimal"):
        prev = chsql.set_stats_lane(lane)
        df = spark.sql(rewrite_clickhouse_sql(_Q164_CLICKHOUSE_SQL))
        t = _min3(lambda: noop(df))
        print(f"| q164 FULL Spark, {lane} lane | {t:.2f}s | {t / t_orc:.1f}x |")
        chsql.set_stats_lane(prev)

    mom_oracle = (
        "SELECT event_type, "
        + ", ".join(
            f"{stats_agg_sql(fam, ['value'], **_DUCK)} AS {al}"
            for fam, al in (
                ("skewPop", "sp"), ("skewSamp", "ss"),
                ("kurtPop", "kp"), ("kurtSamp", "ks"),
            )
        )
        + " FROM events GROUP BY event_type"
    )
    t_orc_m = _min3(lambda: con.execute(mom_oracle).fetchall())
    print(f"| moment core oracle | {t_orc_m:.2f}s | 1.0x |")
    for lane in ("limb", "decimal"):
        prev = chsql.set_stats_lane(lane)
        df = spark.sql(rewrite_clickhouse_sql(MOMENT_CH))
        t = _min3(lambda: noop(df))
        print(
            f"| moment core Spark, {lane} lane | {t:.2f}s | "
            f"{t / t_orc_m:.1f}x |"
        )
        chsql.set_stats_lane(prev)
    v = "CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)"
    v_new = chsql.snap4_sql("value")
    for label, expr in (
        ("decimal snap-cast only (the r10 residual)", f"sum({v})"),
        ("floor snap only (round 11, the shipped spelling)", f"sum({v_new})"),
        ("raw BIGINT control (no snap)", "sum(CAST(value * 10000 AS BIGINT))"),
    ):
        df = spark.sql(
            f"SELECT event_type, {expr} FROM events GROUP BY event_type"
        )
        t = _min3(lambda: noop(df))
        print(f"| {label} | {t:.2f}s | {t / t_orc_m:.1f}x |")

    shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
