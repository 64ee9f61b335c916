"""Round-12 scale-convergence probe for the q19 star-join revenue
family (VERDICT r11 #1 follow-through): after the dim-first replan and
the limb dsum4 lane, q19 still measures ~12x warm vs DuckDB at 9.6M
lineitem rows — this probe decomposes WHERE that wall lives, because
the ratio-at-one-scale conflates Spark's fixed local-mode job cost
(scheduler, 32-task round trips, broadcast build) with the
data-proportional path the 100 TB bar actually cares about.

Method (the probe_q164_scale discipline, applied to a join):

1. SLOPE — the full registered q19 and its oracle at lineitem x R1 and
   x R2 (default 16 / 64; dims stay sf-sized, the realistic growth
   direction).  marginal_ratio = (T_spark(R2) - T_spark(R1)) /
   (T_oracle(R2) - T_oracle(R1)) is the ratio of the DATA-PROPORTIONAL
   costs with both engines' fixed floors subtracted — the number that
   survives a 100x scale-up, where the floor does not.
2. DECOMPOSITION at R2 — pieces of the Spark plan measured alone:
   - scan floor: one-column scan + count (task/scan overhead, no math);
   - scan + limb sum: the dsum4 revenue aggregate with NO joins
     (per-row snap/digit algebra cost), vs its exact DuckDB twin;
   - full q19: adds the two broadcast probes (dim build is 150k rows
     at every R — its cost is part of the FLOOR, not the slope).

Usage: python -m harness.probe_q19_scale [sf_dir] [R1 R2 [R3 ...]]
Prints a markdown table and merges a "q19_decomposition" record into
PROBE_SCALE.json. Round 13 (VERDICT r12 #2): any number of scale
points; pairwise marginals between adjacent points show whether the
data-proportional ratio holds flat as R grows — the decomposition
(scan floor / limb-sum-no-joins) runs at the LARGEST R.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import duckdb

from harness.probe_scale import build_scaled_dir
from mb8600_clickhouse_spark.queries import all_queries
from mb8600_clickhouse_spark.schemas import FIXTURE_TABLES
from mb8600_clickhouse_spark.session import get_spark

SCAN_SUM_ORACLE = """
SELECT l_returnflag,
       (CAST(SUM(CAST(round(CAST(l_extendedprice * (1 - l_discount)
            AS DOUBLE) * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0)
           AS revenue
FROM lineitem GROUP BY l_returnflag
"""


def _min3(fn) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    args = sys.argv[1:]
    sf_dir = next((a for a in args if "/" in a), "/root/testdata/sf0.1")
    reps = sorted({int(a) for a in args if "/" not in a}) or [16, 64]

    spark = get_spark("probe-q19")
    spark.sparkContext.setLogLevel("ERROR")
    spec = all_queries()["q19_multi_join_revenue"]

    rec: dict = {"sf_dir": sf_dir, "reps": reps}
    for k, r in enumerate(reps, 1):
        rec[f"r{k}"] = r
    print("| probe | spark | oracle | ratio |")
    print("|---|---|---|---|")
    last = f"r{len(reps)}"
    for tag, r in ((f"r{k}", r) for k, r in enumerate(reps, 1)):
        tmp_root = tempfile.mkdtemp(prefix=f"q19probe_{r}x_")
        tmp = os.path.join(
            tmp_root, os.path.basename(os.path.normpath(sf_dir))
        )
        os.makedirs(tmp, exist_ok=True)
        try:
            rows = build_scaled_dir(sf_dir, {"lineitem": r}, tmp)
            rec[f"{tag}_rows"] = rows["lineitem"]
            con = duckdb.connect()
            con.execute("SET threads TO 32")
            for t in FIXTURE_TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS "
                    f"SELECT * FROM read_parquet('{tmp}/{t}.parquet')"
                )

            df = spec.fn(spark, tmp)
            _noop(df)  # warm: footers, broadcasts, codegen
            t_s = _min3(lambda: _noop(df))
            orc = spec.oracle_for(tmp)
            con.execute(orc).fetchall()
            t_o = _min3(lambda: con.execute(orc).fetchall())
            rec[f"{tag}_spark_s"] = round(t_s, 3)
            rec[f"{tag}_oracle_s"] = round(t_o, 3)
            print(
                f"| q19 FULL x{r} ({rows['lineitem']:,} rows) "
                f"| {t_s:.2f}s | {t_o:.2f}s | {t_s / t_o:.1f}x |"
            )

            if tag == last:
                from mb8600_clickhouse_spark.queries.relational import (
                    dsum4,
                )
                from mb8600_clickhouse_spark.tables import load_tables
                from pyspark.sql import functions as F

                li = load_tables(spark, tmp)["lineitem"]
                floor_df = li.select("l_orderkey").groupBy().count()
                _noop(floor_df)
                rec[f"{last}_scan_floor_s"] = round(
                    _min3(lambda: _noop(floor_df)), 3
                )
                ss = li.groupBy("l_returnflag").agg(
                    dsum4(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                    ).alias("revenue")
                )
                _noop(ss)
                t_ss = _min3(lambda: _noop(ss))
                con.execute(SCAN_SUM_ORACLE).fetchall()
                t_sso = _min3(
                    lambda: con.execute(SCAN_SUM_ORACLE).fetchall()
                )
                rec[f"{last}_scan_sum_spark_s"] = round(t_ss, 3)
                rec[f"{last}_scan_sum_oracle_s"] = round(t_sso, 3)
                print(
                    f"| scan floor (1-col count) x{r} "
                    f"| {rec[f'{last}_scan_floor_s']:.2f}s | - | - |"
                )
                print(
                    f"| scan + limb dsum4, no joins x{r} "
                    f"| {t_ss:.2f}s | {t_sso:.2f}s | {t_ss / t_sso:.1f}x |"
                )
            con.close()
        finally:
            shutil.rmtree(tmp_root, ignore_errors=True)

    marginals = {}
    for k in range(1, len(reps)):
        a, b = f"r{k}", f"r{k + 1}"
        d_s = rec[f"{b}_spark_s"] - rec[f"{a}_spark_s"]
        d_o = rec[f"{b}_oracle_s"] - rec[f"{a}_oracle_s"]
        # non-monotonic guard (ADVICE r13): a NEGATIVE Spark delta means
        # wall time DECREASED as the data grew — measurement noise at or
        # below the fixed-cost floor, not a data-proportional slope.
        # Record it as inconclusive rather than committing a negative
        # number as "the ratio that survives scale-up".
        if d_o <= 0 or d_s < 0:
            mr = None
        else:
            mr = round(d_s / d_o, 2)
        marginals[f"{reps[k - 1]}x->{reps[k]}x"] = mr
        print(
            f"| MARGINAL (slope {reps[k - 1]}x->{reps[k]}x) "
            f"| {d_s:.2f}s | {d_o:.2f}s | "
            f"{mr if mr is not None else 'inconclusive/noise'}x |"
        )
    rec["marginal_ratios"] = marginals
    rec["marginal_ratio"] = list(marginals.values())[-1]
    if rec["marginal_ratio"] is None:
        rec["marginal_ratio_note"] = (
            "last slope non-monotonic (spark wall decreased as data "
            "grew) — fixed-cost floor dominates; inconclusive, not 0x"
        )
    rec["note"] = (
        "marginal_ratio = data-proportional spark/oracle cost with both "
        "fixed floors subtracted (the slope between R1 and R2) — the "
        "number that survives scale-up; the per-R 'FULL' ratios include "
        "Spark's fixed local-mode job cost, which amortizes at scale"
    )

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(root, "PROBE_SCALE.json")
    out = {"queries": {}}
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                out = json.load(f)
        except (OSError, ValueError):
            pass
    out["q19_decomposition"] = rec
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print("merged q19_decomposition into PROBE_SCALE.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
