"""Round-8 scale probe for the statistical/interval/counter aggregate
bridges (chsql: _rewrite_stats_aggs / _rewrite_interval_aggs /
_rewrite_delta_ema / _rewrite_weighted_aggs / _rewrite_assoc_aggs) —
the SURVEY §2.J methodology: drive each operator into its worst
degenerate regime and check the wall-growth CLASS matches the
documented contract, naming the lever.

Two deliberate classes:

- **linear family** (moment sums, deltaSum, intervalLengthSum,
  quantileExactWeighted): constant or sorted-fold per-group state —
  hot-entity 16x must grow ~linearly.
- **quadratic-by-contract family** (mannWhitneyUTest,
  kolmogorovSmirnovTest, cramersV over high-cardinality categories):
  O(n*d) collect folds documented for BOUNDED slices; the probe shows
  the super-linear growth and the lever is the RELATIONAL spelling
  (window ranks / cumulative counts / contingency tables — exactly
  what the q165/q173/q174 oracles execute), which is linear per group.

Usage: python -m harness.probe_stats
Prints a markdown table ready for SURVEY §2.J.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from mb8600_clickhouse_spark.functions.chsql import rewrite_clickhouse_sql
from mb8600_clickhouse_spark.functions.clickhouse import (
    register_clickhouse_functions,
)
from mb8600_clickhouse_spark.session import get_spark


def _mk(spark, n: int, users: int, name: str):
    df = spark.range(n).select(
        (F.col("id") % users).alias("u"),
        (F.col("id")).alias("k"),
        (F.col("id") * 37 % 100000).alias("t"),
        ((F.col("id") * 2654435761) % 10000 / 100.0).alias("v"),
        # decorrelate the sample index from u = id % users (id % 2
        # would make every row of group 0 sample 0 when users is even)
        ((F.col("id") / users).cast("bigint") % 2).cast("int").alias("s"),
    )
    df.createOrReplaceTempView(name)
    return df


def _run(spark, sql: str) -> float:
    q = rewrite_clickhouse_sql(sql)
    spark.sql(q).write.format("noop").mode("overwrite").save()
    t0 = time.perf_counter()
    spark.sql(q).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> int:
    spark = get_spark("probe-stats")
    register_clickhouse_functions(spark)
    rows = []

    # linear family, hot entity: every row on ONE group
    lin = (
        "SELECT u, skewPop(v) AS sp, kurtSamp(v) AS ks, "
        "covarPop(v, k) AS cv, deltaSum(v, k) AS ds, "
        "intervalLengthSum(t, t + 50) AS ils, "
        "maxIntersections(t, t + 50) AS mi, "
        "quantileExactWeighted(0.9)(v, 1 + k % 7) AS qw "
        "FROM {v} GROUP BY u"
    )
    for n in (100_000, 1_600_000):
        _mk(spark, n, 1, "probe_lin")
        w = _run(spark, lin.format(v="probe_lin"))
        rows.append((f"linear family, HOT 1 user x {n:,} rows", w))

    # quadratic-by-contract family at its documented slice sizes
    quad = (
        "SELECT u, mannWhitneyUTest(v, s).z AS z, "
        "kolmogorovSmirnovTest(v, s).d AS d FROM {v} GROUP BY u"
    )
    for n in (2_000, 8_000):
        _mk(spark, n, 4, "probe_quad")
        w = _run(spark, quad.format(v="probe_quad"))
        rows.append((f"MW+KS folds, 4 groups x {n // 4:,} rows each", w))

    # the relational lever at 100x the quadratic family's slice
    rel = """
    WITH tot AS (
      SELECT u, CAST(SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS DOUBLE)
               AS n0,
             CAST(SUM(CASE WHEN s <> 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM probe_rel GROUP BY u
    ),
    r AS (
      SELECT u, s, v,
             RANK() OVER (PARTITION BY u ORDER BY v) AS rk,
             COUNT(*) OVER (PARTITION BY u, v) AS teq
      FROM probe_rel
    ),
    mw AS (
      SELECT u, SUM(CASE WHEN s = 0 THEN CAST(rk AS DOUBLE) +
               (CAST(teq AS DOUBLE) - 1.0) / 2.0 END) AS r0
      FROM r GROUP BY u
    )
    SELECT mw.u, (r0 - n0 * (n0 + 1.0) / 2.0 - n0 * n1 / 2.0) /
           sqrt(n0 * n1 * (n + 1.0) / 12.0) AS z_approx
    FROM mw JOIN tot ON mw.u = tot.u
    """
    _mk(spark, 800_000, 4, "probe_rel")
    t0 = time.perf_counter()
    spark.sql(rel).write.format("noop").mode("overwrite").save()
    rows.append(
        ("relational MW lever, 4 groups x 200,000 rows (window ranks)",
         time.perf_counter() - t0)
    )

    print("| probe | wall |")
    print("|---|---|")
    for label, w in rows:
        print(f"| {label} | {w:.2f} s |")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
