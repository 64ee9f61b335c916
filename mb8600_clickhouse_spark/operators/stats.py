"""Distributed two-sample statistics — the UNBOUNDED-cardinality path
the q165/q173 bridge docstrings point at.

The dialect bridge spells ``mannWhitneyUTest`` / ``kolmogorovSmirnovTest``
as collect-fold aggregate expressions (drop-in CH compatibility, O(n*d)
per group — the bounded-slice contract, measured quadratic in
harness/probe_stats.py). These operators compute the SAME statistics
relationally — window ranks / cumulative counts over keyed exchanges,
no collected state — which is linear per group and safe at any group
cardinality (the probe runs 200k-row groups in ~2 s where the fold
form needs bounded slices).

Exactness: identical to the bridge (and to q165/q173's oracles) —
average ranks are exact half-integers, tie terms exact integers, the
z / D tails are the SHARED emitters from ``functions.chsql``
(``mw_tail`` / ``ks_tail``), so a bridge result and an operator result
are bit-identical on the same data (test-pinned).

Scale shape (100 TB): one exchange keyed on the group column for the
rank windows (plus the per-(group, value) tie-count window sharing the
same partitioning), one partial-aggregated rollup. No driver state, no
collect, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.chsql import ks_tail, mw_tail


def _scaled(col):
    """DECIMAL(18,4)-snap ``col`` to a scaled BIGINT — LOUD on overflow.

    The snap's domain is |x| < 1e14 (DECIMAL(18,4)'s integral range);
    in a non-ANSI session a larger value would cast to NULL and — with
    the old null filter on the SCALED column — be silently dropped,
    skewing n0/n1/ranks and the resulting U/z/D statistics (ADVICE
    r08). Callers filter nulls on the RAW column, so a null snap here
    can only mean overflow: raise in-plan instead of dropping."""
    raw = F.col(col)
    snapped = (raw.cast("decimal(18,4)") * 10000).cast("bigint")
    return F.when(
        raw.isNotNull() & snapped.isNull(),
        F.raise_error(
            F.concat(
                F.lit(
                    f"stats operator domain: |{col}| exceeds the "
                    "DECIMAL(18,4) snap range (~1e14); got "
                ),
                raw.cast("string"),
            )
        ).cast("bigint"),
    ).otherwise(snapped)


def mann_whitney_u(
    df: DataFrame, value: str, sample: str, by: str
) -> DataFrame:
    """Per-``by``-group Mann-Whitney U over ``value`` split by the
    binary ``sample`` column (0 = first sample): returns
    (by, u0, u1, z) with average-rank tie handling and the
    tie-corrected normal z — exactly the bridge's contract
    (``chsql._mw_expr``), computed with window ranks instead of a
    collected fold."""
    v = _scaled(value)
    g = F.when(F.col(sample).cast("int") == 0, 0).otherwise(1)
    # null filter on the RAW columns, BEFORE the snap: a post-snap null
    # filter would silently drop overflowed values (ADVICE r08); with
    # raw nulls gone, _scaled raises on overflow instead
    base = df.filter(
        F.col(value).isNotNull() & F.col(sample).isNotNull()
    ).select(F.col(by).alias("g"), v.alias("v"), g.alias("s"))
    w_rank = Window.partitionBy("g").orderBy("v")
    w_tie = Window.partitionBy("g", "v")
    r = base.select(
        "g", "s", "v",
        (
            F.rank().over(w_rank).cast("double")
            + (F.count("*").over(w_tie).cast("double") - 1.0) / 2.0
        ).alias("ar"),
        F.count("*").over(w_tie).alias("teq"),
    )
    agg = r.groupBy("g").agg(
        F.sum(F.when(F.col("s") == 0, F.col("ar"))).alias("r0"),
        F.sum(F.when(F.col("s") == 0, 1).otherwise(0))
        .cast("double").alias("n0"),
        F.sum(F.when(F.col("s") != 0, 1).otherwise(0))
        .cast("double").alias("n1"),
        F.count("*").cast("double").alias("n"),
    )
    ties = (
        base.groupBy("g", "v")
        .agg(F.count("*").alias("tc"))
        .groupBy("g")
        .agg(
            F.sum(
                F.col("tc") * F.col("tc") * F.col("tc") - F.col("tc")
            ).alias("tsum")
        )
    )
    tail = mw_tail("r0", "n0", "n1", "n", "tsum", dialect="spark")
    return (
        agg.join(ties, "g")
        .selectExpr(f"g AS {by}", f"({tail}) AS mw")
        .selectExpr(by, "mw.u0 AS u0", "mw.u1 AS u1", "mw.z AS z")
    )


def ks_test(df: DataFrame, value: str, sample: str, by: str) -> DataFrame:
    """Per-``by``-group two-sample Kolmogorov-Smirnov D (exact — the
    integer ECDF-gap numerator over snapped values), computed with
    cumulative-count windows: the q173 oracle's spelling as a reusable
    operator."""
    v = _scaled(value)
    g = F.when(F.col(sample).cast("int") == 0, 0).otherwise(1)
    base = df.filter(  # raw-column null filter: the _scaled rule
        F.col(value).isNotNull() & F.col(sample).isNotNull()
    ).select(F.col(by).alias("g"), v.alias("v"), g.alias("s"))
    per_v = base.groupBy("g", "v").agg(
        F.sum(F.when(F.col("s") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("s") != 0, 1).otherwise(0)).alias("c1"),
    )
    w_cum = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per_v.select(
        "g",
        F.sum("c0").over(w_cum).alias("k0"),
        F.sum("c1").over(w_cum).alias("k1"),
    )
    tot = base.groupBy("g").agg(
        F.sum(F.when(F.col("s") == 0, 1).otherwise(0)).alias("n0i"),
        F.sum(F.when(F.col("s") != 0, 1).otherwise(0)).alias("n1i"),
    )
    dnum = (
        cum.join(tot, "g")
        .groupBy("g", "n0i", "n1i")
        .agg(
            F.max(
                F.abs(F.col("n1i") * F.col("k0") - F.col("n0i") * F.col("k1"))
            ).alias("dnum")
        )
    )
    tail = ks_tail(
        "dnum", "CAST(n0i AS DOUBLE)", "CAST(n1i AS DOUBLE)",
        dialect="spark",
    )
    return dnum.selectExpr(f"g AS {by}", f"({tail}).d AS d")


def weighted_quantile(
    df: DataFrame, value: str, weight: str, by: str, p: float
) -> DataFrame:
    """Per-``by``-group exact weighted quantile — ClickHouse's
    QuantileExactWeighted pick rule (sorted values, integer cumulative
    weights, first value whose cumulative weight reaches p * total) as
    a RELATIONAL operator: a cumulative-weight window over the keyed
    exchange, no collected state — the unbounded path of the q174
    bridge (same exact comparison operands, bit-identical results)."""
    if not (0.0 <= p <= 1.0):
        raise ValueError("quantile level must be in [0, 1]")
    v = _scaled(value)
    base = df.filter(  # raw-column null filter: the _scaled rule
        F.col(value).isNotNull() & F.col(weight).isNotNull()
    ).select(
        F.col(by).alias("g"), v.alias("v"),
        F.col(weight).cast("bigint").alias("w"),
    )
    w_cum = (
        Window.partitionBy("g")
        .orderBy("v", "w")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = base.select(
        "g", "v", F.sum("w").over(w_cum).alias("cw")
    )
    tot = base.groupBy("g").agg(F.sum("w").alias("tw"))
    picked = (
        cum.join(tot, "g")
        .filter(
            F.col("cw").cast("double")
            >= F.lit(float(p)) * F.col("tw").cast("double")
        )
        .groupBy("g")
        .agg(F.min("v").alias("vmin"))
    )
    return picked.select(
        F.col("g").alias(by),
        (F.col("vmin").cast("double") / 10000.0).alias("wq"),
    )
