"""Round-8 scale probe for the two documented-then-built levers
(r07 verdict #4): q138's two-phase range-partitioned cumsum and q130's
broadcast approx-quantile CCNet cuts. Same methodology as the other
probes (SURVEY §2.J): replicate the fixture 16x in the operator's WORST
direction — here, ONE GIANT SOURCE (the exact case the one-window
spelling serializes) — and show the lever's plan property (bucketed
window / window-free) plus equal-or-better wall.

Usage: python -m harness.probe_levers [sf_dir]
Prints a markdown table ready for SURVEY §2.J.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from mb8600_clickhouse_spark.operators import lm, sampling
from mb8600_clickhouse_spark.session import get_spark
from mb8600_clickhouse_spark.tables import load_tables


def _timed(label: str, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"| {label} | {dt:.2f}s | {out} |")
    return out, dt


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("probe-levers")
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")

    # 16x replica, ALL in one source — the giant-single-source worst
    # case where the one-window cumsum serializes onto a single task
    reps = spark.range(16).select(F.col("id").alias("rep"))
    giant = (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
            F.lit("web").alias("source"),
            "text",
        )
        .localCheckpoint(eager=True)
    )
    n = giant.count()
    print(f"giant single source: {n:,} docs")
    print("| probe | wall | result |")
    print("|---|---|---|")

    budget = 2_000_000  # keeps ~a third of the giant source
    w = {"web": 1.0}
    (one, _), (two, _) = (
        _timed(
            "budget_mix ONE window (single task sorts the source)",
            lambda: sampling.budget_mix(giant, w, budget)
            .agg(F.count("*"), F.sum("n_tokens"))
            .first(),
        ),
        _timed(
            "budget_mix two_phase n_ranges=64 (bucket-parallel)",
            lambda: sampling.budget_mix(
                giant, w, budget, two_phase=True, n_ranges=64
            )
            .agg(F.count("*"), F.sum("n_tokens"))
            .first(),
        ),
    )
    print(f"| kept sets equal | — | {tuple(one) == tuple(two)} |")

    # CCNet cuts: score the 16x corpus once, then bucket it both ways
    per = lm.bigram_lm_scores(giant).select(
        F.col("id").alias("doc_id"), "avg_p"
    ).localCheckpoint(eager=True)
    per.count()

    from pyspark.sql import Window as W

    wnt = W.orderBy(F.col("avg_p").desc(), F.col("doc_id"))
    _timed(
        "ntile(3) global window (single-task sort of all scores)",
        lambda: per.withColumn("b", F.ntile(3).over(wnt))
        .groupBy("b")
        .count()
        .orderBy("b")
        .collect(),
    )
    _timed(
        "ccnet_cut_buckets approx cuts (window-free projection)",
        lambda: lm.ccnet_cut_buckets(per)
        .groupBy("bucket")
        .count()
        .orderBy("bucket")
        .collect(),
    )
    plan = lm.ccnet_cut_buckets(per)._jdf.queryExecution().optimizedPlan().toString()
    print(f"| cut-bucket plan window-free | — | {'Window' not in plan} |")

    # -- pagerank production posture: n_iter=20 with dangling sinks ------
    # host graph with ~30% dangling (every 3rd host has no outlinks);
    # redistribute keeps sum(rank)=1 and checkpointing bounds the plan
    from mb8600_clickhouse_spark.operators import graph

    n_hosts = 20_000
    edges = (
        spark.range(n_hosts * 4)
        .select(
            (F.col("id") % n_hosts).alias("src"),
            ((F.col("id") * 7 + 3) % n_hosts).alias("dst"),
            (F.col("id") % 5 + 1).cast("double").alias("w"),
        )
        .filter(F.col("src") % 3 != 0)  # every 3rd host dangles
        .localCheckpoint(eager=True)
    )
    for ck in (5, 1):
        _timed(
            f"pagerank n_iter=20 redistribute ck={ck}, "
            f"{n_hosts:,} hosts (~1/3 dangling)",
            lambda c=ck: graph.pagerank(
                edges, n_iter=20, weight="w",
                dangling="redistribute", checkpoint_every=c,
            ).agg(F.round(F.sum("rank"), 6)).first()[0],
        )

    # -- round-9 limb-split BIGINT moment lever (VERDICT r08 #4) --------
    # q164-class moment scan at 100x sf0.1 events: DECIMAL(38,0) boxed
    # products vs ten codegen BIGINT digit sums + one per-group DECIMAL
    # recombination — identical exact sums, the per-row cost is the gap
    from mb8600_clickhouse_spark.operators.stats import skew_kurt

    ev = load_tables(spark, sf_dir)["events"].select("event_type", "value")
    reps100 = spark.range(100).select(F.col("id").alias("rep"))
    mom = (
        ev.crossJoin(F.broadcast(reps100))
        .select("event_type", "value")
        .localCheckpoint(eager=True)
    )
    print(f"moment scan: {mom.count():,} rows")
    outs = {}

    def _run(m):
        rows = tuple(
            sorted(skew_kurt(mom, "value", "event_type", method=m).collect())
        )
        outs.setdefault(m, rows)
        return f"{len(rows)} groups"

    for method in ("decimal", "limb", "decimal", "limb"):
        _timed(f"skew/kurt moments method={method}", lambda m=method: _run(m))
    print(f"| limb bit-identical to decimal | — | "
          f"{outs['decimal'] == outs['limb']} |")

    # -- round-9 two-phase distribution ranks (the q57 class) -----------
    # ONE partition-key value at 64x orders: the window form caps at a
    # single task; distribution_ranks fans the sort across value
    # buckets. Cuts are PREPARED (the q130 index-build contract) —
    # a deployment computes them once per table, not per query.
    from pyspark.sql import Window as PW

    from mb8600_clickhouse_spark.operators.stats import distribution_ranks

    orders = load_tables(spark, sf_dir)["orders"]
    reps64 = spark.range(64).select(F.col("id").alias("rep"))
    giant_o = (
        orders.crossJoin(F.broadcast(reps64))
        .select(
            F.lit("all").alias("k"),
            F.col("o_totalprice").alias("price"),
            (F.col("o_orderkey") * 64 + F.col("rep")).alias("pk"),
        )
        .localCheckpoint(eager=True)
    )
    print(f"distribution ranks over ONE key: {giant_o.count():,} rows")
    dr_cuts = giant_o.stat.approxQuantile(
        "price", [i / 32 for i in range(1, 32)], 0.01
    )
    wq = PW.partitionBy("k").orderBy("price", "pk")
    res = {}

    def _win():
        rows = giant_o.select(
            F.ntile(4).over(wq).alias("q"),
            F.percent_rank().over(wq).alias("pr"),
        ).agg(F.sum("q"), F.round(F.sum("pr"), 4)).first()
        res.setdefault("win", tuple(rows))
        return tuple(rows)

    def _two():
        rows = distribution_ranks(
            giant_o, "k", ["price", "pk"], n_ranges=32, cuts=dr_cuts
        ).agg(F.sum("quartile"), F.round(F.sum("pct_rank"), 4)).first()
        res.setdefault("two", tuple(rows))
        return tuple(rows)

    for lbl, fn in (("one-task window", _win), ("two-phase buckets", _two),
                    ("one-task window", _win), ("two-phase buckets", _two)):
        _timed(f"distribution ranks {lbl}", fn)
    print(f"| two-phase equals window | — | {res['win'] == res['two']} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
