"""Round-8 scale probe for the behavioral-analytics bridges
(chsql 2a2: windowFunnel / sequenceMatch / sequenceCount, q135-q137) —
the SURVEY §2.J methodology: drive each operator into its worst
degenerate regime and check wall growth stays linear, naming the lever.

The shared scale assumption is the one ClickHouse's own implementations
make: per-GROUP state is the group's condition-relevant events
(collect_list). Two adversarial directions:

- **hot entity**: ALL events collapse onto ONE user_id — the single
  collected list is the entire (filtered) corpus and one task folds it.
  The fold is O(events x pattern_len) with O(pattern_len) state, so
  wall must grow ~linearly in events and memory stays flat; the lever
  is the same as any hot-key aggregate (pre-filter conditions, or salt
  + re-merge is NOT applicable — chains don't decompose — so the
  honest lever is bounding per-entity event counts upstream, exactly
  as CH deployments do with max_rows_per_group).
- **replication**: 16x events across MANY users — embarrassingly
  parallel; wall should track the scan.

Usage: python -m harness.probe_behavioral [sf_dir]
Prints a markdown table ready for SURVEY §2.J.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from mb8600_clickhouse_spark.functions.chsql import rewrite_clickhouse_sql
from mb8600_clickhouse_spark.session import get_spark

FUNNEL = (
    "SELECT u, windowFunnel(900)(ts, event_type = 'view', "
    "event_type = 'click', event_type = 'purchase') AS lvl "
    "FROM {v} GROUP BY u"
)
SEQC = (
    "SELECT u, sequenceCount('(?1).*(?2)')(ts, event_type = 'error', "
    "event_type = 'purchase') AS c FROM {v} GROUP BY u"
)
SEQT = (
    "SELECT u, sequenceMatch('(?1)(?t<=900)(?2).*(?t>3600)(?3)')"
    "(ts, event_type = 'view', event_type = 'click', "
    "event_type = 'purchase') AS m FROM {v} GROUP BY u"
)
FUNNEL_SI = (
    "SELECT u, windowFunnel(900, 'strict_increase')(ts, "
    "event_type = 'view', event_type = 'click', "
    "event_type = 'purchase') AS lvl FROM {v} GROUP BY u"
)


def _timed(label: str, fn) -> None:
    t0 = time.perf_counter()
    out = fn()
    print(
        f"| {label} | {time.perf_counter() - t0:.1f} s "
        f"| {'materialized' if out is None else out} |",
        flush=True,
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("probe-behavioral")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n = ev.count()

    def reg(df, name):
        df.createOrReplaceTempView(name)
        return name

    # 1x baseline: real user distribution
    reg(ev.select(F.col("user_id").alias("u"), "ts", "event_type"), "ev1")
    # hot entity: every event is one user's (1x and 16x replicated with
    # distinct jittered timestamps so the sorted fold sees a real axis)
    reg(ev.select(F.lit(0).alias("u"), "ts", "event_type"), "ev_hot")
    reps = spark.range(16).select(F.col("id").alias("rep"))
    reg(
        ev.crossJoin(reps).select(
            F.lit(0).alias("u"),
            (F.col("ts") + F.make_interval(secs=F.col("rep") * 0.001)).alias("ts"),
            "event_type",
        ),
        "ev_hot16",
    )
    # 16x, spread over 16x distinct users (parallel direction)
    reg(
        ev.crossJoin(reps).select(
            (F.col("user_id") + F.col("rep") * 1_000_000).alias("u"),
            "ts",
            "event_type",
        ),
        "ev_wide16",
    )

    print("| probe | wall | result |")
    print("|---|---|---|")
    for label, view, rows in (
        (f"windowFunnel, real users ({n:,} ev)", "ev1", None),
        (f"windowFunnel, HOT entity (1 user x {n:,} ev)", "ev_hot", None),
        (f"windowFunnel, HOT entity 16x (1 user x {16 * n:,} ev)", "ev_hot16", None),
        (f"windowFunnel, wide 16x ({16 * n:,} ev)", "ev_wide16", None),
    ):
        q = rewrite_clickhouse_sql(FUNNEL.format(v=view))
        # noop write, NOT count(): count() lets Catalyst prune the
        # unreferenced fold column and the whole DP disappears (the
        # bench.py action rule)
        _timed(
            label,
            lambda q=q: spark.sql(q)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )
    for label, view in (
        (f"sequenceCount, HOT entity (1 user x {n:,} ev)", "ev_hot"),
        (f"sequenceCount, HOT entity 16x (1 user x {16 * n:,} ev)", "ev_hot16"),
        (f"timed sequenceMatch (q147 fold), HOT 16x (1 user x {16 * n:,} ev)", "__SEQT:ev_hot16"),
        (f"strict_increase funnel (q148 fold), HOT 16x (1 user x {16 * n:,} ev)", "__FSI:ev_hot16"),
    ):
        if view.startswith("__SEQT:"):
            q = rewrite_clickhouse_sql(SEQT.format(v=view.split(":")[1]))
        elif view.startswith("__FSI:"):
            q = rewrite_clickhouse_sql(FUNNEL_SI.format(v=view.split(":")[1]))
        else:
            q = rewrite_clickhouse_sql(SEQC.format(v=view))
        _timed(
            label,
            lambda q=q: spark.sql(q)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
