"""Similarity-path scale probe (round 5) — mirrors the round-4 dedup
probe (SURVEY §2.J): measure the q49/q54 operator shapes at a synthetic
16x replication of the sf0.1 embeddings, candidate counts with/without
``max_bucket``, and whether the IVF centroid-literal approach survives
10^4 centroids (janino / plan-size limits).

Usage: python -m harness.probe_similarity [sf_dir]
Prints a markdown table ready for SURVEY §2.J.

Replication scheme: each replica t in [0, 16) re-emits every vector
under id + 100_000 * t, unchanged — the worst case for bucketed
candidate generation, since every replica of a vector lands in the SAME
LSH bucket (pair counts grow with the square of the duplication factor
unless capped; identical trade to the dedup probe's boilerplate docs).
"""

from __future__ import annotations

import sys
import time

import numpy as np
from pyspark.sql import functions as F

from mb8600_clickhouse_spark.operators import similarity as sim
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
    spark = get_spark("probe-similarity")
    emb = load_tables(spark, sf_dir)["embeddings"].select("vec_id", "embedding")
    n_base = emb.count()

    reps = spark.range(16).select(F.col("id").alias("rep"))
    emb16 = emb.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") + F.col("rep") * 100_000).alias("vec_id"), "embedding"
    )
    # materialize the replica once so no probe is billed for the build
    emb16 = emb16.localCheckpoint(eager=True)
    n_16 = emb16.count()
    print(f"base corpus: {n_base} vectors; 16x replica: {n_16}")
    print("| probe | wall | result |\n|---|---|---|")

    # --- q49 shape: LSH candidates + exact cosine verify ------------------
    _timed(
        "lsh candidates, base, uncapped",
        lambda: sim.lsh_candidate_pairs(emb).count(),
    )
    _timed(
        "lsh candidates, 16x, uncapped",
        lambda: sim.lsh_candidate_pairs(emb16).count(),
    )
    _timed(
        "lsh candidates, 16x, max_bucket=10000",
        lambda: sim.lsh_candidate_pairs(emb16, max_bucket=10_000).count(),
    )
    _timed(
        "lsh candidates, 16x, max_bucket=500 (does not bind: ~125/bucket)",
        lambda: sim.lsh_candidate_pairs(emb16, max_bucket=500).count(),
    )
    _timed(
        "lsh candidates, 16x, max_bucket=50 (binding)",
        lambda: sim.lsh_candidate_pairs(emb16, max_bucket=50).count(),
    )
    _timed(
        "lsh candidates, 16x, n_bits=16 (65k buckets)",
        lambda: sim.lsh_candidate_pairs(emb16, n_bits=16).count(),
    )
    _timed(
        "embedding_neardup(0.98), 16x, max_bucket=500",
        lambda: sim.embedding_neardup(emb16, max_bucket=500).count(),
    )
    _timed(
        "embedding_neardup(0.98), 16x, n_bits=16 + 2 tables",
        lambda: sim.embedding_neardup(emb16, n_bits=16, n_tables=2).count(),
    )

    # --- q54 shape: IVF top-k at 16x corpus -------------------------------
    cents = emb.filter(F.col("vec_id") < 8)
    queries = emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 13))
    corpus16 = emb16.filter(F.col("vec_id") % 100_000 >= 50)
    _timed(
        "ivf_topk k=5 nprobe=2, 16x corpus, pandas",
        lambda: sim.ivf_topk(corpus16, queries, cents, k=5, nprobe=2).count(),
    )
    _timed(
        "ivf_topk k=5 nprobe=2, 16x corpus, expr",
        lambda: sim.ivf_topk(
            corpus16, queries, cents, k=5, nprobe=2, assign_impl="expr"
        ).count(),
    )

    # --- 10^4 centroids: does the literal approach hold? ------------------
    rng = np.random.default_rng(7)
    big_cents = [
        (int(i), [float(x) for x in rng.standard_normal(64)]) for i in range(10_000)
    ]
    _timed(
        "ivf_assign_pandas, 16x corpus, 10^4 centroids (640k-double literal-free)",
        lambda: sim.ivf_assign_pandas(emb16, big_cents).count(),
    )
    # expr mode carries the 640k-element array literal through janino —
    # run on a small slice: the point is compile survival + per-row cost,
    # not throughput. Opt-in (--full): measured once at 377s/100 rows —
    # the fold's 10^4 x 64 interpreted steps per row are prohibitive,
    # which is exactly why assign_impl='pandas' is the default.
    if "--full" in sys.argv:
        _timed(
            "ivf_assign (expr), 100 vectors, 10^4 centroids (640k-double literal)",
            lambda: sim.ivf_assign(
                emb.filter(F.col("vec_id") < 100), big_cents
            ).count(),
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
