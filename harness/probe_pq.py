"""Product-quantization scale probe (round 8) — the §2.J discipline
applied to q142's operators: replicate the sf0.1 embeddings 16x
(distinct ids, unchanged vectors — encode/search cost is per-vector, so
replication is the honest scale direction here) and measure

- pq_fit wall (one Lloyd iteration, m=4 x ksub=16) at 1x vs 16x — the
  training exchange is M*ksub rows regardless of corpus size;
- pq_assign_codes (Catalyst fold) vs pq_encode_pandas (Arrow matmul)
  at 1x — the interpreted/vectorized gap that justifies shipping both;
- pq_encode_pandas at 16x — encode is a pure projection and must scale
  ~linearly;
- ADC top-k over 16x CODES vs exact cosine_topk over the 16x RAW
  vectors — the read-path saving PQ exists for (codes are 4 ints/row
  vs 64 doubles/row).

Usage: python -m harness.probe_pq [sf_dir]
Prints a markdown table ready for SURVEY §2.J.
"""

from __future__ import annotations

import sys
import time

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
    spark = get_spark("probe-pq")
    emb = load_tables(spark, sf_dir)["embeddings"].select("vec_id", "embedding")
    n_base = emb.count()

    reps = spark.range(16).select(F.col("id").alias("rep"))
    emb16 = (
        emb.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"),
            "embedding",
        )
        .localCheckpoint(eager=True)
    )
    n_16 = emb16.count()
    queries = emb.filter("vec_id < 3")
    print(f"base corpus: {n_base} vectors; 16x replica: {n_16}")
    print("| probe | wall | result |\n|---|---|---|")

    fitted: dict = {}

    def _fit_once():
        fitted["books"] = sim.pq_fit(emb, m=4, ksub=16, n_iter=1, assign="pandas")
        return len(fitted["books"])

    _timed("pq_fit 1x (m=4, ksub=16, 1 iter)", _fit_once)
    books = fitted["books"]
    _timed(
        "pq_fit 16x (m=4, ksub=16, 1 iter)",
        lambda: len(sim.pq_fit(emb16, m=4, ksub=16, n_iter=1, assign="pandas")),
    )
    _timed(
        "encode 1x, Catalyst fold (pq_assign_codes)",
        lambda: sim.pq_assign_codes(emb, books).count(),
    )
    _timed(
        "encode 1x, Arrow matmul (pq_encode_pandas)",
        lambda: sim.pq_encode_pandas(emb, books).count(),
    )
    _timed(
        "encode 16x, Arrow matmul",
        lambda: sim.pq_encode_pandas(emb16, books).count(),
    )
    codes16 = sim.pq_encode_pandas(emb16, books).localCheckpoint(eager=True)
    codes16.count()
    _timed(
        "ADC top-5, 3 queries, 16x CODES",
        lambda: sim.pq_adc_topk(codes16, queries, books, k=5).count(),
    )
    _timed(
        "exact cosine top-5, 3 queries, 16x RAW vectors",
        lambda: sim.cosine_topk(emb16, queries, k=5).count(),
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
