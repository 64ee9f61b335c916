"""Round-7 scale probe for the round-6 operator families (r06 verdict
#2) — the same methodology as the round-4 dedup and round-5 similarity
probes (SURVEY §2.J): replicate the fixture 16x in the operator's WORST
direction and check that wall-clock grows sub-quadratically, with the
lever that controls any blow-up named next to the number.

Covered:
- ``graph.connected_components`` (q99/q105): a CHAIN of length n is the
  adversarial input for min-label propagation (diameter n, where the
  near-dup clusters of q99 have diameter ~2); rounds must stay
  O(log^2 n) and wall ~linear-in-edges per round.
- ``dedup.dup_span_stats`` (q107): 16x full-corpus replication makes
  EVERY span a corpus-wide duplicate — the frequency table stops
  shrinking anything and the join-back carries every occurrence.
- ``text.bm25_topk`` (q104): 16x corpus; the term filter keeps the
  post-scan stream proportional to matching rows only, so wall should
  track the scan, not the token stream.
- ``bpe.pair_counts`` + one merge round (q110): 16x corpus replication
  with per-replica token salting so DISTINCT words (the pair-count
  domain) actually grow — plain replication would be a no-op for a
  distinct-word algorithm.

Usage: python -m harness.probe_llm_ops [sf_dir]
Prints a markdown table ready for SURVEY §2.J.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from mb8600_clickhouse_spark.operators import bpe, dedup, graph
from mb8600_clickhouse_spark.operators import text as text_ops
from mb8600_clickhouse_spark.session import get_spark
from mb8600_clickhouse_spark.tables import load_tables


def _timed(label: str, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"| {label} | {dt:.2f}s | {out} |")
    return out, dt


def _chain_edges(spark, n: int):
    return spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("probe-llm-ops")
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    n_docs = docs.count()

    reps = spark.range(16).select(F.col("id").alias("rep"))
    docs16 = (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
            "text",
            "rep",
        )
        .localCheckpoint(eager=True)  # probes aren't billed for the build
    )
    n16 = docs16.count()
    print(f"fixture: {n_docs} docs; 16x replica: {n16}")
    print("| probe | wall | result |")
    print("|---|---|---|")

    # -- connected components: chain = worst diameter -----------------------
    for n in (10_000, 160_000):
        edges = _chain_edges(spark, n)
        _timed(
            f"components, chain n={n:,} (diameter {n})",
            lambda e=edges: graph.connected_components(e)
            .agg(F.countDistinct("component"))
            .first()[0],
        )

    # -- dup_span_stats: every span duplicated corpus-wide ------------------
    _timed(
        "dup_span_stats n=8, 1x corpus",
        lambda: dedup.dup_span_stats(docs, span_n=8).count(),
    )
    _timed(
        "dup_span_stats n=8, 16x corpus (all spans dup)",
        lambda: dedup.dup_span_stats(
            docs16.select("doc_id", "text"), span_n=8
        ).count(),
    )

    # -- BM25: term filter before first exchange ----------------------------
    _timed(
        "bm25_topk 3 terms k=50, 1x corpus",
        lambda: text_ops.bm25_topk(docs, ["hash", "merge", "vector"], k=50).count(),
    )
    _timed(
        "bm25_topk 3 terms k=50, 16x corpus",
        lambda: text_ops.bm25_topk(
            docs16.select("doc_id", "text"), ["hash", "merge", "vector"], k=50
        ).count(),
    )

    # -- BPE pair counting + one merge: distinct-word domain growth ---------
    # salt each replica's text with a replica-unique token so distinct
    # words (what pair_counts actually iterates) grow ~16x
    salted16 = docs16.select(
        "doc_id",
        F.concat(
            "text", F.lit(" tokx"), F.col("rep").cast("string"), F.lit("y")
        ).alias("text"),
    )

    def _one_merge(d):
        wsym = bpe.with_symbols(bpe.word_counts(d))
        pc = bpe.pair_counts(wsym)
        s1, s2, _ = bpe.best_pair(pc)
        return bpe.apply_merge(wsym, s1, s2).count()

    _timed("bpe pair-count + 1 merge, 1x corpus", lambda: _one_merge(docs))
    _timed(
        "bpe pair-count + 1 merge, 16x salted corpus",
        lambda: _one_merge(salted16),
    )

    # -- SemDeDup: one MEGA-CELL (the k-lever's worst case) -----------------
    # all vectors forced into a single cell: the per-cell matmul runs the
    # full n^2 in blockwise slabs — wall should grow ~quadratically in
    # vectors but memory stays slab-bounded (block x n)
    from pyspark.sql import functions as FF

    from mb8600_clickhouse_spark.operators import similarity as sim

    emb = load_tables(spark, sf_dir)["embeddings"].select(
        "vec_id", "embedding"
    )
    for mult in (1, 4):
        reps_m = spark.range(mult).select(F.col("id").alias("rep"))
        corpus = (
            emb.crossJoin(F.broadcast(reps_m))
            .select(
                (F.col("vec_id") + F.col("rep") * 1_000_000).alias("id"),
                FF.transform("embedding", lambda x: x.cast("double")).alias(
                    "v"
                ),
            )
            .withColumn("cell", F.lit(0))
            .localCheckpoint(eager=True)
        )
        n = corpus.count()
        _timed(
            f"semdedup mega-cell, n={n:,} (full n^2 in one cell)",
            lambda c=corpus: sim.semdedup(c, threshold=0.99)
            .where(~F.col("kept"))
            .count(),
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
