"""Connected components (operators/graph.py) vs an in-test union-find.

Ground truth is a 30-line union-find over the same edge list — an
independent sequential implementation, so the distributed alternating
large-star/small-star result is differentially checked, not
self-checked."""

from __future__ import annotations

import random

import pytest

from mb8600_clickhouse_spark.operators.graph import connected_components


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # min-id label per node
    return {x: find(x) for x in parent}


def _labels(spark, edges):
    df = spark.createDataFrame(edges, "src: long, dst: long")
    out = connected_components(df).collect()
    return {r["node"]: r["component"] for r in out}


def test_two_triangles_and_chain(spark):
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (5, 6), (6, 7), (7, 8)]
    assert _labels(spark, edges) == _union_find(edges)


def test_long_chain_converges_in_log_rounds(spark):
    # a 64-link path is the worst case for naive min-label propagation
    # (64 rounds); the alternating algorithm must finish well inside the
    # max_iter bound
    edges = [(i, i + 1) for i in range(64)]
    assert _labels(spark, edges) == _union_find(edges)


def test_duplicate_reversed_and_self_edges(spark):
    edges = [(2, 1), (1, 2), (3, 3), (2, 3), (9, 9)]
    got = _labels(spark, edges)
    # self-loop-only nodes are isolated -> absent from the result
    assert 9 not in got
    assert got == {1: 1, 2: 1, 3: 1}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_graphs_match_union_find(spark, seed):
    rng = random.Random(seed)
    n = 120
    edges = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(150)
    ]
    edges = [(u, v) for u, v in edges if u != v]
    assert _labels(spark, edges) == _union_find(edges)


def test_component_is_min_id(spark):
    edges = [(100, 7), (7, 55), (55, 3)]
    got = _labels(spark, edges)
    assert set(got.values()) == {3}


def test_cluster_representatives_deterministic(spark):
    from mb8600_clickhouse_spark.operators.graph import cluster_representatives

    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)], "node: long, component: long"
    )
    a = {r.component: r.representative for r in cluster_representatives(comps).collect()}
    b = {r.component: r.representative for r in cluster_representatives(comps).collect()}
    assert a == b
    assert set(a) == {1, 10}
    assert a[1] in {1, 2, 3} and a[10] in {10, 11}
    # a different salt may pick differently but stays within the cluster
    c = {r.component: r.representative
         for r in cluster_representatives(comps, salt="other").collect()}
    assert c[1] in {1, 2, 3} and c[10] in {10, 11}


class TestPageRank:
    """graph.pagerank — fixed-iteration weighted PageRank (q152 is the
    oracle twin)."""

    def test_uniform_cycle_stays_uniform(self, spark):
        # a pure cycle is doubly stochastic: ranks stay 1/N forever
        edges = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 0)], "src long, dst long"
        )
        from mb8600_clickhouse_spark.operators.graph import pagerank

        out = {r["node"]: r["rank"] for r in pagerank(edges, n_iter=4).collect()}
        for v in out.values():
            assert abs(v - 1 / 3) < 1e-9

    def test_sink_authority_and_weights(self, spark):
        from mb8600_clickhouse_spark.operators.graph import pagerank

        # 0 and 1 both point at 2; 2 points back at 0. 2 accumulates.
        edges = spark.createDataFrame(
            [(0, 2, 1.0), (1, 2, 1.0), (2, 0, 1.0)],
            "src long, dst long, w double",
        )
        # n_iter=50: the 0<->2 loop oscillates with period 2, so an
        # under-converged even/odd cut can transiently rank 0 above 2
        out = {r["node"]: r["rank"] for r in pagerank(edges, n_iter=50, weight="w").collect()}
        assert out[2] > out[0] > out[1]  # fixpoint: r2=0.4865, r0=0.4635
        assert abs(sum(out.values()) - 1.0) < 1e-6
        # weights steer the split: 0 now favors 1 heavily
        edges2 = spark.createDataFrame(
            [(0, 1, 9.0), (0, 2, 1.0), (1, 0, 1.0), (2, 0, 1.0)],
            "src long, dst long, w double",
        )
        out2 = {r["node"]: r["rank"] for r in pagerank(edges2, n_iter=10, weight="w").collect()}
        assert out2[1] > out2[2]

    def test_deterministic_across_runs(self, spark):
        from mb8600_clickhouse_spark.operators.graph import pagerank

        edges = spark.createDataFrame(
            [(i % 5, (i * 3 + 1) % 5) for i in range(25)], "src long, dst long"
        )
        a = sorted(map(tuple, pagerank(edges, n_iter=3).collect()))
        b = sorted(map(tuple, pagerank(edges, n_iter=3).collect()))
        assert a == b
