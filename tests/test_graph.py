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
