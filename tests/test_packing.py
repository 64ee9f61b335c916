"""Greedy sequence packing invariants."""

from __future__ import annotations

from pyspark.sql import Row

from mb8600_clickhouse_spark.operators.packing import pack_sequences


def _pack(spark, sizes, budget, group="g"):
    df = spark.createDataFrame(
        [Row(g=group, i=i, n=n) for i, n in enumerate(sizes)]
    )
    out = pack_sequences(df, ["g"], "i", "n", budget)
    rows = sorted(out.collect(), key=lambda r: r["i"])
    return [r["pack_id"] for r in rows]


class TestPackSequences:
    def test_greedy_boundaries(self, spark):
        # budget 10: [4,4] fits; 3 overflows; 9 overflows; 2 overflows 9+2
        assert _pack(spark, [4, 4, 3, 9, 2], 10) == [0, 0, 1, 2, 3]
        assert _pack(spark, [4, 4, 2, 9, 1], 10) == [0, 0, 0, 1, 1]

    def test_budget_respected_except_oversize(self, spark):
        sizes = [3, 8, 15, 2, 2]
        ids = _pack(spark, sizes, 10)
        totals = {}
        for n, p in zip(sizes, ids):
            totals[p] = totals.get(p, 0) + n
        for p, tot in totals.items():
            members = [n for n, q in zip(sizes, ids) if q == p]
            assert tot <= 10 or len(members) == 1  # only oversize alone
        # packs are contiguous and start at 0
        assert ids == sorted(ids) and ids[0] == 0

    def test_groups_pack_independently(self, spark):
        df = spark.createDataFrame(
            [Row(g=g, i=i, n=6) for g in ("a", "b") for i in range(3)]
        )
        out = pack_sequences(df, ["g"], "i", "n", 10)
        by_g = {}
        for r in out.collect():
            by_g.setdefault(r["g"], []).append((r["i"], r["pack_id"]))
        for g in ("a", "b"):  # each 6 overflows the previous pack of 6
            assert [p for _, p in sorted(by_g[g])] == [0, 1, 2]
