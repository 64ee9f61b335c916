"""Distributed BPE induction (operators/bpe.py): multi-round merge
learning is verified here against the pure-Python reference (q110
verifies round-one pair statistics differentially)."""

from __future__ import annotations

from mb8600_clickhouse_spark.operators import bpe

TEXTS = [
    "low low low low low lower lower newest newest",
    "newest newest newest newest widest widest widest",
    "new new new wider wider lowest",
]


def _df(spark):
    return spark.createDataFrame([(t,) for t in TEXTS], "text string")


class TestBpe:
    def test_merge_list_matches_reference(self, spark):
        got = bpe.bpe_learn(_df(spark), n_merges=8)
        ref = bpe.bpe_reference(TEXTS, n_merges=8)
        assert got == ref and len(got) == 8

    def test_stops_when_no_pair_repeats(self, spark):
        df = spark.createDataFrame([("ab cd",)], "text string")
        # every pair occurs once -> count < 2 -> no merges at all
        assert bpe.bpe_learn(df, n_merges=5) == bpe.bpe_reference(["ab cd"], 5) == []

    def test_within_word_repeat_counts_per_occurrence(self, spark):
        # 'aaa' contributes TWO (a,a) pairs per occurrence
        df = spark.createDataFrame([("aaa",)], "text string")
        pc = bpe.pair_counts(bpe.with_symbols(bpe.word_counts(df))).collect()
        assert [(r["s1"], r["s2"], r["cnt"]) for r in pc] == [("a", "a", 2)]


class TestApply:
    def test_segment_with_merges_matches_reference(self, spark):
        merges = bpe.bpe_reference(TEXTS, 6)
        # reference segmentation under the same merge list
        wc = {}
        for t in TEXTS:
            for w in " ".join(t.lower().split()).split(" "):
                wc[w] = wc.get(w, 0) + 1
        ref = {w: bpe.SEP.join(w) for w in wc}
        for s1, s2 in merges:
            ref = {w: s.replace(s1 + bpe.SEP + s2, s1 + s2) for w, s in ref.items()}
        wsym = bpe.with_symbols(bpe.word_counts(_df(spark)))
        got = {
            r["word"]: r["syms"]
            for r in bpe.segment_with_merges(wsym, merges).collect()
        }
        assert got == ref

    def test_apply_best_merge_equals_literal_round(self, spark):
        wsym = bpe.with_symbols(bpe.word_counts(_df(spark)))
        s1, s2, _ = bpe.best_pair(bpe.pair_counts(wsym))
        lit = {r["word"]: r["syms"] for r in bpe.apply_merge(wsym, s1, s2).collect()}
        dyn = {r["word"]: r["syms"] for r in bpe.apply_best_merge(wsym).collect()}
        assert lit == dyn


class TestBoundaryAnchoring:
    def test_merge_never_crosses_symbol_boundary(self, spark):
        """'abc' after merge (b,c) is ['a','bc']; a later (a,b) merge
        must NOT fuse across the boundary (the un-anchored replace
        would yield one 'abc' symbol)."""
        df = spark.createDataFrame([("abc",)], "text string")
        wsym = bpe.with_symbols(bpe.word_counts(df))
        m1 = bpe.apply_merge(wsym, "b", "c")
        m2 = bpe.apply_merge(m1, "a", "b")
        (r,) = m2.collect()
        assert r["syms"] == "a" + bpe.SEP + "bc"  # unchanged by (a,b)

    def test_adjacent_repeats_all_merge(self, spark):
        # a,b,a,b -> ab,ab (the zero-width right anchor must not
        # consume the separator between occurrences)
        df = spark.createDataFrame([("abab",)], "text string")
        wsym = bpe.with_symbols(bpe.word_counts(df))
        (r,) = bpe.apply_merge(wsym, "a", "b").collect()
        assert r["syms"] == "ab" + bpe.SEP + "ab"

    def test_blank_document_contributes_nothing(self, spark):
        df = spark.createDataFrame([("   ",), ("a b a b",)], "text string")
        pc = {(r["s1"], r["s2"]): r["cnt"]
              for r in bpe.pair_counts(bpe.with_symbols(bpe.word_counts(df))).collect()}
        assert ("", "") not in pc

    def test_reference_agrees_after_anchoring(self, spark):
        texts = ["abc abc bc bc bc ab ab", "aab aab abc"]
        got = bpe.bpe_learn(spark.createDataFrame([(t,) for t in texts], "text string"), 5)
        assert got == bpe.bpe_reference(texts, 5)
