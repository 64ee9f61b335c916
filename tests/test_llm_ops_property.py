"""Property tests: the round-6 LLM-pipeline operators against
brute-force pure-Python references on arbitrary tiny corpora —
duplicate-span statistics and bigram-LM linear scores. Guards the
positional/window/count conventions (per-occurrence counting, within-doc
repeats, sub-width docs, decimal-snapped sums) against regressions."""

from __future__ import annotations

import hashlib
from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from mb8600_clickhouse_spark.operators import dedup, lm

# tiny vocab so collisions/duplicates actually occur
word = st.sampled_from(["a", "b", "c", "ab", "xyz"])
text = st.lists(word, min_size=0, max_size=12).map(" ".join)
corpus = st.lists(text, min_size=1, max_size=6)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _spans(t: str, n: int) -> list[str]:
    w = " ".join(t.lower().split()).split(" ") if t.strip() else []
    return [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]


class TestDupSpanProperty:
    @given(corpus=corpus)
    @settings(**_SETTINGS)
    def test_matches_bruteforce(self, spark, corpus):
        n = 3
        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(corpus)]
        )
        got = {
            r["id"]: (r["n_spans"], r["n_dup_spans"])
            for r in dedup.dup_span_stats(df, span_n=n).collect()
        }
        all_spans: dict[str, int] = {}
        per_doc = {i: _spans(t, n) for i, t in enumerate(corpus)}
        for sp in per_doc.values():
            for s in sp:
                all_spans[s] = all_spans.get(s, 0) + 1
        want = {
            i: (len(sp), sum(1 for s in sp if all_spans[s] >= 2))
            for i, sp in per_doc.items()
            if sp
        }
        assert got == want


class TestBigramLmProperty:
    @given(corpus=corpus)
    @settings(**_SETTINGS)
    def test_matches_bruteforce(self, spark, corpus):
        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(corpus)]
        )
        got = {
            r["id"]: r
            for r in lm.bigram_lm_scores(df).collect()
        }
        occ: list[tuple[int, str, str]] = []
        for i, t in enumerate(corpus):
            w = " ".join(t.lower().split()).split(" ") if t.strip() else []
            occ += [(i, w[j], w[j + 1]) for j in range(len(w) - 1)]
        if not occ:
            assert got == {}
            return
        c2: dict[tuple[str, str], int] = {}
        c1: dict[str, int] = {}
        vocab = set()
        for _, a, b in occ:
            c2[(a, b)] = c2.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
            vocab.add(b)
        v = len(vocab)
        for i in set(d for d, _, _ in occ):
            mine = [(a, b) for d, a, b in occ if d == i]
            # the operator's exact arithmetic: snap each p to 8 decimals,
            # exact decimal sum, then double division
            terms = [
                Decimal(repr((c2[(a, b)] + 1.0) / (c1[a] + 1.0 * v))).quantize(
                    Decimal("0.00000001")
                )
                for a, b in mine
            ]
            want_avg = float(sum(terms)) / len(mine)
            assert got[i]["n_bigrams"] == len(mine)
            assert abs(got[i]["avg_p"] - want_avg) < 1e-12, (i, got[i], want_avg)
            assert got[i]["min_p"] == float(min(terms))
