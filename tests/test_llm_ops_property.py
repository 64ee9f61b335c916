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


class TestC4Rules:
    """text.c4_rules — the C4 line/doc rule filter (q126 is the oracle
    twin; these pin the rule semantics on hand-built pages)."""

    def test_line_and_doc_rules(self, spark):
        from pyspark.sql import Row

        from mb8600_clickhouse_spark.operators.text import c4_rules

        page = (
            "one two three four five.\n"      # kept line, 1 sentence
            "short.\n"                         # terminal but <5 words
            "no terminal six seven eight\n"    # >=5 words, no terminal
            "a b c d e f!\n"                   # kept, 1 sentence
            'quoted line with five words"'     # kept (quote terminal)
        )
        rows = [
            Row(doc_id=1, text=page + "\nlast one two three four?"),  # 3+ sents
            Row(doc_id=2, text=page),                                  # 2 sents
            Row(doc_id=3, text=page + "\nlorem ipsum dolor sit amet."),
            Row(doc_id=4, text=page + "\ncode line { six seven eight nine."),
            Row(doc_id=5, text=page + "\nthis text has badword in it today?"),
        ]
        out = {r["doc_id"]: r for r in c4_rules(spark.createDataFrame(rows)).collect()}
        assert out[1]["kept"] and out[1]["n_sentences"] >= 3
        assert not out[2]["kept"]  # only 2 terminal marks in kept lines
        assert out[3]["flag_lorem"] and not out[3]["kept"]
        assert out[4]["flag_brace"] and not out[4]["kept"]
        assert out[5]["flag_badword"] and not out[5]["kept"]
        assert out[2]["n_lines"] == 5 and out[2]["n_kept_lines"] == 3

    def test_badword_is_word_bounded(self, spark):
        from pyspark.sql import Row

        from mb8600_clickhouse_spark.operators.text import c4_rules

        rows = [Row(doc_id=1, text="notabadwordhere is fine today ok.")]
        out = c4_rules(spark.createDataFrame(rows)).collect()[0]
        assert not out["flag_badword"]


class TestHtmlExtract:
    """text.html_to_text / html_title / html_link_count (q146 is the
    oracle twin)."""

    def _one(self, spark, html):
        from pyspark.sql import Row
        from pyspark.sql import functions as F

        from mb8600_clickhouse_spark.operators.text import (
            html_link_count,
            html_title,
            html_to_text,
        )

        return (
            spark.createDataFrame([Row(h=html)])
            .select(
                html_to_text(F.col("h")).alias("t"),
                html_title(F.col("h")).alias("title"),
                html_link_count(F.col("h")).alias("links"),
            )
            .collect()[0]
        )

    def test_blocks_tags_entities(self, spark):
        out = self._one(
            spark,
            "<html><head><title>A  B</title><style>p red</style></head>"
            "<body><script>if (x < 3) go();</script><p>Tom &amp; Jerry "
            "&lt;3</p><a href='x'>one</a><!-- note --><A HREF='y'>two</A>"
            "</body></html>",
        )
        assert out["t"] == "A B Tom & Jerry <3 one two"
        assert out["title"] == "A B"
        assert out["links"] == 2  # case-insensitive: <A HREF counts too

    def test_link_count_tolerates_newlines_and_bare_anchors(self, spark):
        out = self._one(
            spark, "<a\nhref='x'>one</a><a>two</a><a\thref='y'>three</a><abbr>no</abbr>"
        )
        assert out["links"] == 3

    def test_amp_decoded_last(self, spark):
        # '&amp;lt;' must become the literal '&lt;', NOT '<'
        out = self._one(spark, "<p>&amp;lt;</p>")
        assert out["t"] == "&lt;"

    def test_multiline_script_stripped(self, spark):
        out = self._one(spark, "<script>\nvar a=1;\nvar b=2;\n</script>hi")
        assert out["t"] == "hi"


class TestGopherRules:
    """text.gopher_rules — the Gopher doc-level quality gate (q141 is
    the oracle twin; these pin each rule on hand-built docs)."""

    def test_each_rule_fires(self, spark):
        from pyspark.sql import Row

        from mb8600_clickhouse_spark.operators.text import gopher_rules

        good = "the cat sat with that dog and they have fun near " * 6  # 60 words
        rows = [
            Row(doc_id=1, text=good.strip()),
            Row(doc_id=2, text="the cat sat with that"),  # < min_words
            Row(doc_id=3, text=("a b " * 30 + "the that").strip()),  # mean len < 3
            Row(doc_id=4, text=(good + "# " * 12).strip()),  # symbol ratio > 0.1
            Row(doc_id=5, text=good.strip() + ("\n- b" * 30)),  # >90% bullets...
            Row(doc_id=6, text=good.strip() + ("\nx..." * 9)),  # >30% ellipsis lines
            Row(doc_id=7, text=("12 34 " * 30 + "the that").strip()),  # alpha < 80%
            Row(doc_id=8, text=("cat dog run sun big red hot icy " * 8).strip()),
        ]
        out = {
            r["doc_id"]: r
            for r in gopher_rules(spark.createDataFrame(rows), min_words=40).collect()
        }
        assert out[1]["kept"]
        assert not out[2]["kept"] and out[2]["n_words"] == 5
        assert not out[3]["kept"]  # mean word length below 3
        assert not out[4]["kept"] and out[4]["n_symbols"] == 12
        assert not out[5]["kept"] and out[5]["n_bullet_lines"] == 30
        assert not out[6]["kept"] and out[6]["n_ellipsis_lines"] == 9
        assert not out[7]["kept"]  # <80% alphabetic words
        assert not out[8]["kept"] and out[8]["n_stop_hits"] == 0

    def test_integer_gate_boundaries(self, spark):
        from pyspark.sql import Row

        from mb8600_clickhouse_spark.operators.text import gopher_rules

        # exactly 10% symbols (5 of 50 words) passes: <= not <
        body = ("the cat sat with that dog and they have fun " * 5).strip()  # 50
        fifty = body.rsplit(" ", 5)[0] + " # # # # #"  # 45 words + 5 hashes
        out = gopher_rules(
            spark.createDataFrame([Row(doc_id=1, text=fifty)]), min_words=40
        ).collect()[0]
        assert out["n_words"] == 50 and out["n_symbols"] == 5
        assert out["kept"]

    def test_word_char_algebra_under_messy_whitespace(self, spark):
        """Round-13 lever pin: n_word_chars = length(norm) - (n_words - 1)
        must equal the per-word character sum even when the raw text
        carries runs of spaces, tabs and newlines (the algebra only
        holds over the \\s+-collapsed norm)."""
        from pyspark.sql import Row

        from mb8600_clickhouse_spark.operators.text import gopher_rules

        text = "The  cat\t\tsat\n\n  with   THAT  dog  "
        out = gopher_rules(
            spark.createDataFrame([Row(doc_id=1, text=text)]), min_words=1
        ).collect()[0]
        words = text.lower().split()
        assert out["n_words"] == len(words) == 6
        assert out["n_word_chars"] == sum(len(w) for w in words)

    def test_stop_hits_count_distinct_stopwords(self, spark):
        """Round-13 lever pin: n_stop_hits is the number of DISTINCT
        required stopwords present (array_intersect), not occurrence
        count — 'the the the and and' hits 2, not 5."""
        from pyspark.sql import Row

        from mb8600_clickhouse_spark.operators.text import gopher_rules

        out = gopher_rules(
            spark.createDataFrame([Row(doc_id=1, text="the the the and and")]),
            min_words=1,
        ).collect()[0]
        assert out["n_stop_hits"] == 2


class TestUrlNormalize:
    """text.url_normalize / url_host — RefinedWeb URL canonicalization
    (q131 is the oracle twin)."""

    def test_normalization_rules(self, spark):
        from pyspark.sql import Row

        from pyspark.sql import functions as F

        from mb8600_clickhouse_spark.operators.text import url_normalize

        cases = [
            ("http://WWW.Example.COM:80/a/7/?utm_source=x&ref=2#sec",
             "https://example.com/a/7?ref=2"),
            ("https://example.com:443/a/7", "https://example.com/a/7"),
            ("https://news.site.org/Path/Case", "https://news.site.org/Path/Case"),
            ("https://h.io/p?utm_a=1&utm_b=2", "https://h.io/p"),
            ("https://h.io/p?b=2&a=1", "https://h.io/p?b=2&a=1"),  # order kept
            ("not a url", None),
        ]
        df = spark.createDataFrame([Row(u=u) for u, _ in cases])
        got = [r["n"] for r in df.select(url_normalize(F.col("u")).alias("n")).collect()]
        assert got == [want for _, want in cases]


class TestGopherRulesProperty:
    """Property: every gopher_rules counter equals a direct Python
    computation over random small documents (newlines, bullets,
    ellipses, hashes, digits and stopwords all in the alphabet)."""

    def test_matches_python_reference(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from mb8600_clickhouse_spark.operators.text import (
            GOPHER_STOPWORDS,
            gopher_rules,
        )

        word = st.sampled_from(
            ["cat", "dog", "the", "that", "have", "42", "#", "a...b", "x"]
        )
        line = st.lists(word, min_size=0, max_size=6).map(" ".join)
        doc = st.lists(line, min_size=1, max_size=5).map("\n".join)

        @settings(
            max_examples=10,
            deadline=None,
            suppress_health_check=[HealthCheck.too_slow],
        )
        @given(docs=st.lists(doc, min_size=1, max_size=4))
        def check(docs):
            from pyspark.sql import Row

            df = spark.createDataFrame(
                [Row(doc_id=i, text=t) for i, t in enumerate(docs)]
            )
            got = {r["doc_id"]: r for r in gopher_rules(df).collect()}
            for i, t in enumerate(docs):
                lines = t.split("\n")
                w = " ".join(t.lower().split()).split(" ")
                n_words = len(w)
                n_chars = sum(len(x) for x in w)
                n_alpha = sum(1 for x in w if any("a" <= ch <= "z" for ch in x))
                n_stop = sum(1 for s in GOPHER_STOPWORDS if s in w)
                n_sym = t.count("#") + t.count("...")
                n_bul = sum(
                    1
                    for ln in lines
                    if ln.strip().startswith("- ") or ln.strip().startswith("* ")
                )
                n_ell = sum(1 for ln in lines if ln.endswith("..."))
                g = got[i]
                assert (
                    g["n_words"], g["n_word_chars"], g["n_alpha_words"],
                    g["n_stop_hits"], g["n_symbols"], g["n_lines"],
                    g["n_bullet_lines"], g["n_ellipsis_lines"],
                ) == (
                    n_words, n_chars, n_alpha, n_stop, n_sym,
                    len(lines), n_bul, n_ell,
                ), (i, t, dict(g.asDict()))

        check()


class TestRemoveDupSpansProperty:
    """Property: remove_dup_spans equals a brute-force Python
    implementation (positional spans, global keeper-min, covered-
    position union, ordered reassembly) on arbitrary tiny corpora."""

    @given(corpus=corpus)
    @settings(**_SETTINGS)
    def test_matches_bruteforce(self, spark, corpus):
        n = 3
        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(corpus)]
        )
        got = {
            r["id"]: (r["text"], r["n_tokens"], r["n_kept"])
            for r in dedup.remove_dup_spans(df, span_n=n).collect()
        }
        toks = {
            i: " ".join(t.lower().split()).split(" ")
            for i, t in enumerate(corpus)
        }
        spans: dict = {}
        for i, w in toks.items():
            for p in range(1, max(len(w) - n + 1, 0) + 1):
                h = " ".join(w[p - 1 : p - 1 + n])
                spans.setdefault(h, []).append((i, p))
        removed: dict = {i: set() for i in toks}
        for h, occs in spans.items():
            if len(occs) < 2:
                continue
            keeper = min(occs, key=lambda ip: ip[0] * 1_048_576 + ip[1])
            for (i, p) in occs:
                if (i, p) != keeper:
                    removed[i].update(range(p, p + n))
        for i, w in toks.items():
            kept = [tk for pos, tk in enumerate(w, 1) if pos not in removed[i]]
            assert got[i] == (" ".join(kept), len(w), len(kept)), (
                i, corpus, got[i], kept,
            )
