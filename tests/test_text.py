"""Unit tests for text-analysis operators (lang-id, quality, tokens,
fingerprinting)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mb8600_clickhouse_spark.operators import text as ops


def _one(spark, value, expr_fn):
    df = spark.createDataFrame([Row(text=value)])
    return df.select(expr_fn(F.col("text")).alias("v")).first()["v"]


class TestTokens:
    def test_token_count(self, spark):
        assert _one(spark, "  hello   world  foo ", ops.token_count) == 3

    def test_bpe_token_count(self, spark):
        # letters / digits / punct runs: "abc", "123", "!!", "def" -> 4
        assert _one(spark, "abc 123 !! def", ops.bpe_token_count) == 4

    def test_punct_ratio(self, spark):
        got = _one(spark, "ab!?", ops.punct_ratio)
        assert got == pytest.approx(0.5)


class TestLangId:
    @pytest.mark.parametrize(
        ("snippet", "lang"),
        [
            ("the cat sat on the mat and it is happy", "en"),
            ("el perro y la casa de un amigo en la calle", "es"),
            ("der hund und die katze ist von den kindern", "de"),
            ("le chat et la maison des amis est une belle chose", "fr"),
            ("xyzzy plugh qwerty", "und"),
        ],
    )
    def test_known_snippets(self, spark, snippet, lang):
        assert _one(spark, snippet, ops.lang_id) == lang


class TestFingerprint:
    def test_whitespace_and_case_insensitive(self, spark):
        df = spark.createDataFrame(
            [Row(a="Hello   World"), Row(a="hello world "), Row(a="HELLO\tWORLD")]
        )
        fps = {r["v"] for r in df.select(ops.fingerprint(F.col("a")).alias("v")).collect()}
        assert len(fps) == 1

    def test_different_content_differs(self, spark):
        assert _one(spark, "aaa", ops.fingerprint) != _one(spark, "bbb", ops.fingerprint)


class TestQuality:
    def test_score_in_unit_interval(self, spark):
        rows = [
            Row(text="short"),
            Row(text="a " * 300),
            Row(text="!!!! ???? ;;;; ####"),
            Row(text="a perfectly ordinary sentence of reasonable length and composition here"),
        ]
        df = spark.createDataFrame(rows)
        for r in df.select(ops.quality_score(F.col("text")).alias("q")).collect():
            assert 0.0 <= r["q"] <= 1.0

    def test_clean_beats_noisy(self, spark):
        clean = _one(
            spark,
            "a perfectly ordinary sentence of reasonable length and composition "
            "written with normal words and hardly any punctuation at all today",
            ops.quality_score,
        )
        noisy = _one(spark, "@#$% ^&* ()!! ~~~ ||| @@@@", ops.quality_score)
        assert clean > noisy


class TestPiiRedaction:
    def test_counts_and_redaction(self, spark):
        from mb8600_clickhouse_spark.operators.text import pii_counts, redact_pii
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("a@b.com and 555-123-4567 at 10.0.0.1, also c@d.org",),
             ("clean text with no pii",)],
            "text string",
        )
        counts = pii_counts(F.col("text"))
        r = df.select(
            redact_pii(F.col("text")).alias("red"),
            *[c.alias(f"n_{k}") for k, c in counts.items()],
        ).collect()
        assert r[0]["n_email"] == 2 and r[0]["n_phone"] == 1 and r[0]["n_ipv4"] == 1
        assert "a@b.com" not in r[0]["red"] and r[0]["red"].count("[PII]") == 4
        assert r[1]["red"] == "clean text with no pii"

    def test_email_not_double_counted_as_phone(self, spark):
        from mb8600_clickhouse_spark.operators.text import redact_pii
        from pyspark.sql import functions as F

        df = spark.createDataFrame([("mail: u123-456-7890x@example.com",)], "text string")
        red = df.select(redact_pii(F.col("text")).alias("r")).collect()[0]["r"]
        # the email (redacted first) swallows the digit run
        assert red == "mail: [PII]"


class TestRepetitionSignals:
    def test_signals(self, spark):
        from mb8600_clickhouse_spark.operators.text import with_repetition_signals

        df = spark.createDataFrame(
            [(1, "spam spam spam spam"), (2, "all words here are different"),
             (3, "x")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in with_repetition_signals(df).collect()}
        assert rows[1]["dup_word_frac"] == 0.75  # 1 distinct of 4
        assert rows[1]["top_bigram_frac"] == 1.0  # "spam spam" is every bigram
        assert rows[2]["dup_word_frac"] == 0.0
        assert rows[3]["top_bigram_frac"] == 0.0  # <2 tokens -> no bigrams

    def test_top_bigram_run_under_hash_keys(self, spark):
        """Round-13 lever pin (xxhash64 bigram keys): the longest
        equal-run fold over the HASH-sorted bigram array must count the
        most frequent bigram regardless of where its key lands in hash
        order — 'c d' occurs 3 times of 9 bigrams here, interleaved with
        'a b'/'b a'/'b c'/'d c' occurrences."""
        from mb8600_clickhouse_spark.operators.text import (
            with_repetition_signals,
        )

        df = spark.createDataFrame(
            [(1, "a b a b c d c d c d")], "doc_id long, text string"
        )
        r = with_repetition_signals(df).collect()[0]
        assert abs(r["top_bigram_frac"] - 3.0 / 9.0) < 1e-12


class TestChunkTokens:
    """Sliding-window chunking (round 6)."""

    def test_windows_and_overlap(self, spark):
        from mb8600_clickhouse_spark.operators.text import chunk_tokens

        df = spark.createDataFrame(
            [(1, " ".join(f"t{i}" for i in range(10)))], "doc_id: long, text: string"
        )
        rows = chunk_tokens(df, size=4, overlap=2).orderBy("chunk_id").collect()
        # stride 2 over 10 tokens: starts 0,2,4,6,8 -> lengths 4,4,4,4,2
        assert [r.n_tokens for r in rows] == [4, 4, 4, 4, 2]
        assert [r.chunk_id for r in rows] == [0, 1, 2, 3, 4]

    def test_empty_and_short_docs(self, spark):
        from mb8600_clickhouse_spark.operators.text import chunk_tokens

        df = spark.createDataFrame(
            [(1, ""), (2, "only two"), (3, "   ")], "doc_id: long, text: string"
        )
        rows = chunk_tokens(df, size=4, overlap=1).collect()
        got = {(r.id, r.chunk_id): r.n_tokens for r in rows}
        # doc 2: one short window; empty/whitespace docs yield nothing
        assert got == {(2, 0): 2}

    def test_overlap_must_be_smaller(self, spark):
        import pytest as _pytest

        from mb8600_clickhouse_spark.operators.text import chunk_tokens

        df = spark.createDataFrame([(1, "a b")], "doc_id: long, text: string")
        with _pytest.raises(ValueError):
            chunk_tokens(df, size=4, overlap=4)


class TestBm25:
    """BM25 retrieval (round 6)."""

    def test_scores_and_ranking(self, spark):
        from mb8600_clickhouse_spark.operators.text import bm25_topk

        df = spark.createDataFrame(
            [
                (1, "vector vector vector index"),
                (2, "vector index scan"),
                (3, "scan filter join"),
                (4, "hash hash join"),
            ],
            "doc_id: long, text: string",
        )
        rows = bm25_topk(df, ["vector", "hash"], k=10).collect()
        got = {r.doc_id: r.bm25 for r in rows}
        # doc 3 has neither term -> absent; repeated term scores higher
        assert set(got) == {1, 2, 4}
        assert got[1] > got[2]
        assert all(v > 0 for v in got.values())

    def test_k_limits(self, spark):
        from mb8600_clickhouse_spark.operators.text import bm25_topk

        df = spark.createDataFrame(
            [(i, "common word") for i in range(20)], "doc_id: long, text: string"
        )
        assert bm25_topk(df, ["common"], k=5).count() == 5


class TestNormTokens:
    """norm_tokens == tokens(normalize_text(.)) — the fused spelling's
    equivalence contract (operators/text.py::norm_tokens)."""

    def test_identical_on_edge_cases(self, spark):
        from pyspark.sql import functions as F

        from mb8600_clickhouse_spark.operators.text import (
            norm_tokens,
            normalize_text,
            tokens,
        )

        df = spark.createDataFrame(
            [
                ("plain words here",),
                ("  leading and trailing  ",),
                ("tabs\tand\nnewlines \r\n mixed   runs",),
                ("",),
                ("   ",),
                ("SINGLE",),
                ("a  b   c    d",),
            ],
            "text: string",
        )
        mism = df.select(
            (norm_tokens(F.col("text")) == tokens(normalize_text(F.col("text"))))
            .alias("eq")
        ).filter(~F.col("eq"))
        assert mism.count() == 0

    def test_identical_on_fixture_corpus(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from mb8600_clickhouse_spark.operators.text import (
            norm_tokens,
            normalize_text,
            tokens,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        mism = docs.select(
            (norm_tokens(F.col("text")) == tokens(normalize_text(F.col("text"))))
            .alias("eq")
        ).filter(~F.col("eq"))
        assert mism.count() == 0


def test_bm25_prepared_equals_in_plan(spark):
    """The prepared-stats mode (index-time constants, q109 device) is
    bit-identical to the in-plan broadcast mode."""
    from pyspark.sql import Row

    from mb8600_clickhouse_spark.operators.text import bm25_topk

    rows = [
        Row(doc_id=i, text=f"hash merge vector doc {i} " + "pad " * (i % 7))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows)
    a = bm25_topk(df, ["hash", "vector"], k=20, prepared_stats=True).collect()
    b = bm25_topk(df, ["hash", "vector"], k=20, prepared_stats=False).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
