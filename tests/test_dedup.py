"""Invariant tests for the dedup sketches (SimHash, MinHash LSH,
n-gram Jaccard). SimHash has no SQL oracle (xxhash64 isn't portable),
so these pytest invariants are its primary verification.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from mb8600_clickhouse_spark.operators import dedup

DOC_A = "the quick brown fox jumps over the lazy dog near the river bank today"
DOC_A_NEAR = "the quick brown fox jumps over the lazy dog near the river bank now"
DOC_B = "completely different subject matter about astrophysics and galactic rotation curves"


def _docs_df(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text=DOC_A),
            Row(doc_id=2, text=DOC_A),  # exact dup of 1
            Row(doc_id=3, text=DOC_A_NEAR),  # near dup of 1
            Row(doc_id=4, text=DOC_B),  # unrelated
        ]
    )


class TestSimHash:
    def test_identical_text_identical_fingerprint(self, spark):
        fps = {
            r["id"]: r["simhash"]
            for r in dedup.simhash_fingerprints(_docs_df(spark)).collect()
        }
        assert fps[1] == fps[2]

    def test_fingerprints_nonnegative(self, spark):
        for r in dedup.simhash_fingerprints(_docs_df(spark)).collect():
            assert r["simhash"] >= 0

    def test_neardup_closer_than_unrelated(self, spark):
        fps = dedup.simhash_fingerprints(_docs_df(spark), shingle_n=2)
        pairs = (
            fps.alias("a")
            .join(fps.alias("b"), F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                dedup.hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("d"),
            )
        )
        d = {(r["id_a"], r["id_b"]): r["d"] for r in pairs.collect()}
        assert d[(1, 2)] == 0  # identical docs: distance 0
        assert d[(1, 3)] < d[(1, 4)]  # near-dup closer than unrelated

    def test_hamming_self_zero(self, spark):
        df = spark.createDataFrame([Row(h=0), Row(h=123456789), Row(h=(1 << 62) + 7)])
        for r in df.select(dedup.hamming64(F.col("h"), F.col("h")).alias("d")).collect():
            assert r["d"] == 0

    def test_hamming_known_values(self, spark):
        df = spark.createDataFrame([Row(a=0b1011, b=0b0010)])
        [r] = df.select(dedup.hamming64(F.col("a"), F.col("b")).alias("d")).collect()
        assert r["d"] == 2  # 1011 ^ 0010 = 1001 -> 2 set bits


class TestPortableSimHash:
    """The md5-derived 60-bit family (q42's driver-verified path)."""

    def test_portable_invariants(self, spark):
        fps = {
            r["id"]: r["simhash"]
            for r in dedup.simhash_fingerprints(_docs_df(spark), portable=True).collect()
        }
        assert fps[1] == fps[2]  # identical docs: identical fingerprint
        assert all(0 <= v < (1 << 60) for v in fps.values())

    def test_blocking_equals_bruteforce(self, spark):
        """Pigeonhole segment blocking must return EXACTLY the brute-force
        Hamming<=T pair set (HmSearch's correctness property), including
        at a T large enough that every segment bucket matters."""
        fps = dedup.simhash_fingerprints(_docs_df(spark), shingle_n=2, portable=True)
        for t in (0, 3, 30):
            blocked = {
                (r["id_a"], r["id_b"], r["hamming"])
                for r in dedup.simhash_neardup_pairs(fps, max_hamming=t, nbits=60).collect()
            }
            brute = {
                (r["id_a"], r["id_b"], r["d"])
                for r in fps.alias("a")
                .join(fps.alias("b"), F.col("a.id") < F.col("b.id"))
                .select(
                    F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"),
                    dedup.hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("d"),
                )
                .filter(F.col("d") <= t)
                .collect()
            }
            assert blocked == brute

    def test_segment_bucket_cap_bounds_pairs(self, spark):
        """Degenerate corpus: 30 identical docs share every segment
        bucket. Uncapped = n^2/2 pairs per the blocking guarantee;
        max_bucket keeps each bucket's lowest ids, bounding the pair
        count (the same skew lever as minhash_lsh_candidates)."""
        docs = spark.createDataFrame(
            [Row(doc_id=i, text=DOC_A) for i in range(30)]
        )
        fps = dedup.simhash_fingerprints(docs, portable=True)
        uncapped = dedup.simhash_neardup_pairs(fps, max_hamming=3, nbits=60)
        assert uncapped.count() == 30 * 29 // 2
        capped = dedup.simhash_neardup_pairs(
            fps, max_hamming=3, nbits=60, max_bucket=4
        )
        assert capped.count() == 4 * 3 // 2
        # survivors are the lowest ids (deterministic keep rule)
        assert {
            (r["id_a"], r["id_b"]) for r in capped.collect()
        } == {(a, b) for a in range(4) for b in range(a + 1, 4)}

    def test_cap_no_effect_on_sparse_corpus(self, spark):
        """A cap wider than any real bucket must not change results."""
        fps = dedup.simhash_fingerprints(_docs_df(spark), shingle_n=2, portable=True)
        base = {
            (r["id_a"], r["id_b"])
            for r in dedup.simhash_neardup_pairs(fps, max_hamming=3, nbits=60).collect()
        }
        capped = {
            (r["id_a"], r["id_b"])
            for r in dedup.simhash_neardup_pairs(
                fps, max_hamming=3, nbits=60, max_bucket=100
            ).collect()
        }
        assert base == capped


class TestMinHashLSH:
    def test_exact_dups_always_candidates(self, spark):
        pairs = {
            (r["id_a"], r["id_b"])
            for r in dedup.minhash_lsh_candidates(_docs_df(spark)).collect()
        }
        assert (1, 2) in pairs  # identical docs share every band

    def test_unrelated_not_candidates(self, spark):
        pairs = {
            (r["id_a"], r["id_b"])
            for r in dedup.minhash_lsh_candidates(_docs_df(spark)).collect()
        }
        assert (1, 4) not in pairs
        assert (3, 4) not in pairs

    def test_bucket_cap_bounds_pairs(self, spark):
        """30 identical docs share every band bucket: uncapped = n^2/2
        pairs; max_bucket caps it (degenerate-corpus skew lever)."""
        docs = spark.createDataFrame(
            [Row(doc_id=i, text=DOC_A) for i in range(30)]
        )
        assert dedup.minhash_lsh_candidates(docs).count() == 30 * 29 // 2
        assert dedup.minhash_lsh_candidates(docs, max_bucket=4).count() == 4 * 3 // 2

    def test_band_keys_deterministic(self, spark):
        df = _docs_df(spark)
        a = sorted(map(tuple, dedup.minhash_band_buckets(df).collect()))
        b = sorted(map(tuple, dedup.minhash_band_buckets(df).collect()))
        assert a == b


class TestNgramJaccard:
    def test_identical_docs_jaccard_one(self, spark):
        pairs = dedup.ngram_jaccard_pairs(_docs_df(spark), threshold=0.0)
        j = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
        assert j[(1, 2)] == 1.0
        assert j[(1, 3)] > j.get((1, 4), 0.0)

    def test_threshold_filters(self, spark):
        high = dedup.ngram_jaccard_pairs(_docs_df(spark), threshold=0.9)
        got = {(r["id_a"], r["id_b"]) for r in high.collect()}
        assert (1, 2) in got
        assert (1, 4) not in got


class TestShingleRowsPartitioning:
    def test_narrow_input_widened(self, spark):
        out = dedup.shingle_rows(_docs_df(spark).coalesce(1), distinct=False)
        assert out.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism

    def test_wide_input_not_shrunk(self, spark):
        """A corpus already partitioned wider than defaultParallelism must
        pass through without a shrinking shuffle (round-1 verdict #5)."""
        target = spark.sparkContext.defaultParallelism
        df = _docs_df(spark).repartition(target + 17)
        out = dedup.shingle_rows(df, distinct=False)
        assert out.rdd.getNumPartitions() >= target + 17


class TestShingles:
    def test_word_shingles_count(self, spark):
        df = spark.createDataFrame([Row(text="a b c d e")])
        [r] = df.select(dedup.word_shingles(F.col("text"), 3).alias("s")).collect()
        assert len(r["s"]) == 3  # 5 words -> 3 trigrams
        assert r["s"][0] == "a b c"

    def test_short_text_empty(self, spark):
        df = spark.createDataFrame([Row(text="a b")])
        [r] = df.select(dedup.word_shingles(F.col("text"), 3).alias("s")).collect()
        assert r["s"] == []


class TestScanWidthProbe:
    """shingle_rows' width probe must account for file SPLITTING: a
    single huge parquet file is many scan partitions, not one (round-3
    verdict minor #5 — the old len(files) probe triggered a pointless
    full-text shuffle on large single-file inputs)."""

    def test_max_partition_bytes_parses_suffixed_and_plain(self, spark):
        assert dedup._max_partition_bytes(spark) > 0
        spark.conf.set("spark.sql.files.maxPartitionBytes", "64MB")
        try:
            assert dedup._max_partition_bytes(spark) == 64 * 1024 * 1024
            spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728b")
            assert dedup._max_partition_bytes(spark) == 134217728
        finally:
            spark.conf.unset("spark.sql.files.maxPartitionBytes")

    def test_scan_width_counts_splits(self, spark, tmp_path):
        big = tmp_path / "big.bin"
        big.write_bytes(b"x" * 1000)
        small = tmp_path / "small.bin"
        small.write_bytes(b"y" * 10)
        spark.conf.set("spark.sql.files.maxPartitionBytes", "300b")
        try:
            # 1000/300 -> 4 splits; 10/300 -> 1; missing URI -> 1
            w = dedup._scan_width(
                spark, [f"file:{big}", str(small), "s3://nope/x.parquet"]
            )
            assert w == 4 + 1 + 1
        finally:
            spark.conf.unset("spark.sql.files.maxPartitionBytes")

    def test_wide_single_file_input_not_reshuffled(self, spark, tmp_path):
        """A one-file input whose estimated split width >= target keeps
        its scan partitioning (no repartition node in the plan)."""
        docs = spark.createDataFrame(
            [Row(doc_id=i, text=f"alpha beta gamma delta {i}") for i in range(200)]
        )
        p = str(tmp_path / "docs.parquet")
        docs.coalesce(1).write.parquet(p)
        import os
        f = [x for x in os.listdir(p) if x.endswith(".parquet")][0]
        size = os.path.getsize(os.path.join(p, f))
        target = spark.sparkContext.defaultParallelism
        # choose maxPartitionBytes so the single file "splits" wider
        # than the widen target
        spark.conf.set(
            "spark.sql.files.maxPartitionBytes", str(max(1, size // (target + 1)))
        )
        try:
            plan = dedup.shingle_rows(
                spark.read.parquet(p), "doc_id", "text", 3
            )._jdf.queryExecution().optimizedPlan().toString()
            assert "Repartition" not in plan
            # and a narrow probe (forced width 1) DOES widen
            plan2 = dedup.shingle_rows(
                spark.read.parquet(p), "doc_id", "text", 3, input_partitions=1
            )._jdf.queryExecution().optimizedPlan().toString()
            assert "Repartition" in plan2
        finally:
            spark.conf.unset("spark.sql.files.maxPartitionBytes")


class TestDupSpanStats:
    """Exact duplicate-span detection (bounded substring dedup)."""

    def _df(self, spark):
        # 10-token docs; span_n=4 -> 7 positional spans per doc
        base = "a b c d e f g h i j"
        return spark.createDataFrame(
            [
                Row(doc_id=1, text=base),
                Row(doc_id=2, text=base),  # exact dup: every span duplicated
                Row(doc_id=3, text="a b c d x y z w q r"),  # shares ONE span
                Row(doc_id=4, text="p q"),  # fewer tokens than span_n: no row
            ]
        )

    def test_counts_and_fraction(self, spark):
        out = {
            r["id"]: r
            for r in dedup.dup_span_stats(self._df(spark), span_n=4).collect()
        }
        assert set(out) == {1, 2, 3}  # doc 4 has no spans
        assert out[1]["n_spans"] == 7 and out[2]["n_spans"] == 7
        # docs 1/2 duplicate every span; doc 3 shares only 'a b c d'
        assert out[1]["n_dup_spans"] == 7 and out[2]["n_dup_spans"] == 7
        assert out[3]["n_dup_spans"] == 1
        assert abs(out[3]["dup_frac"] - 1 / 7) < 1e-12

    def test_within_doc_repeats_count(self, spark):
        # one doc, a 4-gram repeated inside it: both occurrences dup
        df = spark.createDataFrame([Row(doc_id=1, text="a b c d a b c d")])
        (r,) = dedup.dup_span_stats(df, span_n=4).collect()
        assert r["n_spans"] == 5
        # spans: abcd, bcda, cdab, dabc, abcd -> 'a b c d' occurs twice
        assert r["n_dup_spans"] == 2

    def test_plan_shape_skew_safe(self, spark):
        # corpus-frequency attachment must be the partial-agg groupBy +
        # join-back (AQE can split a skewed probe side), NEVER a
        # count-over-hash window (a window partition cannot be split —
        # a boilerplate span would serialize onto one task)
        plan = dedup.dup_span_stats(
            self._df(spark), span_n=4
        )._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert plan.count("Exchange") <= 5


class TestSubShingleDocs:
    """ANSI regression: docs with fewer tokens than the shingle width
    must yield zero shingles, not an element_at index crash
    (sequence(1, 0) counts DOWN to [1, 0] — the i=1 row then indexes
    past a 1-element token array)."""

    def test_shingle_rows_tiny_doc(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, text="one"), Row(doc_id=2, text="a b c d")]
        )
        got = sorted((r["id"], r["s"]) for r in dedup.shingle_rows(df, n=3).collect())
        assert got == [(2, "a b c"), (2, "b c d")]

    def test_survivors_tiny_doc_no_crash(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, text="x"), Row(doc_id=2, text="a b c d e")]
        )
        got = dedup.minhash_lsh_survivors(df, carry_cols=()).collect()
        # doc 1 has no shingles -> no row (documented contract); doc 2 survives
        assert [r["id"] for r in got] == [2]

    def test_dup_span_tiny_doc_no_crash(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, text="x y"), Row(doc_id=2, text="a b c d e")]
        )
        out = dedup.dup_span_stats(df, span_n=4).collect()
        assert [r["id"] for r in out] == [2]


class TestSpanContamination:
    def test_leaked_doc_flagged_clean_doc_not(self, spark):
        bench = spark.createDataFrame(
            [Row(doc_id=1, text="the secret eval answer is forty two exactly here")]
        )
        crawl = spark.createDataFrame(
            [
                # full leak
                Row(doc_id=10, text="the secret eval answer is forty two exactly here"),
                # PARTIAL leak: benchmark prefix + new tail
                Row(
                    doc_id=11,
                    text="the secret eval answer is forty two exactly more words after",
                ),
                Row(doc_id=12, text="entirely unrelated content with no overlap at all ok"),
            ]
        )
        got = {
            r["id"]: r
            for r in dedup.span_contamination(crawl, bench, span_n=8).collect()
        }
        assert got[10]["n_hit"] == got[10]["n_spans"]  # verbatim: every span hits
        assert 0 < got[11]["n_hit"] < got[11]["n_spans"]  # partial leak caught
        assert got[12]["n_hit"] == 0


class TestSurvivorsEquivalence:
    def test_survivors_equal_anti_join_of_dropped_ids(self, spark):
        """The min-aggregate survivor rule must produce EXACTLY the
        complement of the (uncapped) pair-derived drop set."""
        rows = [Row(doc_id=i, text=DOC_A) for i in range(6)] + [
            Row(doc_id=10, text=DOC_A_NEAR),
            Row(doc_id=11, text=DOC_B),
        ]
        df = spark.createDataFrame(rows)
        surv = {r["id"] for r in dedup.minhash_lsh_survivors(df).collect()}
        dropped = {r["id"] for r in dedup.minhash_lsh_dropped_ids(df).collect()}
        all_ids = {r["doc_id"] for r in df.collect()}
        assert surv == all_ids - dropped
        assert 0 in surv and dropped >= {1, 2, 3, 4, 5}


class TestParagraphDedup:
    """dedup.paragraph_dedup — first-occurrence keeper + reassembly."""

    def test_keeper_and_reassembly(self, spark):
        from mb8600_clickhouse_spark.operators.dedup import paragraph_dedup

        df = spark.createDataFrame(
            [
                (1, "unique one\n\nBOILER\n\nunique two"),
                (2, "BOILER\n\nother text"),
                (3, "BOILER"),  # loses its only paragraph -> ''
            ],
            "doc_id: long, text: string",
        )
        out = {r.id: r for r in paragraph_dedup(df).collect()}
        assert out[1].text == "unique one\n\nBOILER\n\nunique two"
        assert (out[1].n_paras, out[1].n_kept) == (3, 3)
        assert out[2].text == "other text"
        assert (out[2].n_paras, out[2].n_kept) == (2, 1)
        assert out[3].text == ""
        assert (out[3].n_paras, out[3].n_kept) == (1, 0)

    def test_normalized_matching(self, spark):
        from mb8600_clickhouse_spark.operators.dedup import paragraph_dedup

        # case/whitespace variants are the SAME paragraph
        df = spark.createDataFrame(
            [(1, "Hello   World"), (2, "hello world")],
            "doc_id: long, text: string",
        )
        out = {r.id: r for r in paragraph_dedup(df).collect()}
        assert out[1].n_kept == 1 and out[2].n_kept == 0
        # the kept SPELLING is the first occurrence's original text
        assert out[1].text == "Hello   World"


class TestRemoveDupSpans:
    """dedup.remove_dup_spans — span-removal semantics (q155 is the
    oracle twin)."""

    def _clean(self, spark, rows, span_n=3):
        from mb8600_clickhouse_spark.operators.dedup import remove_dup_spans

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {
            r["id"]: (r["text"], r["n_tokens"], r["n_kept"])
            for r in remove_dup_spans(df, span_n=span_n).collect()
        }

    def test_first_occurrence_kept_other_removed(self, spark):
        out = self._clean(
            spark,
            [(1, "a b c x y"), (2, "p q a b c r")],
        )
        # 'a b c' duplicated; keeper = doc 1 (lower ord) -> doc 2 loses it
        assert out[1] == ("a b c x y", 5, 5)
        assert out[2] == ("p q r", 6, 3)

    def test_within_doc_repeat_and_overlap_union(self, spark):
        # 'a b c a b c a b c': windows overlap; the first window (pos 1)
        # is the keeper, every other duplicated window's cover unions
        out = self._clean(spark, [(1, "a b c a b c a b c")])
        text, n_tokens, n_kept = out[1]
        assert n_tokens == 9 and n_kept == 3 and text == "a b c"

    def test_short_docs_untouched(self, spark):
        out = self._clean(spark, [(1, "a b"), (2, "a b")])
        assert out[1] == ("a b", 2, 2) and out[2] == ("a b", 2, 2)

    def test_doc_fully_removed_yields_empty(self, spark):
        out = self._clean(spark, [(1, "a b c"), (2, "a b c")])
        assert out[1] == ("a b c", 3, 3)
        assert out[2] == ("", 3, 0)
