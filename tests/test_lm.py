"""Bigram-LM scoring (operators/lm.py): the log-domain perplexity twin is
verified here against a pure-Python reference (libm ln is only
ulp-reproducible across engines, so it is excluded from the SQL oracle
path — q108 verifies the linear-domain scores)."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from mb8600_clickhouse_spark.operators import lm

TEXTS = {
    1: "the cat sat on the mat",
    2: "the cat sat on the cat",
    3: "a completely different sentence entirely here",
    4: "the the the the",  # degenerate repetition: most predictable
    5: "one",  # single token: no bigrams, no row
}


def _df(spark):
    return spark.createDataFrame(
        [Row(doc_id=k, text=v) for k, v in TEXTS.items()]
    )


class TestBigramLm:
    def test_perplexity_matches_pure_python(self, spark):
        ref = lm.perplexity_reference(TEXTS)
        got = {
            r["id"]: r["ppl"] for r in lm.with_perplexity(_df(spark)).collect()
        }
        assert set(got) == set(ref)  # doc 5 absent from both
        for k in ref:
            assert math.isclose(got[k], ref[k], rel_tol=1e-9), (k, got[k], ref[k])

    def test_linear_scores_shape(self, spark):
        got = {r["id"]: r for r in lm.bigram_lm_scores(_df(spark)).collect()}
        assert 5 not in got
        assert got[1]["n_bigrams"] == 5
        # repetition doc reuses the corpus's most common transition: its
        # avg conditional probability must beat the one-off sentence's
        assert got[4]["avg_p"] > got[3]["avg_p"]
        for r in got.values():
            assert 0.0 < r["min_p"] <= r["avg_p"] <= 1.0

    def test_rankings_agree_on_outlier(self, spark):
        """Linear-domain avg_p and log-domain ppl flag the same outlier."""
        ppl = {r["id"]: r["ppl"] for r in lm.with_perplexity(_df(spark)).collect()}
        avg = {r["id"]: r["avg_p"] for r in lm.bigram_lm_scores(_df(spark)).collect()}
        assert max(ppl, key=ppl.get) == min(avg, key=avg.get) == 3


class TestCcnetCutBuckets:
    """lm.ccnet_cut_buckets — the window-free CCNet bucketing lever."""

    def test_matches_exact_terciles_away_from_cuts(self, spark):
        from pyspark.sql import Window as W

        from mb8600_clickhouse_spark.operators.lm import ccnet_cut_buckets

        # 300 well-separated scores: approx cuts at relative_error
        # 0.001 are exact here, so buckets must equal ntile(3) DESC
        per = spark.createDataFrame(
            [(i, float(i)) for i in range(300)], "doc_id long, avg_p double"
        )
        w = W.orderBy(F.col("avg_p").desc(), F.col("doc_id"))
        exact = {
            r["doc_id"]: r["b"]
            for r in per.withColumn("b", F.ntile(3).over(w)).collect()
        }
        got = {
            r["doc_id"]: r["bucket"]
            for r in ccnet_cut_buckets(per).collect()
        }
        mismatch = [k for k in exact if exact[k] != got[k]]
        # ntile puts the boundary doc by rank, the cut variant by value
        # threshold — at 300 distinct values they agree everywhere
        assert not mismatch, mismatch[:5]

    def test_bucket_monotone_in_score(self, spark):
        from mb8600_clickhouse_spark.operators.lm import ccnet_cut_buckets

        per = spark.createDataFrame(
            [(i, float((i * 37) % 101)) for i in range(500)],
            "doc_id long, avg_p double",
        )
        rows = ccnet_cut_buckets(per, n_buckets=4).collect()
        by_score = sorted(rows, key=lambda r: -r["avg_p"])
        buckets = [r["bucket"] for r in by_score]
        assert buckets == sorted(buckets)  # higher score -> head-ward
        assert set(buckets) == {1, 2, 3, 4}

    def test_plan_is_window_free(self, spark):
        from mb8600_clickhouse_spark.operators.lm import ccnet_cut_buckets

        per = spark.createDataFrame(
            [(i, float(i)) for i in range(50)], "doc_id long, avg_p double"
        )
        plan = (
            ccnet_cut_buckets(per)
            ._jdf.queryExecution().optimizedPlan().toString()
        )
        assert "Window" not in plan and "Sort" not in plan


class TestDsir:
    def test_target_docs_rank_higher(self, spark):
        # target topic shares transitions with target-member docs
        rows = [
            (1, "alpha beta gamma alpha beta", True),
            (2, "alpha beta gamma beta gamma", True),
            (3, "alpha beta gamma alpha gamma", False),  # target-LIKE outsider
            (4, "zeta eta theta zeta eta", False),       # off-distribution
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
        got = {r["id"]: r for r in lm.dsir_weights(df, "is_t").collect()}
        ratio = {i: got[i]["p_target"] / got[i]["p_source"] for i in got}
        # the target-like outsider outranks the off-distribution doc
        assert ratio[3] > ratio[4]
        assert ratio[1] > ratio[4] and ratio[2] > ratio[4]

    def test_unseen_bigrams_smoothed_not_null(self, spark):
        rows = [
            (1, "a b c", True),
            (2, "x y z", False),  # every bigram unseen by the target model
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
        got = {r["id"]: r for r in lm.dsir_weights(df, "is_t").collect()}
        assert got[2]["p_target"] is not None and got[2]["p_target"] > 0
        assert got[2]["p_target"] < got[1]["p_target"]
