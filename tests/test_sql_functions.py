"""SQL scalar function surface: every registered function must be
callable from pure SQL and agree with the Column-expression twins."""

from __future__ import annotations

import pytest

from mb8600_clickhouse_spark.functions import register_sql_functions


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    names = register_sql_functions(spark)
    assert len(names) >= 8


def one(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").first()["v"]


def test_uptime_seconds(spark):
    assert one(spark, "uptime_seconds('7days 03h:21m:09s')") == 7 * 86400 + 3 * 3600 + 21 * 60 + 9
    assert one(spark, "uptime_seconds('45m:10s')") == 45 * 60 + 10
    assert one(spark, "uptime_seconds('')") == 0


def test_ofdm_correction(spark):
    assert one(spark, "ofdm_snr_corrected('OFDM PLC', 10.0)") == 25.0
    assert one(spark, "ofdm_snr_corrected('OFDM PLC', 20.0)") == 20.0
    assert one(spark, "ofdm_snr_corrected('QAM256', 10.0)") == 10.0


def test_unit_conversions(spark):
    assert one(spark, "mhz_to_hz(495.0)") == 495.0e6
    assert one(spark, "khz_to_hz(6400.0)") == 6400.0e3


def test_cosine_sim(spark):
    assert one(spark, "cosine_sim(array(1D, 0D), array(1D, 0D))") == pytest.approx(1.0)
    assert one(spark, "cosine_sim(array(1D, 0D), array(0D, 1D))") == pytest.approx(0.0)


def test_hamming(spark):
    assert one(spark, "hamming64(11, 2)") == 2


def test_text_scalars(spark):
    assert one(spark, "norm_text('  Hello   WORLD ')") == "hello world"
    assert one(spark, "token_count('a b  c')") == 3
    assert one(spark, "punct_ratio('ab!?')") == pytest.approx(0.5)
    assert one(spark, "content_fingerprint('A  b')") == one(
        spark, "content_fingerprint('a b ')"
    )


def test_functions_compose_in_queries(spark):
    """SQL functions inline into plans over real tables."""
    from mb8600_clickhouse_spark.tables import register_views

    register_views(spark, "/root/testdata/sf0.001")
    df = spark.sql(
        """
        SELECT lang, avg(token_count(text)) AS avg_tokens
        FROM documents GROUP BY lang ORDER BY lang
        """
    )
    rows = df.collect()
    assert len(rows) > 0
    assert all(r["avg_tokens"] > 0 for r in rows)


class TestDsum4TwoLevel:
    """Round-12 partial/merge lane: ``dsum4_partials`` summed across a
    REGROUPING and finished by ``dsum4_merge`` must be BIT-IDENTICAL
    to a single-level ``dsum4`` over the same rows (integer digit sums
    are associative) — the q39 two-level sliding-window contract."""

    def _frame(self, spark):
        import random

        rng = random.Random(12)
        rows = [
            (i % 7, i % 3, rng.uniform(-1e6, 1e6)) for i in range(5000)
        ]
        return spark.createDataFrame(rows, "g INT, sub INT, v DOUBLE")

    def test_bit_identity_across_regrouping(self, spark):
        from pyspark.sql import functions as F

        from mb8600_clickhouse_spark.queries.relational import (
            dsum4,
            dsum4_merge,
            dsum4_partials,
        )

        df = self._frame(spark)
        single = {
            r["g"]: r["s"]
            for r in df.groupBy("g")
            .agg(dsum4(F.col("v")).alias("s"))
            .collect()
        }
        two = {
            r["g"]: r["s"]
            for r in df.groupBy("g", "sub")
            .agg(*dsum4_partials(F.col("v")))
            .groupBy("g")
            .agg(dsum4_merge().alias("s"))
            .collect()
        }
        assert single == two  # exact ==, not approx: bit-identity

    def test_merge_propagates_nan_audit(self, spark):
        from pyspark.sql import functions as F

        from mb8600_clickhouse_spark.queries.relational import (
            dsum4_merge,
            dsum4_partials,
        )

        df = spark.createDataFrame(
            [(0, 0, 1.5), (0, 1, float("nan"))], "g INT, sub INT, v DOUBLE"
        )
        # LOUD either way: ANSI sessions raise CAST_OVERFLOW on the
        # per-row signum(NaN) cast before the audit aggregate runs;
        # non-ANSI sessions reach the merge audit's raise_error
        with pytest.raises(
            Exception, match="dsum4 limb-lane domain|CAST_OVERFLOW"
        ):
            (
                df.groupBy("g", "sub")
                .agg(*dsum4_partials(F.col("v")))
                .groupBy("g")
                .agg(dsum4_merge().alias("s"))
                .collect()
            )
