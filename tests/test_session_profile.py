"""session.exec_profile — session-local physical-execution profiles."""

from __future__ import annotations

from mb8600_clickhouse_spark.session import exec_profile

PROFILE = {"spark.sql.adaptive.enabled": "false"}


class TestExecProfile:
    def test_parent_conf_untouched(self, spark):
        before = spark.conf.get("spark.sql.adaptive.enabled")
        s2 = exec_profile(spark, PROFILE)
        assert s2 is not spark
        assert s2.conf.get("spark.sql.adaptive.enabled") == "false"
        assert spark.conf.get("spark.sql.adaptive.enabled") == before

    def test_cached_per_profile(self, spark):
        a = exec_profile(spark, PROFILE)
        b = exec_profile(spark, dict(PROFILE))
        assert a is b  # same profile -> same cached session
        c = exec_profile(spark, {"spark.sql.shuffle.partitions": "4"})
        assert c is not a

    def test_engine_conventions_inherited(self, spark):
        # builder-level conventions ride the SparkConf into newSession
        s2 = exec_profile(spark, PROFILE)
        assert s2.conf.get("spark.sql.session.timeZone") == "UTC"

    def test_mimic_mode_noop(self, spark, monkeypatch):
        monkeypatch.setenv("SPARK_GRAFT_MIMIC", "1")
        assert exec_profile(spark, PROFILE) is spark
