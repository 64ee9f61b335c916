"""Bloom-filter file skipping (plans/manifest.py build_bloom): point
lookups on unsorted high-cardinality columns, where [min, max] stats
cannot prune."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from mb8600_clickhouse_spark.plans.manifest import (
    ManifestTable,
    _bloom_may_contain,
    _bloom_positions_py,
)


@pytest.fixture()
def table(spark, tmp_path):
    t = ManifestTable(tmp_path / "tbl")
    # two appends -> (at least) two files with disjoint session values;
    # doc ids INTERLEAVE so min/max cannot tell the files apart
    t.append(
        spark.createDataFrame(
            [Row(doc_id=i, session=f"a{i}") for i in range(0, 100, 2)]
        ).coalesce(1)
    )
    t.append(
        spark.createDataFrame(
            [Row(doc_id=i, session=f"b{i}") for i in range(1, 100, 2)]
        ).coalesce(1)
    )
    return t


class TestBuildProbe:
    def test_positions_are_deterministic(self):
        assert _bloom_positions_py("a2", 1024, 4) == _bloom_positions_py("a2", 1024, 4)
        b = {"bits": 1024, "k": 4, "words": [0] * 16}
        for pos in _bloom_positions_py("a2", 1024, 4):
            b["words"][pos // 64] |= 1 << (pos % 64)
        assert _bloom_may_contain(b, "a2")

    def test_point_lookup_prunes_other_file(self, spark, table):
        v = table.build_bloom(spark, ["session", "doc_id"])
        assert table.latest_version() == v
        all_files = table.snapshot_files()
        assert len(all_files) == 2
        # session 'a2' lives only in the even file; min/max on session
        # strings would NOT separate a* from b* fully, bloom must
        hit = table.prune_files([("session", "=", "a2")])
        assert len(hit) == 1
        # absent value prunes everything (no false positive at this
        # density: 50 values x 4 bits in 1024)
        assert table.prune_files([("session", "=", "zz")]) == []

    def test_integer_bloom(self, spark, table):
        table.build_bloom(spark, ["doc_id"])
        hit = table.prune_files([("doc_id", "=", 4)])
        assert len(hit) == 1  # even file only: bloom beats overlapping ranges
        assert table.prune_files([("doc_id", "=", 5000)]) == []

    def test_scan_equals_filter(self, spark, table):
        table.build_bloom(spark, ["session"])
        got = table.scan(spark, [("session", "=", "b3")]).collect()
        want = table.read(spark).filter("session = 'b3'").collect()
        assert [r.asDict() for r in got] == [r.asDict() for r in want]

    def test_append_after_bloom_carries_and_stays_sound(self, spark, table):
        table.build_bloom(spark, ["session"])
        # the new file's session range [a0x, b9x] OVERLAPS 'a2', so
        # min/max keeps it — and with no bloom yet it must survive the
        # equality probe too (missing bloom never prunes)
        table.append(
            spark.createDataFrame(
                [Row(doc_id=1000, session="a0x"), Row(doc_id=1001, session="b9x")]
            ).coalesce(1)
        )
        hit = table.prune_files([("session", "=", "a2")])
        assert len(hit) == 2  # even file (bloom hit) + new file (no bloom)
        # old files' carried blooms still prune: 'b9x' range-overlaps the
        # odd file ([b1, b99]) but its bloom proves absence
        hit2 = table.prune_files([("session", "=", "b9x")])
        assert len(hit2) == 1
        got = table.scan(spark, [("session", "=", "b9x")]).collect()
        assert len(got) == 1 and got[0]["session"] == "b9x"

    def test_float_column_rejected(self, spark, tmp_path):
        t = ManifestTable(tmp_path / "t2")
        t.append(spark.createDataFrame([Row(x=1.5)]))
        with pytest.raises(ValueError, match="only string/integer"):
            t.build_bloom(spark, ["x"])


class TestQ112Construction:
    def test_fixture_point_lookup_prunes(self, spark, tmp_path):
        """The q112 shape: interleaved user_id ranges across files make
        min/max useless; the bloom must actually drop files."""
        from mb8600_clickhouse_spark.tables import load_tables
        from pyspark.sql import functions as F

        ev = load_tables(spark, "/root/testdata/sf0.001")["events"].select(
            "event_id", "user_id"
        )
        t = ManifestTable(tmp_path / "ev")
        for i in range(4):
            t.append(ev.filter(F.col("event_id") % 4 == i).coalesce(1))
        # min/max alone keeps all four files (ranges interleave)
        assert len(t.prune_files([("user_id", "=", 7)])) == 4
        t.build_bloom(spark, ["user_id"])
        kept = t.prune_files([("user_id", "=", 7)])
        with_user = {
            r["f"]
            for r in t.read(spark)
            .filter("user_id = 7")
            .select(F.input_file_name().alias("f"))
            .distinct()
            .collect()
        }
        # sound: every file truly containing the user survives
        assert len(kept) >= len(with_user) > 0


class TestProbeValueRendering:
    """A probe value whose str() differs from Spark's CAST-to-string of
    the column must never unsoundly prune (the float-7.0-on-bigint
    case)."""

    def test_integral_float_probes_like_int(self, spark, table):
        table.build_bloom(spark, ["doc_id"])
        assert table.prune_files([("doc_id", "=", 4.0)]) == table.prune_files(
            [("doc_id", "=", 4)]
        )
        got = table.scan(spark, [("doc_id", "=", 4.0)]).collect()
        want = table.read(spark).filter("doc_id = 4.0").collect()
        assert sorted(r["doc_id"] for r in got) == sorted(r["doc_id"] for r in want)

    def test_non_integral_float_skips_bloom(self, spark, table):
        table.build_bloom(spark, ["doc_id"])
        # 4.5 matches no row; bloom must NOT be consulted (rendering
        # mismatch) — min/max may keep files, scan result stays correct
        got = table.scan(spark, [("doc_id", "=", 4.5)]).collect()
        assert got == []
