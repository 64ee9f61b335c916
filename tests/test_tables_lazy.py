"""LazyTables (tables.py round 6): per-access construction, memoization
per (session, sf_dir), and full materialization for iteration-style
consumers (register_views / bench warmup)."""

from mb8600_clickhouse_spark.schemas import FIXTURE_SCHEMAS
from mb8600_clickhouse_spark.tables import load_tables

SF = "/root/testdata/sf0.001"


def test_lazy_until_accessed(spark):
    t = load_tables(spark, SF)
    t.pop("documents", None)  # drop any entry built by earlier tests
    before = set(t.keys())
    assert "documents" not in before
    df = t["documents"]
    assert df.columns[0] == "doc_id"
    assert "documents" in t.keys()


def test_memoized_per_session_and_sfdir(spark):
    a = load_tables(spark, SF)
    b = load_tables(spark, SF)
    assert a is b
    c = load_tables(spark, "/root/testdata/sf0.01")
    assert c is not a


def test_values_and_items_force_all(spark):
    t = load_tables(spark, SF)
    names = {n for n, _ in t.items()}
    assert names == set(FIXTURE_SCHEMAS) | {"docsis"}
    assert len(list(t.values())) == len(FIXTURE_SCHEMAS) + 1
