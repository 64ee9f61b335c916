"""Property test: manifest data skipping must be invisible to results.

For ANY file layout and ANY conjunction of range predicates,
``scan(predicates)`` must return exactly ``read().filter(...)`` — files
may only be pruned when provably non-matching. This guards the stat
encoding subtleties (ISO timestamp ordering, int/float mixing, missing
stats) in ``plans.manifest._file_may_match``."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from mb8600_clickhouse_spark.plans import ManifestTable

_BASE = dt.datetime(2026, 1, 1)


def _rows(spec):
    return [
        Row(k=k, s=f"s{k:04d}", ts=_BASE + dt.timedelta(hours=k)) for k in spec
    ]


# a table = several appended batches of small int keys (dup keys allowed)
batches = st.lists(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=6),
    min_size=1,
    max_size=4,
)

preds = st.lists(
    st.tuples(
        st.sampled_from(["k", "s", "ts"]),
        st.sampled_from(["=", "<", "<=", ">", ">="]),
        st.integers(min_value=-5, max_value=55),
    ),
    min_size=1,
    max_size=3,
)


def _value_for(col: str, i: int):
    if col == "k":
        return i
    if col == "s":
        return f"s{max(i, 0):04d}" if i >= 0 else "s"
    return _BASE + dt.timedelta(hours=i)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=batches, raw_preds=preds)
def test_scan_equals_filter(spark, tmp_path_factory, batches, raw_preds):
    root = tmp_path_factory.mktemp("skip")
    t = ManifestTable(str(root / "t"))
    for b in batches:
        t.append(spark.createDataFrame(_rows(b)).coalesce(1))
    predicates = [(c, op, _value_for(c, i)) for c, op, i in raw_preds]

    got = t.scan(spark, predicates)
    want = t.read(spark)
    for c, op, v in predicates:
        from pyspark.sql import functions as F

        col = F.col(c)
        want = want.filter(
            {"=": col == v, "<": col < v, "<=": col <= v, ">": col > v, ">=": col >= v}[op]
        )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # and pruning is REAL when it can be: an impossible equality drops all files
    assert t.prune_files([("k", "=", 999)]) == []


def test_timestamp_equality_at_file_boundary(spark, tmp_path):
    """Deterministic pin of the round-11 Hypothesis find: Spark writes
    TIMESTAMP adjusted-to-UTC, so pyarrow footer stats are tz-AWARE
    and their isoformat carried '+00:00' while probe values encode
    naive — equal instants compared UNequal lexicographically and an
    equality probe at a single-row file's [min = max] boundary pruned
    the file that contained the match."""
    t = ManifestTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame(_rows([0])).coalesce(1))
    v = _BASE  # exactly the file's min == max instant
    assert t.scan(spark, [("ts", "=", v)]).count() == 1
    assert t.scan(spark, [("ts", ">=", v)]).count() == 1
    assert t.scan(spark, [("ts", "<=", v)]).count() == 1
    assert t.scan(spark, [("ts", "<", v)]).count() == 0
    assert t.scan(spark, [("ts", ">", v)]).count() == 0
