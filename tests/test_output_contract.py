"""Registry-wide driver output-shape contract (VERDICT r08 #3).

The external driver's correctness gate canonicalizes results with a raw-
cell pandas ``sort_values`` and a dtype-level schema comparison. Two
hazard classes shipped in round 8 because the local gate was more
forgiving than the driver:

1. list/struct/map cells — unhashable in pandas' lexsort, the whole
   query records ``err`` (CORRECTNESS_r08: 9 rows, the q07 rule applied
   one level short);
2. tz-aware vs tz-naive timestamp dtype splits (q188's DuckDB
   ``to_timestamp`` TIMESTAMPTZ vs Spark's naive window start).

This module turns those per-incident rules into enforced invariants:

- ``harness.oracle.driver_canon_check`` must fail LOUDLY on fixture
  frames carrying each hazard (the deliberately-bad-fixture test the
  verdict asked for), and
- every declared query's Spark schema must be scalar-only at the top
  level: no ArrayType / MapType / StructType, and no type outside the
  closed set the driver's canonicalizer is known to sort+hash.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import types as T

from harness.oracle import driver_canon_check
from mb8600_clickhouse_spark.queries import all_queries

SF0001 = "/root/testdata/sf0.001"

_SCALAR_OK = (
    T.StringType,
    T.BooleanType,
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
    T.BinaryType,
    T.NullType,
)

_BANNED = (T.ArrayType, T.MapType, T.StructType)


def test_driver_canon_crashes_on_list_cells():
    """The deliberately-array-outputting fixture: the gate must fail."""
    bad = pd.DataFrame({"k": [1, 2], "arr": [[1, 2], [3]]})
    good = pd.DataFrame({"k": [1, 2], "arr": ["1,2", "3"]})
    res = driver_canon_check("fixture", bad, good)
    assert res is not None and not res.ok
    assert "driver-canon crash (spark)" in res.detail
    res = driver_canon_check("fixture", good, bad)
    assert res is not None and not res.ok
    assert "driver-canon crash (oracle)" in res.detail
    assert driver_canon_check("fixture", good, good) is None


def test_driver_canon_flags_tz_aware_timestamps():
    """The q188 hazard: tz-aware dtype on either side must fail."""
    naive = pd.DataFrame({"t": pd.to_datetime(["2024-01-01", "2024-01-02"])})
    aware = pd.DataFrame({"t": naive["t"].dt.tz_localize("UTC")})
    res = driver_canon_check("fixture", naive, aware)
    assert res is not None and not res.ok
    assert "tz-aware" in res.detail
    assert driver_canon_check("fixture", naive, naive.copy()) is None


def test_driver_canon_crashes_on_struct_cells():
    bad = pd.DataFrame({"k": [1], "s": [{"a": 1}]})
    res = driver_canon_check("fixture", bad, bad)
    assert res is not None and not res.ok


def test_registry_schemas_are_scalar_only(spark):
    """Every declared query's top-level schema must be driver-sortable.

    Builds each query's DataFrame at sf0.001 (plan analysis only for
    the lazy family; the eager pipeline queries materialize small
    results) and rejects any ArrayType/MapType/StructType column plus
    anything outside the canonicalizer's known-scalar set.
    """
    offenders: list[str] = []
    for name, spec in sorted(all_queries().items()):
        try:
            schema = spec.fn(spark, SF0001).schema
        except Exception as e:  # noqa: BLE001 — name the query that broke
            pytest.fail(f"{name}: failed to build plan: {e}")
        for field in schema.fields:
            if isinstance(field.dataType, _BANNED) or not isinstance(
                field.dataType, _SCALAR_OK
            ):
                offenders.append(f"{name}.{field.name}: {field.dataType}")
    assert not offenders, (
        "non-scalar top-level output columns (driver-canon unsortable):\n"
        + "\n".join(offenders)
    )
