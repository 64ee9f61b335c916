"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The queries are the declared verification set from SURVEY.md §2.G
(Q01-Q37) plus the training-data-pipeline / extended-relational
extensions (Q38-Q95, SURVEY §2.H/§2.I/§2.J), registered in
``mb8600_clickhouse_spark.queries``. As of round 6 every registered
query has an oracle again (q83's training query is declared as one
SQL-expressible Lloyd iteration; none rows-only). The driver records
~50 names per round, so ``queries()`` orders never-yet-verified names
first, then previously-green names stalest-first (SURVEY §2.J
documents the rotation).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from mb8600_clickhouse_spark.queries import all_queries  # noqa: E402

SF001_DIR = "/root/testdata/sf0.001"
SF01_DIR = "/root/testdata/sf0.01"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H Q1-shaped
    pricing summary (hash aggregation with decimal-exact sums)."""
    return all_queries()["q09_hash_agg"].fn(spark, SF001_DIR)


def _last_verified_round() -> dict[str, int]:
    """Latest round in which each query name was hash-verified green by
    the driver (CORRECTNESS_r*.json). Used to rotate the registration
    order: the driver verifies at most ~50 names per round in dict
    order, so never-checked names go first and previously-green names
    are ordered STALEST-FIRST, keeping every name's most recent green
    row at most ~2 rounds old (SURVEY §2.J documents the rotation)."""
    import json
    import re

    last: dict[str, int] = {}
    for p in sorted(_REPO.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)", p.name)
        rnd = int(m.group(1)) if m else 0
        try:
            rows = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        for name, r in rows.items():
            if isinstance(r, dict) and r.get("hash_match"):
                last[name] = max(last.get(name, 0), rnd)
    return last


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    never-driver-verified names come first, then stalest-verified
    (see _last_verified_round)."""
    specs = all_queries()
    last = _last_verified_round()
    names = list(specs)
    # stable sort: never-verified (round 0) first, then ascending
    # last-green round; registration order breaks ties
    ordered = sorted(names, key=lambda n: last.get(n, 0))
    return {name: specs[name].fn for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (rendered for sf0.01 — the
    docsis fixture path is scale-factor-specific). Queries without an
    entry here (engine-internal hashing / approximate aggregates) get the
    driver's weaker rows-only check."""
    out = {}
    for name, spec in all_queries().items():
        sql = spec.oracle_for(SF01_DIR)
        if sql is not None:
            out[name] = sql
    return out
