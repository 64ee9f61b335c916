"""Run the full differential correctness suite (Spark vs DuckDB oracle).

Usage: python -m harness.run_t2 [sf_dir] [query_name ...]

``SPARK_GRAFT_MIMIC=1`` runs the sweep on a DEFAULT-CONFIG SparkSession
(UTC only — the one conf correctness legitimately requires) instead of
the engine session: the external driver's runner builds its own session,
and config-dependent divergences hide from the tuned session (the q70
class: its two-round driver-red hash survived every local sweep until a
default-config reproduction). A mimic sweep staying green certifies the
registry's results do not depend on AQE/CBO/advisory/partition tuning.
"""

from __future__ import annotations

import os
import sys
import time

from harness.oracle import make_duckdb, run_one
from mb8600_clickhouse_spark.queries import all_queries
from mb8600_clickhouse_spark.session import get_spark


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a]

    specs = all_queries()
    if names:
        # loud on typos (VERDICT r10 #3), and BEFORE the JVM spins up:
        # a misspelled name must fail the certification command
        # instantly, not silently under-cover (ab.py's exit-2 rule)
        unknown = sorted(set(names) - set(specs))
        if unknown:
            print(f"ERROR: unknown query names: {', '.join(unknown)}")
            return 2
        specs = {k: v for k, v in specs.items() if k in names}

    if os.environ.get("SPARK_GRAFT_MIMIC") == "1":
        from pyspark.sql import SparkSession

        print("# driver-mimic mode: default-config SparkSession (+UTC)")
        spark = (
            SparkSession.builder.master("local[32]")
            .appName("t2-mimic")
            .config("spark.sql.session.timeZone", "UTC")
            # capacity, not semantics: the default 1g driver heap OOMs
            # after ~155 accumulated queries in one JVM (round 11 —
            # deterministic at q64 in sort order, streaming state-store
            # maintenance threads included; every failed query passes
            # in a fresh default session). Heap size cannot change a
            # query RESULT, so raising it preserves exactly what mimic
            # mode certifies: no dependence on AQE/CBO/advisory/
            # partition tuning.
            .config("spark.driver.memory", "8g")
            .getOrCreate()
        )
    else:
        spark = get_spark("t2-harness")
    con = make_duckdb(sf_dir)
    n_ok = 0
    failures = []
    for name, spec in sorted(specs.items()):
        t0 = time.time()
        try:
            res = run_one(spark, con, spec, sf_dir)
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:300]
            print(f"ERR  {name}: {msg}")
            failures.append(name)
            continue
        print(f"{res}  [{time.time() - t0:.1f}s]")
        if res.ok:
            n_ok += 1
        else:
            failures.append(name)
    print(f"\n{n_ok}/{len(specs)} ok; failures: {failures}")
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
