"""Benchmark runner: all declared queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = total wall seconds across all declared queries (lower is better).
Each query is executed to completion (count() action) after a warm-up of
the session; per-query seconds are reported individually.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from mb8600_clickhouse_spark.queries import all_queries  # noqa: E402
from mb8600_clickhouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    spark = get_spark("bench")

    specs = all_queries()
    # Warm up the JVM + parquet footers: one cheap query, then a count of
    # every fixture table so no query is charged for the first cold read
    # of a table that happens to sort before its siblings.
    specs["q14_top_k"].fn(spark, sf_dir).count()
    from mb8600_clickhouse_spark.tables import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.count()

    per_query: dict[str, float] = {}
    total = 0.0
    for name, spec in sorted(specs.items()):
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        df.count()
        dt = round(time.perf_counter() - t0, 3)
        per_query[name] = dt
        total += dt
        print(f"# {name}: {dt:.3f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "total_declared_query_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
