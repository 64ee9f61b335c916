"""Run the full differential correctness suite (Spark vs DuckDB oracle).

Usage: python -m harness.run_t2 [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time

from harness.oracle import make_duckdb, run_one
from mb8600_clickhouse_spark.queries import all_queries
from mb8600_clickhouse_spark.session import get_spark


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a]

    spark = get_spark("t2-harness")
    con = make_duckdb(sf_dir)
    specs = all_queries()
    if names:
        specs = {k: v for k, v in specs.items() if k in names}

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
