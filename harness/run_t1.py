"""t1 smoke (SURVEY.md §5.2.1): every declared query must parse, plan,
and execute at sf0.001.

Usage: python -m harness.run_t1 [sf_dir]
"""

from __future__ import annotations

import sys
import time

from mb8600_clickhouse_spark.queries import all_queries
from mb8600_clickhouse_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("t1-smoke")
    failures = []
    for name, spec in sorted(all_queries().items()):
        t0 = time.time()
        try:
            n = spec.fn(spark, sf_dir).count()
            print(f"OK   {name}: {n} rows [{time.time() - t0:.1f}s]")
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {str(e).splitlines()[0][:200]}")
            failures.append(name)
    print(f"\n{len(all_queries()) - len(failures)}/{len(all_queries())} ok; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
