"""Full-registry sweep ledger (r07 verdict #3): run EVERY declared
query against its DuckDB oracle at sf0.01 and write a machine-readable
artifact — name, row counts, canonical value hashes, match verdict —
that the judge can diff instead of re-executing 159 queries when the
driver's ~50-row window leaves names stale for multiple rounds.

Usage: python -m harness.sweep [sf_dir] [out_path]
Default out: SWEEP.json at the repo root (commit it each round).

The hash is the harness's canonical order-insensitive value hash
(harness.oracle.canonicalize + value_hash — the same construction the
driver gate uses), so a row with spark_hash == oracle_hash here is
exactly a driver-green row.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

from harness.oracle import (
    canonicalize,
    driver_canon_check,
    make_duckdb,
    value_hash,
)
from mb8600_clickhouse_spark.queries import all_queries
from mb8600_clickhouse_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    out_path = Path(args[1]) if len(args) > 1 else (
        Path(__file__).resolve().parent.parent / "SWEEP.json"
    )
    spark = get_spark("sweep")
    con = make_duckdb(sf_dir)
    specs = all_queries()
    ledger: dict[str, dict] = {}
    n_ok = 0
    t_start = time.time()
    for name, spec in sorted(specs.items()):
        t0 = time.time()
        entry: dict = {}
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
            s_cols, s_rows = canonicalize(sdf)
            entry["spark_rows"] = len(s_rows)
            entry["spark_hash"] = value_hash(s_rows)
            sql = spec.oracle_for(sf_dir)
            if sql is None:
                entry["oracle_hash"] = None
                entry["ok"] = entry["spark_rows"] >= 0
                entry["note"] = "rows-only (no oracle)"
            else:
                odf = con.sql(sql).df()
                o_cols, o_rows = canonicalize(odf)
                entry["oracle_rows"] = len(o_rows)
                entry["oracle_hash"] = value_hash(o_rows)
                # the driver's raw-cell sort + dtype hazards (round 9:
                # the r08 list-cell/tz-aware incident class) gate the
                # ledger too — a row is only "ok" if the DRIVER would
                # also record it green
                hazard = driver_canon_check(name, sdf, odf)
                entry["ok"] = (
                    hazard is None
                    and s_cols == o_cols
                    and entry["spark_rows"] == entry["oracle_rows"]
                    and entry["spark_hash"] == entry["oracle_hash"]
                )
                if hazard is not None:
                    entry["note"] = hazard.detail[:200]
                elif s_cols != o_cols:
                    entry["note"] = f"columns spark={s_cols} oracle={o_cols}"
        except Exception as e:  # noqa: BLE001
            entry["ok"] = False
            entry["note"] = str(e).split("\n")[0][:200]
        entry["secs"] = round(time.time() - t0, 2)
        ledger[name] = entry
        n_ok += bool(entry.get("ok"))
        print(f"{'OK ' if entry.get('ok') else 'FAIL'} {name} [{entry['secs']}s]")
    out = {
        "sf_dir": sf_dir,
        "n_queries": len(ledger),
        "n_ok": n_ok,
        "wall_seconds": round(time.time() - t_start, 1),
        "queries": ledger,
    }
    out_path.write_text(json.dumps(out, indent=1, sort_keys=True))
    print(f"\n{n_ok}/{len(ledger)} ok -> {out_path}")
    return 0 if n_ok == len(ledger) else 1


if __name__ == "__main__":
    sys.exit(main())
