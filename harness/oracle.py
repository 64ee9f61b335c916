"""Differential correctness harness: Spark result vs DuckDB oracle.

Mirrors the driver's t2 gate (SURVEY.md §5.2.2): run the Spark query and
the oracle SQL on the same parquet fixtures, canonicalize (sort columns by
name, canonical cell rendering, sort rows), and compare row count, schema
arity, and an order-insensitive value hash. Also reports the first
mismatching cells for debugging.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass, field

import duckdb
import numpy as np
import pandas as pd

from mb8600_clickhouse_spark.schemas import FIXTURE_TABLES


def make_duckdb(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with the 10 driver tables registered as views,
    exactly as the driver's oracle does."""
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v) -> str:
    if v is None or v is pd.NA or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        return repr(f)
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v)).lower()
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canonicalize(df: pd.DataFrame) -> tuple[list[str], list[tuple[str, ...]]]:
    """Column-wise cell rendering, preserving each column's dtype.

    Must NOT iterate ``df.iterrows()``: that materializes each row as a
    Series whose values are upcast to a single homogeneous dtype, so an
    int64 column sitting next to any float column renders as ``92.0``
    instead of ``92`` — masking exactly the dtype divergence the driver
    gate detects (its canonicalizer is column-wise). Verified by the
    q70 round-4/5 incident: local gate green, driver hash-FAIL, because
    DuckDB's HUGEINT→float64 ``92.0`` and Spark's int64 ``92`` both
    rendered ``92.0`` under iterrows upcasting."""
    cols = sorted(df.columns)
    rendered = [[_canon_cell(v) for v in df[c].tolist()] for c in cols]
    rows = [tuple(col[i] for col in rendered) for i in range(len(df))]
    rows.sort()
    return cols, rows


def value_hash(rows: list[tuple[str, ...]]) -> str:
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""
    diffs: list = field(default_factory=list)

    def __str__(self) -> str:
        s = "OK  " if self.ok else "FAIL"
        msg = f"{s} {self.name}: spark={self.spark_rows} oracle={self.oracle_rows} {self.detail}"
        for d in self.diffs[:5]:
            msg += f"\n      {d}"
        return msg


def driver_canon_check(name: str, spark_pdf: pd.DataFrame,
                       oracle_pdf: pd.DataFrame) -> CompareResult | None:
    """Reproduce the DRIVER's canonicalization hazards exactly.

    The external driver's ``_canon`` does a raw-cell pandas
    ``sort_values`` over every column BEFORE rendering — list/ndarray/
    dict cells are unhashable there and the whole query records ``err``
    (CORRECTNESS_r08: 9 rows, q160-class). It also compares dtypes, so
    a tz-aware oracle timestamp vs a tz-naive Spark one is a
    schema_match FAIL (q188) even though this harness's renderer
    normalizes both to naive ISO strings. Run both hazards here so the
    local gate can never be greener than the driver again (VERDICT r08
    next-round #3). Returns a FAIL CompareResult, or None if clean."""
    for side, pdf in (("spark", spark_pdf), ("oracle", oracle_pdf)):
        try:
            cols = sorted(pdf.columns)
            pdf[cols].sort_values(by=cols)
        except TypeError as e:
            return CompareResult(
                name, False, len(spark_pdf), len(oracle_pdf),
                f"driver-canon crash ({side}): {e} — output cells must be "
                "scalar (the q07 list-cell rule)",
            )
        for c in pdf.columns:
            dt = pdf[c].dtype
            if isinstance(dt, pd.DatetimeTZDtype):
                return CompareResult(
                    name, False, len(spark_pdf), len(oracle_pdf),
                    f"driver-dtype hazard ({side}.{c}): tz-aware {dt} — "
                    "spell timestamps tz-naive on both sides (the q188 rule)",
                )
    return None


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> CompareResult:
    hazard = driver_canon_check(name, spark_pdf, oracle_pdf)
    if hazard is not None:
        return hazard
    s_cols, s_rows = canonicalize(spark_pdf)
    o_cols, o_rows = canonicalize(oracle_pdf)
    if s_cols != o_cols:
        return CompareResult(
            name, False, len(s_rows), len(o_rows),
            f"column mismatch: spark={s_cols} oracle={o_cols}",
        )
    if len(s_rows) != len(o_rows):
        return CompareResult(name, False, len(s_rows), len(o_rows), "row count mismatch")
    if value_hash(s_rows) == value_hash(o_rows):
        return CompareResult(name, True, len(s_rows), len(o_rows))
    diffs = []
    for i, (a, b) in enumerate(zip(s_rows, o_rows)):
        if a != b:
            for c, (x, y) in zip(s_cols, zip(a, b)):
                if x != y:
                    diffs.append(f"row {i} col {c}: spark={x!r} oracle={y!r}")
            if len(diffs) >= 5:
                break
    return CompareResult(name, False, len(s_rows), len(o_rows), "value mismatch", diffs)


def run_one(spark, con, spec, sf_dir: str, tolerance: float | None = None) -> CompareResult:
    sdf = spec.fn(spark, sf_dir).toPandas()
    sql = spec.oracle_for(sf_dir)
    if sql is None:
        ok = len(sdf) >= 0
        return CompareResult(spec.name, ok, len(sdf), -1, "rows-only (no oracle)")
    odf = con.sql(sql).df()
    if tolerance is not None:
        return _compare_tolerant(spec.name, sdf, odf, tolerance)
    return compare(spec.name, sdf, odf)


def _compare_tolerant(name, sdf, odf, tol) -> CompareResult:
    """Numeric comparison with relative tolerance (approx aggregates).
    The driver-canon hazards gate this path too (round 9) — a
    tolerance query with a list cell or tz-aware dtype would err in
    the driver exactly like an exact one."""
    hazard = driver_canon_check(name, sdf, odf)
    if hazard is not None:
        return hazard
    s_cols, s_rows = canonicalize(sdf)
    o_cols, o_rows = canonicalize(odf)
    if s_cols != o_cols or len(s_rows) != len(o_rows):
        return CompareResult(name, False, len(s_rows), len(o_rows), "shape mismatch")
    for a, b in zip(s_rows, o_rows):
        for x, y in zip(a, b):
            try:
                fx, fy = float(x), float(y)
                if fy != 0 and abs(fx - fy) / abs(fy) > tol:
                    return CompareResult(name, False, len(s_rows), len(o_rows), f"tol exceeded: {x} vs {y}")
            except ValueError:
                if x != y:
                    return CompareResult(name, False, len(s_rows), len(o_rows), f"{x} != {y}")
    return CompareResult(name, True, len(s_rows), len(o_rows), f"within {tol}")
