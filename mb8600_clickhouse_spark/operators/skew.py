"""Skew-handling primitives: salted aggregation and salted joins.

AQE's skew-join splitting handles sort-merge join skew automatically
(enabled in session.py), but two shapes still need explicit salting at
100 TB:

- **hot-key aggregation**: one key holding 1% of a 100 TB table sends
  1 TB through a single reducer. ``salted_agg`` spreads each key over
  ``n_salts`` partial groups and re-aggregates — two small shuffles
  instead of one skewed one.
- **hot-key equi-join against a medium dimension** (too big to
  broadcast): ``salted_join`` salts the fact side and explodes the
  dimension side ``n_salts``-fold so every salted fact key finds its
  match. Dimension replication × n_salts is the explicit, bounded cost.

Both are deterministic: the salt is a hash of stable columns, never
``rand()`` (reproducible runs, and oracle-checkable if ever declared).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame, salt_from: str | list[str], n_salts: int = 16
) -> DataFrame:
    """Deterministic salt in [0, n_salts) derived from stable column(s)
    (NOT rand(): replays and retries must re-derive identical salts).

    ``salt_from`` must vary WITHIN a hot group key — salting by the
    group key itself gives every row of the hot key the same salt and
    spreads nothing. Pass a row-distinguishing column (an id) or a list
    of columns."""
    cols = [salt_from] if isinstance(salt_from, str) else list(salt_from)
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts)).cast("int")
    )


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: list[tuple[str, str, Callable[[str], Column], Callable[[str], Column]]],
    salt_from: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs`` is a list of (out_name, src_col, partial_fn, merge_fn),
    e.g. ``[("n", "x", F.count, F.sum), ("total", "x", F.sum, F.sum)]``
    — the decomposition must be algebraic (count merges via sum, sum via
    sum, min via min, ...). Phase 1 groups by (keys + salt) so the hot
    key spreads over n_salts reducers; phase 2 merges the n_salts
    partials per key — a shuffle of |keys| x n_salts pre-aggregated
    rows, not raw data."""
    partial = (
        with_salt(df, salt_from, n_salts)
        .groupBy(*group_cols, "_salt")
        .agg(*[pfn(src).alias(name) for name, src, pfn, _m in aggs])
    )
    return partial.groupBy(*group_cols).agg(
        *[mfn(name).alias(name) for name, _src, _p, mfn in aggs]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
    salt_from: str | list[str] | None = None,
) -> DataFrame:
    """Equi-join with a salted fact side: the dimension is exploded
    n_salts-fold so each (key, salt) pair finds its match — the hot fact
    key's rows spread over n_salts tasks instead of one.

    ``salt_from`` defaults to ALL fact columns, so rows of a hot key
    land on different salts as long as they differ anywhere (salting by
    the join key alone would put the whole hot key on one salt).

    Only ``inner`` and ``left`` are valid: the join is written from the
    fact side, and a right/full outer join would emit every unmatched
    dimension row once per salt replica."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' (got {how!r}): "
            "right/full outer would duplicate unmatched dim rows n_salts times"
        )
    f = with_salt(fact, salt_from or fact.columns, n_salts)
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    return f.join(d, [key, "_salt"], how).drop("_salt")


def key_skew_profile(df: DataFrame, key_col: str) -> DataFrame:
    """Operational PRE-FLIGHT for a big join/aggregation key: the
    per-key frequency distribution summarized as ONE row —
    (n_keys, n_rows, max_count, mean, p50, p90, skew_ratio) — the
    numbers that decide whether a key needs salting (``salted_join``/
    ``salted_agg``), an AQE skew-join threshold bump, or nothing.
    skew_ratio = max/mean; >~10 on a join key means the hottest task
    runs ~skew_ratio x the median task absent mitigation.

    Scale: one map-side-combined count per key, then a single-row
    summary aggregate over |keys| rows (exact percentiles over the
    COUNT distribution, which is key-cardinality-, not corpus-,
    sized)."""
    counts = df.groupBy(key_col).agg(F.count("*").alias("n"))
    return counts.agg(
        F.count("*").alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_count"),
        (F.sum("n").cast("double") / F.count("*")).alias("mean_count"),
        F.expr("percentile(n, 0.5)").alias("p50"),
        F.expr("percentile(n, 0.9)").alias("p90"),
        (
            F.max("n").cast("double")
            / (F.sum("n").cast("double") / F.count("*"))
        ).alias("skew_ratio"),
    )
