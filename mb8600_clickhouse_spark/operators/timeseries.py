"""Time-series gap filling — ClickHouse ``ORDER BY ... WITH FILL
[INTERPOLATE]`` re-expressed as DataFrame ops (SURVEY §2.F extension;
the reference's implied dashboards plot per-modem channel metrics over
time, where a missed scrape otherwise shows as a hole, not a zero).

Shape: the input is an already-bucketed aggregate (one row per
key × bucket). Each key's missing buckets are generated with
``sequence(min, max, step)`` — a codegen-able generator whose output is
bounded by the time range, never the raw row count — and left-joined
back. The join shuffles on (keys, bucket), the same partitioning the
upstream aggregation just produced, so AQE plans it cheaply; nothing
here touches raw-event cardinality, making the operator safe at any
source scale.

Two fill policies:
- ``fill_gaps``: constant defaults per column (``WITH FILL`` + zeros);
- ``interpolate_linear``: straight line between the nearest real
  observations before/after the hole (``INTERPOLATE`` semantics), via
  two ignorenulls window scans — no self-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def time_spine(
    bucketed: DataFrame, keys: list[str], bucket_col: str, step: str
) -> DataFrame:
    """One row per key × bucket over each key's observed [min, max]
    range: the dense scaffold a gap-free series joins against.
    ``step`` is an INTERVAL literal body, e.g. ``'1 hour'``."""
    return (
        bucketed.groupBy(*keys)
        .agg(F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi"))
        .select(
            *keys,
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.expr(f"INTERVAL {step}"))
            ).alias(bucket_col),
        )
    )


def fill_gaps(
    bucketed: DataFrame,
    keys: list[str],
    bucket_col: str,
    step: str,
    defaults: dict[str, object],
) -> DataFrame:
    """Densify a bucketed series: every missing (key, bucket) appears
    with ``defaults`` values (the ClickHouse ``WITH FILL`` contract).
    Columns not in ``defaults`` stay null on generated rows."""
    spine = time_spine(bucketed, keys, bucket_col, step)
    out = spine.join(bucketed, [*keys, bucket_col], "left")
    for c, v in defaults.items():
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(v)))
    return out


def interpolate_linear(
    filled: DataFrame, keys: list[str], bucket_col: str, cols: list[str]
) -> DataFrame:
    """Linearly interpolate null runs in ``cols`` between their nearest
    non-null neighbors per key (ClickHouse ``INTERPOLATE``). Boundary
    nulls (before the first / after the last observation) stay null.

    Per column: one backward-looking and one forward-looking
    ``ignorenulls`` window pass carry the previous/next real value and
    its bucket position; the fill is the rank-weighted blend of the two.
    Both windows sort the same (keys, bucket) partitioning — Catalyst
    plans a single sort, no join, no per-gap work."""
    wb = W.partitionBy(*keys).orderBy(bucket_col)
    back = wb.rowsBetween(W.unboundedPreceding, 0)
    fwd = wb.rowsBetween(0, W.unboundedFollowing)
    pos = F.unix_micros(F.col(bucket_col)).cast("double")
    out = filled
    for c in cols:
        val = F.col(c)
        tagged_pos = F.when(val.isNotNull(), pos)
        pv = F.last(val, ignorenulls=True).over(back)
        pp = F.last(tagged_pos, ignorenulls=True).over(back)
        nv = F.first(val, ignorenulls=True).over(fwd)
        np_ = F.first(tagged_pos, ignorenulls=True).over(fwd)
        frac = (pos - pp) / (np_ - pp)
        out = out.withColumn(
            c,
            F.when(val.isNotNull(), val).otherwise(
                F.when(
                    pv.isNotNull() & nv.isNotNull(), pv + (nv - pv) * frac
                )
            ),
        )
    return out
