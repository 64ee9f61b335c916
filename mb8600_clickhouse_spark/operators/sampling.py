"""Deterministic hash-based dataset splitting (train/val/test).

A training-data pipeline needs its split to be a pure FUNCTION of the
record key: replay-stable across runs and engines (``rand()`` differs
per execution and per partitioning), leak-proof under re-ingestion (a
re-crawled document must land in the same split), and computable as a
narrow per-row expression (no shuffle, no global sort, pushes to the
scan). The standard construction — shared with `q62`'s Bernoulli
sampler — cuts the uniform md5-hex space at cumulative-fraction
boundaries.

Granularity is 16^4 = 65536 buckets (first 4 hex chars), so requested
fractions are honored to ~0.0015%. The salt namespaces the split from
any other hash use of the same key (sampling, quotas), and changing it
re-deals every record — version your salt like a schema.

Reference: the exporter (mb8600.py) has no split concept; this extends
the sampling family (SURVEY.md §2.F4 / q62) to the full-partition case.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def split_cut_points(fractions: dict[str, float]) -> list[tuple[str, str]]:
    """(label, upper-bound-hex) pairs at cumulative-fraction boundaries
    over the 4-hex-char bucket space; the last label takes the remainder.
    Deterministic: insertion order of ``fractions`` is the split order.
    """
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    cuts: list[tuple[str, str]] = []
    acc = 0.0
    labels = list(fractions)
    for name in labels[:-1]:
        acc += fractions[name]
        cuts.append((name, format(int(round(acc * 65536)), "04x")))
    cuts.append((labels[-1], "ffff~"))  # sorts after every 4-hex string
    return cuts


def hash_split(
    key: Column,
    fractions: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> Column:
    """Split-label column for ``key`` (any castable-to-string column).

    Pure narrow expression: md5 of the salted key, first 4 hex chars
    compared against the cumulative cut points — identical semantics are
    expressible verbatim in any engine with md5 (the DuckDB oracle form
    is ``substr(md5('salt:' || CAST(k AS VARCHAR)), 1, 4) < 'cccd'``).
    """
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    h = F.substring(F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))), 1, 4)
    cuts = split_cut_points(fractions)
    expr = F.lit(cuts[-1][0])
    for name, bound in reversed(cuts[:-1]):
        expr = F.when(h < bound, name).otherwise(expr)
    return expr


def temperature_sample(
    df: "DataFrame",
    group_col: str = "lang",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    salt: str = "temp-v1",
) -> "DataFrame":
    """Temperature-based group rebalancing — the multilingual
    alpha-sampling of XLM/mT5 (Conneau & Lample 2019; Xue et al. 2021):
    groups are kept with probability proportional to n_g^(alpha-1), so
    low-resource groups keep (relatively) more and the head is
    down-sampled; rates normalize so the most up-weighted group keeps
    everything. Returns the input rows that survive, plus the per-row
    ``_rate`` applied.

    REPLAY-STABLE and engine-exact by construction: membership is
    ``md5_frac(salted id) < rate_g`` where md5_frac is the first 8 hex
    digits over 2^32 (an exact dyadic rational) and, for the default
    alpha=0.5, rate_g = sqrt(n_min/n_g)... precisely: n_g^(-1/2)
    normalized by the group minimum count's weight — every arithmetic
    step (IEEE sqrt is correctly rounded, one division, one compare) is
    bit-identical in any IEEE-754 engine, so a SQL oracle reproduces
    the EXACT kept set, not a statistical approximation.

    Scale: one count aggregation (map-side combined), a broadcast
    rate table (|groups| rows), and a narrow filter — sampling at scan
    speed, no shuffle of the data itself. alpha values other than 0.5
    use pow(), which is only ulp-reproducible across engines — keep
    oracle-checked pipelines on 0.5 (sqrt) or verify rows-only.
    """
    from pyspark.sql import functions as F

    counts = df.groupBy(group_col).agg(F.count("*").alias("_n"))
    if alpha == 0.5:
        w = 1.0 / F.sqrt(F.col("_n").cast("double"))
    else:
        w = F.pow(F.col("_n").cast("double"), F.lit(alpha - 1.0))
    rates = counts.select(
        group_col, w.alias("_w")
    )
    wmax = rates.agg(F.max("_w").alias("_wmax"))
    rates = rates.crossJoin(F.broadcast(wmax)).select(
        group_col, (F.col("_w") / F.col("_wmax")).alias("_rate")
    )
    frac = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 32))
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .withColumn("_frac", frac)
        .filter(F.col("_frac") < F.col("_rate"))
        .drop("_frac")
    )
