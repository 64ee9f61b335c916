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


def budget_mix(
    df: "DataFrame",
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "mix-v1",
    two_phase: bool = False,
    n_ranges: int = 64,
) -> "DataFrame":
    """Token-budget source mixing — the Dolma/RedPajama/DataComp recipe
    for assembling a training corpus to a fixed size: source ``s`` gets
    a token target of ``token_budget * weights[s]``; its documents are
    taken in salted-md5 order (a deterministic, unbiased shuffle —
    replay-stable across runs and engines) until the running token
    total CROSSES the target. The crossing document is kept (the fill
    rule: every source with enough data reaches at least its target;
    a source with less contributes everything). Sources absent from
    ``weights`` are dropped (weight 0).

    Returns the kept rows plus ``n_tokens`` and ``cum_before`` (tokens
    taken from the source before this document — the audit columns a
    mixing report needs). Exact by construction: token counts are
    integers, the keep rule is an integer comparison, and the md5 sort
    key is an engine-portable string — a SQL oracle reproduces the
    EXACT kept set.

    Scale shape: one narrow projection (token count at scan speed),
    then ONE window partitioned by source ordered by the salted key —
    per-source parallel; a single giant source serializes onto one
    task's sort. ``two_phase=True`` is the 100 TB lever for that case:
    the md5 key space is cut into ``n_ranges`` DETERMINISTIC buckets
    (integer arithmetic on the key prefix — no RangePartitioner
    sampling, so replay-stable), per-(source, bucket) token subtotals
    cumulate over a tiny broadcast table into prefix offsets, and the
    running total becomes offset + a LOCAL window partitioned by
    (source, bucket) — the giant source's sort now runs ``n_ranges``
    ways parallel with per-task input bounded at ~1/n_ranges of the
    source. Bucket-major md5 order equals global md5 order (the bucket
    IS the key prefix), so the kept set is IDENTICAL to the one-window
    spelling (property-tested)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from .text import norm_tokens

    spark = df.sparkSession
    tgt = spark.createDataFrame(
        [(s, int(token_budget * w)) for s, w in sorted(weights.items())],
        f"{source_col} string, _target long",
    )
    key = F.md5(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    ).alias("_k")
    d = df.select(
        id_col,
        source_col,
        F.size(norm_tokens(F.col(text_col))).alias("n_tokens"),
        key,
    )
    if not two_phase:
        win = (
            W.partitionBy(source_col)
            .orderBy("_k", id_col)
            .rowsBetween(W.unboundedPreceding, -1)
        )
        return (
            d.join(F.broadcast(tgt), source_col)
            .withColumn(
                "cum_before", F.coalesce(F.sum("n_tokens").over(win), F.lit(0))
            )
            .filter(F.col("cum_before") < F.col("_target"))
            .drop("_k", "_target")
        )
    # phase 1: deterministic range bucket from the first 8 hex chars of
    # the uniform md5 key — monotone in _k, so bucket-major (_k, id)
    # order IS the global (_k, id) order; ties on the prefix stay in one
    # bucket (the id tiebreak only matters within equal full keys)
    width = (1 << 32) // n_ranges + 1
    b = d.withColumn(
        "_bkt", (F.conv(F.substring("_k", 1, 8), 16, 10).cast("long") / width)
        .cast("int"),
    )
    # per-(source, bucket) subtotals -> prefix offsets: n_sources x
    # n_ranges rows, a broadcast-sized ledger however big the corpus is
    off_w = (
        W.partitionBy(source_col)
        .orderBy("_bkt")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = (
        b.groupBy(source_col, "_bkt")
        .agg(F.sum("n_tokens").alias("_sub"))
        .withColumn(
            "_off", F.coalesce(F.sum("_sub").over(off_w), F.lit(0))
        )
        .drop("_sub")
    )
    # phase 2: local cumsum within each (source, bucket) — parallel
    # across buckets, task input bounded by the bucket slice
    loc_w = (
        W.partitionBy(source_col, "_bkt")
        .orderBy("_k", id_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        b.join(F.broadcast(offsets), [source_col, "_bkt"])
        .join(F.broadcast(tgt), source_col)
        .withColumn(
            "cum_before",
            F.col("_off")
            + F.coalesce(F.sum("n_tokens").over(loc_w), F.lit(0)),
        )
        .filter(F.col("cum_before") < F.col("_target"))
        .drop("_k", "_bkt", "_off", "_target")
    )
