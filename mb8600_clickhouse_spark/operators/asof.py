"""As-of (time-travel) join — an operator Spark lacks natively.

``asof_join(left, right)`` pairs every left row with the latest right row
whose timestamp is <= (or strictly <, with ``strict=True``) the left
row's timestamp, within the same key group. The classic uses: price
as-of trade time, latest scrape as-of an event.

Implementation is the MERGE formulation, not a range join:

1. tag both inputs and union them into one stream of (key, ts, tag,
   payload) rows — right rows carry their payload in a struct, left rows
   carry null;
2. one window scan per key ordered by (ts, tag): ``last(payload, ignore
   nulls)`` carries the most recent right payload forward;
3. keep only left rows and unpack the carried struct.

Cost: one hash-shuffle of each side on the key + one sort — identical to
a sort-merge equi-join, independent of time-range density. A naive
range join (``l.ts BETWEEN r.ts AND r.ts + horizon``) explodes on dense
right sides and needs a horizon; this shape does neither, and it is the
scalable spelling at 100 TB (both shuffles are key-partitioned; skewed
keys fall to AQE skew handling).

The tag orders right rows BEFORE left rows at equal timestamps, giving
``<=`` semantics; ``strict=True`` flips the tag order for ``<``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
    strict: bool = False,
) -> DataFrame:
    """Left as-of join: every ``left`` row + the latest ``right`` row with
    ``right_ts <= left_ts`` (``<`` when strict) per ``on`` key group.
    Right payload columns come back ``prefix``-renamed; left rows with no
    prior right row keep nulls (left-outer semantics)."""
    right_cols = right_cols or [
        c for c in right.columns if c not in set(on) | {right_ts}
    ]
    payload = F.struct(
        F.col(right_ts).alias(f"{prefix}{right_ts}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
    )
    # tag: right sorts before left at equal ts for <=; after for <
    r_tag, l_tag = (0, 1) if not strict else (1, 0)
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ts"),
        F.lit(r_tag).alias("_tag"),
        payload.alias("_r"),
    )
    lpay = F.struct(*[F.col(c) for c in left.columns])
    l = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_ts"),
        F.lit(l_tag).alias("_tag"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
        lpay.alias("_l"),
    )
    r = r.withColumn("_l", F.lit(None).cast(l.schema["_l"].dataType))
    u = l.select(*on, "_ts", "_tag", "_r", "_l").unionByName(
        r.select(*on, "_ts", "_tag", "_r", "_l")
    )
    # final tiebreak: when several RIGHT rows share (key, ts), the
    # window's intra-tie order is nondeterministic and last(_r) would
    # return a different payload run-to-run. A stable payload hash
    # pins the winner (the max-hash row) deterministically; it only
    # reorders same-tag ties, so <=/< semantics are unaffected.
    w = (
        W.partitionBy(*on)
        .orderBy("_ts", "_tag", F.xxhash64("_r"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = u.withColumn("_match", F.last("_r", ignorenulls=True).over(w))
    out_left = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_right = [
        F.col(f"_match.{prefix}{right_ts}").alias(f"{prefix}{right_ts}"),
        *[F.col(f"_match.{prefix}{c}").alias(f"{prefix}{c}") for c in right_cols],
    ]
    return carried.filter(F.col("_tag") == l_tag).select(*out_left, *out_right)
