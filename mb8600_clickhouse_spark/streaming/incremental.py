"""Incremental materialized-view maintenance over a manifest stream.

The ClickHouse idiom this re-expresses is the materialized-view →
SummingMergeTree dashboard rollup the reference's schema is built for
(`/root/reference/tables.sql` declares the raw modem table; its implied
dashboards aggregate it per modem/time-bucket). In ClickHouse the MV
re-aggregates every INSERT; here the same contract is Structured
Streaming end-to-end on the engine's own table format:

    ManifestTable appends  ──readStream format("manifest")──►
      micro-batch of NEW rows only  ──additive partial agg──►
        merge into the rollup ManifestTable (exactly-once)

Only ADDITIVE aggregates (count / sum / min / max) are maintainable
this way — each micro-batch contributes a partial state that merges
associatively with the standing rollup, so maintenance cost per batch
is O(|batch| + |rollup|), independent of source history length.
Averages come out of sum+count downstream; non-additive aggregates
(exact distinct, percentile) need the full history and belong in batch.

Scale posture: the partial aggregation is a normal map-side-combined
groupBy over just the batch's files (the manifest source reads only
files ADDED since the last offset); the merge unions the current
rollup snapshot (small by construction — it's an aggregate) with the
tiny partials and re-aggregates. The rollup rewrite is copy-on-write;
at real scale you'd partition the rollup table and rewrite only touched
partitions, which `ManifestTable` supports by composing this sink with
a partition predicate — noted rather than built because the rollup is
dimensionally tiny at any source scale.

Exactly-once: each merge commits as an ``overwrite`` carrying the
micro-batch epoch id; a checkpoint-recovery replay finds its epoch in
``committed_epochs()`` and no-ops (same ledger as
``ingest.manifest_epoch_sink``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import ManifestTable
from ..sources import manifest_datasource

# out_column -> (kind, input_expr); kind governs both the per-batch
# partial and the partial-vs-rollup merge function.
AggSpec = dict[str, tuple[str, str]]

_PARTIAL = {
    "count": lambda e: F.count(F.expr(e)),
    "sum": lambda e: F.sum(F.expr(e)),
    "min": lambda e: F.min(F.expr(e)),
    "max": lambda e: F.max(F.expr(e)),
}
# counts merge by SUMMING partial counts; the rest merge with themselves
_MERGE = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def _check(aggs: AggSpec) -> None:
    bad = {k: v[0] for k, v in aggs.items() if v[0] not in _PARTIAL}
    if bad:
        raise ValueError(
            f"non-additive aggregate(s) {bad}: incremental maintenance "
            f"supports {sorted(_PARTIAL)} (avg = sum/count downstream; "
            "distinct/percentiles need batch recompute)"
        )


def partial_rollup(batch: DataFrame, keys: list[str], aggs: AggSpec) -> DataFrame:
    """One micro-batch's additive partial state (map-side combined)."""
    _check(aggs)
    return batch.groupBy(*keys).agg(
        *[_PARTIAL[kind](expr).alias(name) for name, (kind, expr) in aggs.items()]
    )


def merge_rollup(
    current: DataFrame | None, partial: DataFrame, keys: list[str], aggs: AggSpec
) -> DataFrame:
    """Fold a partial state into the standing rollup (associative merge;
    ``current=None`` bootstraps from the first batch)."""
    if current is None:
        return partial
    return (
        current.select(partial.columns)
        .unionByName(partial)
        .groupBy(*keys)
        .agg(
            *[
                _MERGE[kind](F.col(name)).alias(name)
                for name, (kind, _) in aggs.items()
            ]
        )
    )


def rollup_sink(rollup_path: str, keys: list[str], aggs: AggSpec):
    """foreachBatch sink maintaining the rollup table exactly-once."""
    _check(aggs)

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        table = ManifestTable(rollup_path)
        if epoch_id in table.committed_epochs():
            return  # checkpoint replay — already merged
        partial = partial_rollup(batch_df, keys, aggs)
        current = (
            None
            if table.latest_version() is None
            else table.read(batch_df.sparkSession)
        )
        merged = merge_rollup(current, partial, keys, aggs)
        table.overwrite(merged, extra={"epoch": epoch_id})

    return _sink


def demote_expired(
    spark: SparkSession,
    source_path: str,
    rollup_path: str,
    ts_col: str,
    cutoff,
    keys: list[str],
    aggs: AggSpec,
) -> dict:
    """ClickHouse ``TTL ... GROUP BY`` across tables: rows about to
    expire from the source fold into the rollup (additively), then the
    source expires them — raw data ages OUT, its aggregate contribution
    stays. The expired-row read is a stats-pruned ``scan`` (only files
    that can contain pre-cutoff rows are opened), and the source-side
    deletion is ``expire`` (wholly-dead files drop metadata-only).

    Cross-table, so not atomic: the rollup merge commits FIRST with a
    (ts_col, cutoff) marker; a crash before the source expire leaves
    the marker, and retrying the same cutoff skips the merge instead of
    double-counting. The caller's contract is retry-same-cutoff-until-
    success, the same idempotent-replay shape as the streaming sink."""
    src = ManifestTable(source_path)
    roll = ManifestTable(rollup_path)
    marker = f"{ts_col}<{cutoff}"
    if marker not in roll.committed_markers("demote"):
        expired = src.scan(spark, [(ts_col, "<", cutoff)])
        if not expired.isEmpty():
            partial = partial_rollup(expired, keys, aggs)
            current = (
                None if roll.latest_version() is None else roll.read(spark)
            )
            merged = merge_rollup(current, partial, keys, aggs)
            roll.overwrite(merged, extra={"demote": marker})
    return src.expire(spark, ts_col, cutoff)


def maintain_rollup(
    spark: SparkSession,
    source_path: str,
    rollup_path: str,
    keys: list[str],
    aggs: AggSpec,
    checkpoint_dir: str,
    processing_time: str | None = None,
    available_now: bool = False,
):
    """Start (or resume, given the same checkpoint) the maintenance
    stream: manifest-table appends at ``source_path`` flow into the
    rollup at ``rollup_path``. ``available_now=True`` catches up on the
    backlog and stops — the scheduled-refresh shape; a processing-time
    trigger keeps it continuous — the live-dashboard shape."""
    manifest_datasource.register(spark)
    stream = spark.readStream.format("manifest").option("path", source_path).load()
    writer = stream.writeStream.foreachBatch(
        rollup_sink(rollup_path, keys, aggs)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
