"""Table layout policies — the Spark stand-in for the reference's
ClickHouse storage clauses (reference ``tables.sql:30``):

    PARTITION BY toDate(timestamp)            -> directory partitioning
    ORDER BY / PRIMARY KEY (modem_name, ts)   -> sortWithinPartitions +
                                                 Parquet row-group min/max
                                                 stats (data skipping)
    MergeTree columnar + LowCardinality codecs-> Parquet columnar +
                                                 automatic dictionary
                                                 encoding

A ``TableLayout`` carries everything a writer needs to lay files out so
the engine's scan-time optimizations (partition pruning, row-group
skipping, column pruning) hold at any scale. ``write_table`` is the one
write path — ingest micro-batches and batch backfills both go through
it, so layout is a property of the TABLE, not of whoever wrote it.

100 TB posture: date partitioning bounds each partition to one day of
data; within a partition, files are sorted on the prefix keys so a
``WHERE modem_name = ? AND timestamp BETWEEN ...`` scan reads only
matching row groups. ``target_file_rows`` keeps files large enough to
amortize footer/open costs (the small-file problem) — on a cluster,
pair it with periodic compaction of streaming output.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class TableLayout:
    """Physical layout policy for one managed table."""

    name: str
    partition_col: str                      # materialized partition column
    partition_expr: str                     # SQL expr deriving it
    sort_cols: tuple[str, ...]              # within-partition sort (PK prefix)
    target_file_rows: int = 4_000_000

    def partition_column(self) -> Column:
        return F.expr(self.partition_expr).alias(self.partition_col)


# reference tables.sql:30 — PARTITION BY toDate(timestamp),
# ORDER BY (modem_name, timestamp)
DOCSIS_LAYOUT = TableLayout(
    name="docsis",
    partition_col="date",
    partition_expr="to_date(timestamp)",
    sort_cols=("modem_name", "timestamp"),
)

# the events stream table: daily partitions, (user_id, ts) scan prefix
EVENTS_LAYOUT = TableLayout(
    name="events",
    partition_col="date",
    partition_expr="to_date(ts)",
    sort_cols=("user_id", "ts"),
)


def write_table(
    df: DataFrame,
    layout: TableLayout,
    path: str,
    mode: str = "append",
    extra_columns: dict[str, Column] | None = None,
) -> None:
    """Append ``df`` under ``layout``: materialize the partition column,
    cluster rows into one in-memory partition per date (so each date
    directory gets coherent, sorted files rather than one sliver per
    task), sort within partitions on the primary-key prefix, write
    Parquet."""
    out = df.withColumn(layout.partition_col, layout.partition_column())
    for name, col in (extra_columns or {}).items():
        out = out.withColumn(name, col)
    # the sort must LEAD with the partition column: FileFormatWriter
    # requires child ordering to start with partition cols and would
    # otherwise inject its own sort, destroying the key order
    (
        out.repartition(layout.partition_col)
        .sortWithinPartitions(layout.partition_col, *layout.sort_cols)
        .write.mode(mode)
        .partitionBy(layout.partition_col)
        .parquet(path)
    )


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int = 16,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed catalog table: rows are hash-placed
    into ``n_buckets`` files per partition on ``bucket_cols`` (and
    optionally sorted inside each bucket).

    This is the co-located-join convention: two tables bucketed the same
    way on the join key sort-merge-join with NO exchange on either side —
    the shuffle was paid once at write time. At 100 TB this converts the
    recurring dominant cost of fact-to-fact joins into a one-time layout
    decision (the same trade ClickHouse makes with its sort key).
    Buckets also enable exchange-free aggregation on the bucket key."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton (Z-order) key interleaving the low ``bits`` of two
    non-negative int columns: sorting by it clusters rows so BOTH
    columns have bounded ranges within every file/row-group — Parquet
    min/max skipping then works for predicates on either column, the
    multi-dimensional analogue of the single-prefix sort key (the same
    trick Delta OPTIMIZE ZORDER applies).

    Pure bit arithmetic (shifts/masks/or) — whole-stage codegen, no UDF.
    Columns are clamped into [0, 2^bits) by masking; map real domains
    (timestamps, doubles) onto that range first (e.g. minute-of-day,
    bucketed value)."""
    mask = (1 << bits) - 1
    av = a.cast("long").bitwiseAND(F.lit(mask))
    bv = b.cast("long").bitwiseAND(F.lit(mask))
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(av, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(bv, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: Column,
    col_b: Column,
    bits: int = 16,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_files`` files clustered on the Z-order curve
    of (col_a, col_b): a range-partition + sort on the Morton key, so
    each file covers a compact rectangle of the 2-D key space and scans
    filtered on EITHER column skip most files via row-group stats."""
    keyed = df.withColumn("_z", zorder_key(col_a, col_b, bits))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
