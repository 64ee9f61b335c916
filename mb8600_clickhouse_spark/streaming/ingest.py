"""Streaming ingest: HNAP payload JSON -> parsed docsis rows -> partitioned
Parquet table.

The reference pipeline is scrape -> bounded queue -> row-wise INSERT into
a ClickHouse Buffer table (reference ``mb8600.py:294-311``, ``:313-443``,
``tables.sql:57``). The Spark-native shape (SURVEY.md §1.1, §2.A):

- the poll connector (``sources/hnap.py``) drops one JSON *payload
  record* per scrape into a landing directory — the smallest durable
  handoff; a file-source stream picks them up (checkpointed, replayable,
  so the queue + Buffer table both disappear);
- parsing is the declarative §2.B column-expression path shared with
  batch — one code path, batch/stream parity by construction;
- the sink is ``foreachBatch`` appending to a date-partitioned Parquet
  table sorted within partitions by (modem_name, timestamp) — the
  write-path convention that stands in for ClickHouse's
  ``PARTITION BY toDate(ts) ORDER BY (modem_name, ts)``
  (``tables.sql:30``): partition pruning comes from the directory
  layout, primary-key-prefix scans from Parquet row-group min/max on
  the sorted files.

Delivery: the reference *drops* a batch on sink error (at-most-once,
``mb8600.py:308-311``). Here the checkpointed file source replays unacked
micro-batches (at-least-once), and replayed appends are fenced by an
epoch-id marker column — an improvement documented in SURVEY.md §2.A5,
not a replication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import parse

# One landing record per scrape, as written by the connector:
# the raw HNAP JSON plus connector-side instrumentation (B9-B11).
PAYLOAD_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("modem_name", T.StringType(), False),
        T.StructField("payload", T.StringType(), False),  # HNAP JSON envelope
        T.StructField("scrape_latency", T.DoubleType(), False),
        T.StructField("ts", T.DoubleType(), False),  # epoch seconds, UTC (mb8600.py:366)
    ]
)

# The HNAP envelope fields the parse path consumes (mb8600.py:370-416).
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField(
            "GetMultipleHNAPsResponse",
            T.StructType(
                [
                    T.StructField("GetMultipleHNAPsResult", T.StringType()),
                    T.StructField(
                        "GetMotoStatusStartupSequenceResponse",
                        T.StructType(
                            [T.StructField("MotoConnConfigurationFileComment", T.StringType())]
                        ),
                    ),
                    T.StructField(
                        "GetMotoStatusConnectionInfoResponse",
                        T.StructType([T.StructField("MotoConnSystemUpTime", T.StringType())]),
                    ),
                    T.StructField(
                        "GetMotoStatusDownstreamChannelInfoResponse",
                        T.StructType([T.StructField("MotoConnDownstreamChannel", T.StringType())]),
                    ),
                    T.StructField(
                        "GetMotoStatusUpstreamChannelInfoResponse",
                        T.StructType([T.StructField("MotoConnUpstreamChannel", T.StringType())]),
                    ),
                    T.StructField(
                        "GetMotoStatusSoftwareResponse",
                        T.StructType([T.StructField("StatusSoftwareSfVer", T.StringType())]),
                    ),
                ]
            ),
        )
    ]
)


def parse_payloads(records: DataFrame) -> DataFrame:
    """Payload records -> docsis-schema rows (works on batch AND
    streaming DataFrames — same Catalyst expressions either way).

    Implements the full exporter transform (SURVEY.md §2.A2-A3, §2.B):
    JSON envelope decode, result-status gate, packed-string channel
    parsing, uptime regex, constants, second-precision timestamps.
    """
    env = F.from_json(F.col("payload"), ENVELOPE_SCHEMA)["GetMultipleHNAPsResponse"]
    gated = records.withColumn("env", env).filter(
        F.col("env")["GetMultipleHNAPsResult"] == "OK"  # mb8600.py:354-360
    )
    ds_raw = F.col("env")["GetMotoStatusDownstreamChannelInfoResponse"][
        "MotoConnDownstreamChannel"
    ]
    us_raw = F.col("env")["GetMotoStatusUpstreamChannelInfoResponse"]["MotoConnUpstreamChannel"]
    up_raw = F.col("env")["GetMotoStatusConnectionInfoResponse"]["MotoConnSystemUpTime"]
    return gated.select(
        F.col("modem_name"),
        F.col("env")["GetMotoStatusStartupSequenceResponse"][
            "MotoConnConfigurationFileComment"
        ].alias("modem_config_filename"),
        parse.parse_uptime(up_raw).alias("modem_uptime"),
        F.col("env")["GetMotoStatusSoftwareResponse"]["StatusSoftwareSfVer"].alias(
            "modem_version"
        ),
        F.lit("MB8600").alias("modem_model"),  # mb8600.py:432
        parse.parse_downstream(ds_raw).alias("downstream_channels"),
        parse.parse_upstream(us_raw).alias("upstream_channels"),
        F.col("scrape_latency").cast("float").alias("scrape_latency"),
        # ClickHouse DateTime is second-precision (tables.sql:29)
        F.timestamp_seconds(F.col("ts").cast("long")).alias("timestamp"),
        ds_raw.alias("downstream_raw"),
        us_raw.alias("upstream_raw"),
        up_raw.alias("uptime_raw"),
    )


def read_payload_stream(spark: SparkSession, landing_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """Checkpoint-friendly file-source stream over the landing dir
    (JSON lines, one payload record per line)."""
    reader = spark.readStream.schema(PAYLOAD_RECORD_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(landing_dir)


def dedup_scrapes(parsed: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Drop duplicate scrapes on the table's primary key
    (modem_name, timestamp) — the retry-duplicate guard the reference's
    at-least-once HTTP path implies (a re-polled or re-landed payload is
    the same second-precision scrape; MergeTree would happily store both,
    tables.sql:30 orders but does not dedupe).

    Streaming inputs use ``dropDuplicatesWithinWatermark``: state is
    BOUNDED — a key is remembered only until the watermark passes it,
    so state size tracks (modems × watermark/scrape-interval), not
    stream history. Batch inputs take the plain exact dedup. Works in
    the parsed chain before any sink:
    ``parse_payloads(...) |> dedup_scrapes |> write_docsis_stream*``."""
    if not parsed.isStreaming:
        return parsed.dropDuplicates(["modem_name", "timestamp"])
    return parsed.withWatermark("timestamp", watermark).dropDuplicatesWithinWatermark(
        ["modem_name", "timestamp"]
    )


def append_docsis(df: DataFrame, table_path: str, epoch_id: int | None = None) -> None:
    """Append under the docsis table layout (plans.DOCSIS_LAYOUT — the
    PARTITION BY/ORDER BY convention from reference tables.sql:30).

    ``epoch_id`` (from foreachBatch) is stamped on every row: replays of
    the same micro-batch write the same marker, so downstream exact-once
    consumers can fence duplicates (batch writes stamp -1)."""
    from ..plans import DOCSIS_LAYOUT, write_table

    write_table(
        df,
        DOCSIS_LAYOUT,
        table_path,
        extra_columns={
            "_epoch_id": F.lit(-1 if epoch_id is None else epoch_id).cast("long")
        },
    )


def write_docsis_stream(
    parsed: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    processing_time: str | None = None,
    available_now: bool = False,
):
    """Start the micro-batched append (the Spark stand-in for the
    Buffer-engine flush cadence, tables.sql:57 -> trigger interval)."""
    writer = parsed.writeStream.foreachBatch(
        lambda batch_df, epoch_id: append_docsis(batch_df, table_path, epoch_id)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def manifest_epoch_sink(table_path: str):
    """foreachBatch sink with EXACTLY-ONCE semantics on a
    ``plans.ManifestTable``: each micro-batch commits atomically with its
    epoch id recorded in the manifest; a replayed epoch (checkpoint
    recovery re-delivers the last unacked batch) finds itself in the
    committed-epoch ledger and is a no-op. This removes the read-side
    fencing the plain-parquet path needs (``read_docsis``) — the sink
    itself is idempotent, the transactional upgrade over the reference's
    drop-on-error INSERT (mb8600.py:308-311).

    Replays of one streaming query are sequential (the engine never runs
    the same epoch concurrently), so check-then-commit is race-free per
    query; concurrent DIFFERENT epochs serialize through the manifest
    version CAS."""
    from ..plans import ManifestTable

    table = ManifestTable(table_path)

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id in table.committed_epochs():
            return
        table.append(batch_df, extra={"epoch": epoch_id})

    return _sink


def write_docsis_stream_manifest(
    parsed: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    processing_time: str | None = None,
    available_now: bool = False,
):
    """Start the micro-batched EXACTLY-ONCE append into a ManifestTable
    (the transactional sibling of ``write_docsis_stream``)."""
    writer = parsed.writeStream.foreachBatch(
        manifest_epoch_sink(table_path)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def read_docsis(spark: SparkSession, table_path: str) -> DataFrame:
    """Read the ingest-written docsis table with replay fencing: a
    foreachBatch replay appends the same rows with the same _epoch_id,
    so exactly-once reads collapse duplicates on (natural key,
    _epoch_id). Keeps the engine's at-least-once write + idempotent
    read contract (the upgrade over the reference's drop-on-error sink,
    mb8600.py:308-311)."""
    raw = spark.read.parquet(table_path)
    return raw.dropDuplicates(
        ["modem_name", "timestamp", "_epoch_id"]
    ).drop("_epoch_id")


def compact_docsis(spark: SparkSession, table_path: str) -> int:
    """Compact a streaming-written docsis table in place: micro-batch
    appends leave one small file per (batch x date); this rewrites the
    table through the same layout policy (one sorted file per date via
    the layout's repartition), restoring scan efficiency — the Spark
    stand-in for OPTIMIZE / ClickHouse background merges. Returns the
    number of files after compaction.

    Semantics: replayed duplicate appends are collapsed on
    (modem_name, timestamp, _epoch_id) — the same fencing rule
    ``read_docsis`` applies — but the ORIGINAL ``_epoch_id`` survives
    compaction, so two distinct same-second scrapes from different
    micro-batches remain distinct rows (a -2 re-stamp would silently
    merge them).

    Durability: crash-safe swap ordering — write the compacted copy to
    a sibling dir, rename the live table ASIDE, rename the copy in,
    then delete the old data. A crash at any point leaves at least one
    complete copy on disk; ``recover_docsis`` rolls an interrupted swap
    forward/back. (A transactional format's metadata swap is the real
    fix at deployment scale — see plans/manifest.py for the engine's
    manifest-commit table format.)"""
    import shutil
    from pathlib import Path

    from ..plans import DOCSIS_LAYOUT

    src = Path(table_path)
    tmp = src.with_name(src.name + "._compacting")
    old = src.with_name(src.name + "._precompact")
    for leftover in (tmp, old):
        if leftover.exists():
            shutil.rmtree(leftover)
    deduped = spark.read.parquet(table_path).dropDuplicates(
        ["modem_name", "timestamp", "_epoch_id"]
    )
    (
        deduped.withColumn("date", F.to_date("timestamp"))
        .repartition("date")
        .sortWithinPartitions("date", *DOCSIS_LAYOUT.sort_cols)
        .write.mode("overwrite")
        .partitionBy("date")
        .parquet(str(tmp))
    )
    src.rename(old)  # live table aside (recoverable from here on)
    tmp.rename(src)  # compacted copy in
    shutil.rmtree(old)
    return len(list(src.glob("date=*/*.parquet")))


def recover_docsis(table_path: str) -> str:
    """Roll an interrupted ``compact_docsis`` swap to a consistent state.
    Returns what happened: 'clean' (nothing to do), 'rolled_forward'
    (compacted copy was complete -> becomes the table), or
    'rolled_back' (pre-compaction copy restored)."""
    import shutil
    from pathlib import Path

    src = Path(table_path)
    tmp = src.with_name(src.name + "._compacting")
    old = src.with_name(src.name + "._precompact")
    if src.exists():
        # live table intact; drop any half-finished sibling state
        for leftover in (tmp, old):
            if leftover.exists():
                shutil.rmtree(leftover)
        return "clean"
    # crashed between the two renames: old aside, table missing
    if tmp.exists() and (tmp / "_SUCCESS").exists():
        tmp.rename(src)
        if old.exists():
            shutil.rmtree(old)
        return "rolled_forward"
    if old.exists():
        old.rename(src)
        if tmp.exists():
            shutil.rmtree(tmp)
        return "rolled_back"
    raise FileNotFoundError(f"no recoverable state at {table_path}")
