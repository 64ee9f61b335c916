"""mb8600_clickhouse_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference exporter+ClickHouse stack (``hueNET-llc/mb8600-clickhouse``,
snapshot at /root/reference), re-expressed Spark-first:

- the DOCSIS telemetry data model (reference ``tables.sql:5-30``) as an
  explicit Spark ``StructType`` over Parquet (``schemas.py``),
- the exporter's parse/transform path (reference ``mb8600.py:366-438``) as
  pure Catalyst column expressions (``parse.py``),
- the OLAP query surface the ClickHouse DDL is designed for (partition
  pruning, nested-array analytics, time bucketing, window functions) as
  DataFrame/SQL queries (``queries/``),
- the HNAP poll->queue->insert pipeline as Structured Streaming
  (``sources/``, ``streaming/``),
- plus large-scale training-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal columns) in ``operators/``.

Everything is built on public Apache Spark APIs only.
"""

__version__ = "0.1.0"
