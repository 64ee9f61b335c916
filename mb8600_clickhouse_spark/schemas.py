"""Engine schemas.

DOCSIS_SCHEMA mirrors the reference ClickHouse DDL (reference
``tables.sql:5-30``) with the type mapping from SURVEY.md §1.4:

- ClickHouse ``LowCardinality(String)`` -> plain StringType (dictionary
  encoding is a Parquet storage codec, applied automatically).
- ``UInt8`` -> IntegerType, ``UInt32`` -> LongType (Spark has no unsigned
  ints; widen to the next signed type that covers the range).
- error counters stay *signed* Int64 -> LongType: the modem firmware has
  counter-overflow bugs producing negative values (tables.sql:19).
- ``Array(Nested(...))`` -> ArrayType(StructType(...)); the exporter's
  array-of-single-element-array wire quirk (mb8600.py:378-386) is
  normalized away to a flat array of structs (SURVEY.md §1.5).
- ``DateTime DEFAULT now()`` (second precision) -> TimestampType; values
  are truncated to whole seconds at write time.

Fixture schemas for the driver testdata tables are declared explicitly so
reads never rely on inference (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- docsis fact table (reference tables.sql:5-30) -------------------------

DOWNSTREAM_CHANNEL = T.StructType(
    [
        T.StructField("channel_id", T.IntegerType(), False),   # UInt8, tables.sql:12
        T.StructField("frequency", T.FloatType(), False),      # Hz,    tables.sql:13
        T.StructField("modulation", T.StringType(), False),    #        tables.sql:14
        T.StructField("power", T.FloatType(), False),          # dBmV,  tables.sql:15
        T.StructField("snr", T.FloatType(), False),            # dB,    tables.sql:16
        T.StructField("corrected_errors", T.LongType(), False),    # signed, tables.sql:17-19
        T.StructField("uncorrected_errors", T.LongType(), False),  # signed, tables.sql:18-19
    ]
)

UPSTREAM_CHANNEL = T.StructType(
    [
        T.StructField("channel_id", T.IntegerType(), False),   # tables.sql:22
        T.StructField("frequency", T.FloatType(), False),      # tables.sql:23
        T.StructField("modulation", T.StringType(), False),    # tables.sql:24
        T.StructField("power", T.FloatType(), False),          # tables.sql:25
        T.StructField("width", T.FloatType(), False),          # tables.sql:26
    ]
)

DOCSIS_SCHEMA = T.StructType(
    [
        T.StructField("modem_name", T.StringType(), False),             # tables.sql:6
        T.StructField("modem_config_filename", T.StringType(), True),   # tables.sql:7 (only nullable col)
        T.StructField("modem_uptime", T.LongType(), False),             # tables.sql:8
        T.StructField("modem_version", T.StringType(), False),          # tables.sql:9
        T.StructField("modem_model", T.StringType(), False),            # tables.sql:10
        T.StructField("downstream_channels", T.ArrayType(DOWNSTREAM_CHANNEL, False), False),
        T.StructField("upstream_channels", T.ArrayType(UPSTREAM_CHANNEL, False), False),
        T.StructField("scrape_latency", T.FloatType(), False),          # tables.sql:28
        T.StructField("timestamp", T.TimestampType(), False),           # tables.sql:29
        # raw-input columns so the exporter parse path (mb8600.py:366-438)
        # is testable end-to-end (FIXTURES.md §2):
        T.StructField("downstream_raw", T.StringType(), False),
        T.StructField("upstream_raw", T.StringType(), False),
        T.StructField("uptime_raw", T.StringType(), False),
    ]
)

# --- driver fixture tables (/root/testdata/sf*/..., FIXTURES.md §1) --------

FIXTURE_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

FIXTURE_TABLES = tuple(FIXTURE_SCHEMAS)
