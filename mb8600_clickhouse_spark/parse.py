"""The exporter parse path (reference ``mb8600.py:366-438``) as pure
Catalyst column expressions.

Every operator the reference implements row-at-a-time in Python is
re-expressed as a vectorized, codegen-friendly Spark SQL expression
(SURVEY.md §2.B). No UDFs anywhere: higher-order array functions
(``transform``) build the nested channel structs directly from the packed
wire strings, so the whole parse stays inside WholeStageCodegen and scales
linearly on a cluster.

Wire format (reference ``mb8600.py:370-371``, ``:390-391``):

- records joined by ``|+|``
- downstream record: 10 ``^``-separated fields,
  ``_^_^modulation^channel_id^frequency_MHz^power^snr^correcteds^uncorrecteds^_``
- upstream record: 8 fields, ``_^_^modulation^channel_id^width^frequency_MHz^power^_``

Numeric parity note: the reference parses with Python ``float`` (binary64)
then stores ClickHouse Float32. We mirror exactly: cast string -> double,
do the arithmetic in double, then cast -> float.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference mb8600.py:21. Optional groups; the reference crashes on missing
# groups via int(None) (mb8600.py:404-410) — we coalesce to 0 instead.
UPTIME_PATTERN = r"(?:(\d+)\s*days\s*)?(?:(\d{2})h:)?(?:(\d{2})m:)?(?:(\d{2})s)?"

RECORD_SEP = r"\|\+\|"  # literal |+| (mb8600.py:370)
FIELD_SEP = r"\^"       # literal ^   (mb8600.py:371)


def correct_ofdm_snr(modulation: Column, snr: Column) -> Column:
    """OFDM PLC firmware SNR bug correction (reference mb8600.py:372-376):
    if modulation == 'OFDM PLC' and snr < 20.0, scale by 2.5."""
    return F.when((modulation == "OFDM PLC") & (snr < 20.0), snr * 2.5).otherwise(snr)


# try_element_at / try_cast throughout: truncated or malformed wire
# records degrade to NULL fields under ANY session ANSI setting — the
# engine never inherits the reference's whole-scrape-discard behavior
# (mb8600.py:439-441).
def _downstream_struct(f: Column) -> Column:
    modulation = F.try_element_at(f, F.lit(3))
    snr_raw = F.try_element_at(f, F.lit(7)).try_cast("double")
    return F.struct(
        F.try_element_at(f, F.lit(4)).try_cast("int").alias("channel_id"),
        (F.try_element_at(f, F.lit(5)).try_cast("double") * F.lit(1000000.0)).cast("float").alias("frequency"),
        modulation.alias("modulation"),
        F.try_element_at(f, F.lit(6)).try_cast("double").cast("float").alias("power"),
        correct_ofdm_snr(modulation, snr_raw).cast("float").alias("snr"),
        F.try_element_at(f, F.lit(8)).try_cast("long").alias("corrected_errors"),
        F.try_element_at(f, F.lit(9)).try_cast("long").alias("uncorrected_errors"),
    )


def _upstream_struct(f: Column) -> Column:
    return F.struct(
        F.try_element_at(f, F.lit(4)).try_cast("int").alias("channel_id"),
        (F.try_element_at(f, F.lit(6)).try_cast("double") * F.lit(1000000.0)).cast("float").alias("frequency"),
        F.try_element_at(f, F.lit(3)).alias("modulation"),
        F.try_element_at(f, F.lit(7)).try_cast("double").cast("float").alias("power"),
        (F.try_element_at(f, F.lit(5)).try_cast("double") * F.lit(1000.0)).cast("float").alias("width"),
    )


def _fields(raw: Column) -> Column:
    """Two-pass record split: records, then fields-per-record, as a
    SEPARATE transform so each record is ^-split exactly once. (A naive
    single lambda that calls split(rec) per struct field would be inlined
    by Catalyst into one split per field reference — 7x the work.)"""
    return F.transform(F.split(raw, RECORD_SEP), lambda rec: F.split(rec, FIELD_SEP))


def parse_downstream(raw: Column) -> Column:
    """Packed downstream string -> array<struct> (mb8600.py:369-386),
    including MHz->Hz conversion and the OFDM SNR correction."""
    return F.transform(_fields(raw), _downstream_struct)


def parse_upstream(raw: Column) -> Column:
    """Packed upstream string -> array<struct> (mb8600.py:389-398),
    including MHz->Hz and kHz->Hz width conversion."""
    return F.transform(_fields(raw), _upstream_struct)


def parse_uptime(raw: Column) -> Column:
    """Uptime string -> seconds (mb8600.py:400-410) with coalesce-0 for
    missing groups (fixing the reference's int(None) crash)."""
    def grp(i: int) -> Column:
        return F.coalesce(F.regexp_extract(raw, UPTIME_PATTERN, i).try_cast("long"), F.lit(0))

    return (
        grp(1) * 86400 + grp(2) * 3600 + grp(3) * 60 + grp(4)
    ).alias("uptime_seconds")
