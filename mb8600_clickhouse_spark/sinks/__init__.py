"""Egress sinks: writers that land engine results in EXTERNAL systems
(the reference deployment's ClickHouse table, primarily), complementing
the engine-native ManifestTable landing path."""

from .clickhouse import (  # noqa: F401
    ClickHouseHttpSink,
    DOCSIS_COLUMNS,
    insert_query,
    row_to_tsv,
    tsv_value,
)
