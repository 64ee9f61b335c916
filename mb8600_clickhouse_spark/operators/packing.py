"""Sequence packing — capacity-constrained grouping of documents into
training batches (the sample-packing step of an LLM data pipeline: fill
each max_seq_len window with as many whole documents as fit).

Greedy sequential packing is inherently stateful (each decision depends
on the running total), which SQL windows cannot express — this is the
documented ``applyInPandas`` escape hatch (SURVEY §7.0): groups are
small and independent, the loop is a per-group numpy/pandas pass, and
Arrow moves only (id, size) pairs, never text.

Scale posture: parallelism = number of groups. Packing a 100 TB corpus
under a handful of languages would bottleneck on the biggest group, so
real deployments salt the group key with a shard (pack within
(lang, shard)) — packing quality is unaffected because packs never
straddle shards by design. The deterministic contract (fixed order,
greedy rule) makes the operator exactly oracle-checkable against a
recursive CTE."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    size_col: str,
    budget: int,
) -> DataFrame:
    """Assign each row a ``pack_id`` (0-based per group) by greedy
    sequential packing in ``order_col`` order: a row joins the current
    pack unless that would push the pack's ``size_col`` total past
    ``budget``, in which case it starts the next pack. A single row
    larger than ``budget`` gets a pack of its own (never dropped —
    oversize handling belongs to an upstream filter)."""

    def _pack(pdf):
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        pack_ids = []
        acc = 0
        pid = 0
        for n in pdf[size_col]:
            n = int(n)
            if pack_ids and acc + n > budget:
                pid += 1
                acc = n
            else:
                acc += n
            pack_ids.append(pid)
        pdf["pack_id"] = pack_ids
        return pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.groupBy(*[F.col(c) for c in group_cols]).applyInPandas(
        _pack, schema + ", pack_id bigint"
    )
