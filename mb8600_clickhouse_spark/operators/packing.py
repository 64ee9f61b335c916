"""Sequence packing — capacity-constrained grouping of documents into
training batches (the sample-packing step of an LLM data pipeline: fill
each max_seq_len window with as many whole documents as fit).

Greedy sequential packing is inherently stateful (each decision depends
on the running total), which SQL windows cannot express — this is the
documented ``applyInPandas`` escape hatch (SURVEY §7.0): groups are
small and independent, the loop is a per-group numpy/pandas pass, and
Arrow moves only (id, size) pairs, never text.

Scale posture: parallelism = number of groups * ``n_shards``. Packing
a 100 TB corpus under a handful of languages would bottleneck on the
biggest group, so ``n_shards`` salts the group key with a deterministic
shard (pack within (lang, shard)) — packing quality per pack is
unaffected because packs never straddle shards by design (each shard
runs the same greedy rule over its own rows; only the partition of
documents into packs changes, never a pack's budget invariant). The
deterministic contract (fixed order, greedy rule, hash-derived shard)
makes the operator exactly oracle-checkable against a recursive CTE."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    size_col: str,
    budget: int,
    n_shards: int | None = None,
) -> DataFrame:
    """Assign each row a ``pack_id`` (0-based per group) by greedy
    sequential packing in ``order_col`` order: a row joins the current
    pack unless that would push the pack's ``size_col`` total past
    ``budget``, in which case it starts the next pack. A single row
    larger than ``budget`` gets a pack of its own (never dropped —
    oversize handling belongs to an upstream filter).

    ``n_shards`` splits each group into that many deterministic shards
    (``xxhash64(order_col) % n_shards``) packed independently and
    concurrently — the 100 TB lever when groups are few and huge. Pack
    ids stay unique within the group via ``pid * n_shards + shard``
    (disjoint residues per shard), and every pack still satisfies the
    budget invariant; only the assignment of documents to packs differs
    from the unsharded run. Default ``None`` keeps the exact
    single-sequence contract the recursive-CTE oracle checks."""

    stride = n_shards if n_shards is not None else 1

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
        shard = int(pdf["_shard"].iloc[0]) if "_shard" in pdf.columns else 0
        pdf["pack_id"] = [p * stride + shard for p in pack_ids]
        if "_shard" in pdf.columns:
            pdf = pdf.drop(columns=["_shard"])
        return pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    keys = [F.col(c) for c in group_cols]
    if n_shards is not None:
        df = df.withColumn(
            "_shard", F.pmod(F.xxhash64(F.col(order_col)), F.lit(n_shards))
        )
        keys = keys + [F.col("_shard")]
    return df.groupBy(*keys).applyInPandas(_pack, schema + ", pack_id bigint")


def balanced_shards(
    df,
    n_shards: int,
    size_col: str,
    group_cols: list[str],
    id_col: str = "doc_id",
):
    """Deterministic BALANCED shard assignment for training output:
    within each group, items rank by descending size (ties by id) and
    take ``rank % n_shards`` — sorted round-robin, the SQL-able cousin
    of LPT bin packing (big items spread first; per-shard totals land
    within ~largest-item of each other, which for corpus shards is
    sub-percent). Returns the input plus ``shard``.

    Scale: the rank window partitions by ``group_cols`` (language,
    source, ...) — NO global sort; each group sorts independently and
    groups are the natural parallel unit of corpus writes. A single
    global row_number would serialize 100 TB through one task — that
    shape is deliberately not offered."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = W.partitionBy(*group_cols).orderBy(F.desc(size_col), id_col)
    return df.withColumn(
        "shard", (F.row_number().over(w) - 1) % n_shards
    )
