"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale notes (the 100 TB design):

- exact dedup is a single hash-shuffle on the 16-byte fingerprint (not the
  full text), with map-side partial aggregation;
- MinHash+LSH is the linear-time near-dup path: signatures are computed
  per-row (no shuffle), then only (band_id, band_hash) buckets shuffle —
  candidate pairs are generated per bucket instead of O(n^2);
- exact n-gram Jaccard is the verification step applied to the candidate
  set (or, below a size threshold, run directly via a shingle equi-join);
- SimHash gives a 64-bit per-doc sketch whose Hamming distance bounds
  cosine distance of the token multiset — cheap blocking key.

MinHash portability: hash values are md5 hex strings (seeded by suffixing
``:i``), and a signature element is the lexicographic MIN — a valid
min-wise family that both Spark and the DuckDB oracle compute identically
with no integer-hash portability issues.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .text import normalize_text, fingerprint


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on content fingerprint, keeping the lowest id per group
    (deterministic, unlike dropDuplicates' arbitrary-row keep).
    Returns (fp, keeper id, n_copies)."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keeper"), F.count("*").alias("n_copies"))
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of normalized text. Texts with
    fewer than ``n`` words yield an empty array (guarded explicitly:
    ``sequence(1, 0)`` would count DOWN and index out of bounds)."""
    toks = F.split(normalize_text(text), " ")
    n_grams = F.size(toks) - (n - 1)
    idx = F.when(n_grams > 0, F.sequence(F.lit(1), n_grams)).otherwise(
        F.array().cast("array<int>")
    )
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(n)]
    )
    return F.array_distinct(F.transform(idx, gram))


def minhash_band_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    k: int = 12,
    bands: int = 4,
) -> DataFrame:
    """(id, band, key) LSH bucket assignments from a k-element MinHash
    signature split into ``bands`` bands.

    Formulated as explode -> aggregate rather than one per-row expression
    tree: (a) Catalyst codegen stays small regardless of k, and (b) the
    heavy step — md5 per (shingle, seed) — runs as a flat projection over
    exploded rows that partitions evenly at any scale, followed by a
    partial-aggregating min. Signature element i = MIN(md5(shingle':'i))
    — a portable string-min family the DuckDB oracle reproduces."""
    rows = k // bands
    shingles = (
        df.select(
            F.col(id_col).alias("id"),
            word_shingles(F.col(text_col), shingle_n).alias("sh"),
        )
        .filter(F.size("sh") > 0)
        # fan the hash work out: source tables are few-partition parquet,
        # but explode×k multiplies rows ~100x — rebalance BEFORE the
        # md5-heavy projection so all cores participate
        .repartition("id")
    )
    hashed = shingles.select(
        "id", F.explode("sh").alias("s")
    ).select(
        "id",
        F.posexplode(
            F.array(*[F.md5(F.concat(F.col("s"), F.lit(f":{i}"))) for i in range(k)])
        ).alias("i", "h"),
    )
    sig = hashed.groupBy("id", "i").agg(F.min("h").alias("mh"))
    return (
        sig.groupBy("id", (F.col("i") / rows).cast("int").alias("band"))
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("i", "mh"))),
                        lambda x: x["mh"],
                    ),
                    ",",
                )
            ).alias("key")
        )
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    k: int = 12,
    bands: int = 4,
) -> DataFrame:
    """Near-dup candidate pairs via MinHash LSH: band buckets ->
    self-join within (band, key). Only bucket keys shuffle — never text.
    Output: (id_a, id_b) with id_a < id_b, distinct."""
    buckets = minhash_band_buckets(df, id_col, text_col, shingle_n, k, bands)
    left = buckets.alias("a")
    right = buckets.alias("b")
    return (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join: explode distinct shingles,
    equi-join on shingle, |intersection| per pair, Jaccard via
    inclusion-exclusion. The exact (verification) path; at scale run it
    only on LSH candidates."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("shingle"),
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_shingles"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "n_shingles": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_shingles": "n_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 2,
) -> DataFrame:
    """(id, simhash) 63-bit SimHash fingerprints over word shingles.

    Per shingle, a 64-bit hash (xxhash64 — JVM built-in); fingerprint bit
    b is 1 iff more shingle-hashes have bit b set than unset. Formulated
    as explode -> one hash-aggregate with 63 sum columns (partial
    aggregation map-side, tiny shuffle) instead of 63 per-row array folds
    — same result, linear scaling, small codegen. Bit 63 (sign) is
    excluded so the fingerprint stays non-negative. Engine-internal
    sketch (xxhash64 isn't oracle-portable); verified by property tests."""
    hashed = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(word_shingles(F.col(text_col), shingle_n)).alias("s"),
        )
        .repartition("id")  # parallelize beyond the source's few partitions
        .select("id", F.xxhash64("s").alias("h"))
    )
    votes = hashed.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(63)
        ]
    )
    fp = None
    for b in range(63):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fp = bit if fp is None else fp + bit
    return votes.select("id", fp.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))
