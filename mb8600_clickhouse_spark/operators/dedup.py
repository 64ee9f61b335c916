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
    """Distinct word n-gram shingles of normalized text."""
    toks = F.split(normalize_text(text), " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(n)]
    )
    return F.array_distinct(F.transform(idx, gram))


def minhash_signature(shingles: Column, k: int = 12) -> Column:
    """k-element MinHash signature: element i = min over shingles of
    md5(shingle || ':' || i) (string-min family, portable)."""
    return F.array(
        *[
            F.array_min(
                F.transform(shingles, lambda s: F.md5(F.concat(s, F.lit(f":{i}"))))
            )
            for i in range(k)
        ]
    )


def lsh_band_keys(sig: Column, bands: int = 4, rows: int = 3) -> Column:
    """Bucket keys: band b hashes sig[b*rows : (b+1)*rows] together.
    Docs sharing any band key are near-dup candidates."""
    keys = []
    for b in range(bands):
        parts = [F.element_at(sig, b * rows + r + 1) for r in range(rows)]
        keys.append(F.md5(F.concat_ws(",", *parts)))
    return F.array(*keys)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    k: int = 12,
    bands: int = 4,
) -> DataFrame:
    """Near-dup candidate pairs via MinHash LSH: per-row signatures ->
    explode band keys -> self-join within (band, key) buckets.
    Output: (id_a, id_b) with id_a < id_b, distinct."""
    rows = k // bands
    sigs = df.select(
        F.col(id_col).alias("id"),
        lsh_band_keys(
            minhash_signature(word_shingles(F.col(text_col), shingle_n), k),
            bands,
            rows,
        ).alias("band_keys"),
    )
    buckets = sigs.select(
        "id", F.posexplode("band_keys").alias("band", "key")
    )
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


def simhash64(text: Column, shingle_n: int = 2) -> Column:
    """64-bit SimHash over word shingles.

    Per shingle, a 64-bit hash (xxhash64 — JVM built-in); the fingerprint
    bit b is 1 iff more shingle-hashes have bit b set than unset. Returns
    a LongType fingerprint. Engine-internal sketch (not oracle-portable:
    xxhash64 seeds differ across engines) — verified by property tests."""
    shingles = word_shingles(text, shingle_n)
    hashes = F.transform(shingles, lambda s: F.xxhash64(s))
    bit_votes = [
        F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1),
        )
        for b in range(63)  # bit 63 (sign) excluded: keeps result non-negative
    ]
    out = F.lit(0).cast("long")
    for b, vote in enumerate(bit_votes):
        out = out + F.when(vote > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))
