"""Distributed BPE vocabulary induction — tokenizer TRAINING as corpus
aggregation (Sennrich et al. 2016). The missing step between raw text
and every token-count operator in this engine: at 100 TB the merge
table is learned from the corpus itself, and each BPE merge round is
nothing but a weighted adjacent-pair count — a natural Spark
aggregation.

Verification split (the q83/q109 pattern): ROUND ONE operates on
single-character symbols, so its pair counts are exactly
SQL-expressible and differentially verified (q110); multi-round
learning (merged symbols, left-to-right non-overlapping replacement)
is pytest-verified against a pure-Python BPE reference.

Scale shape: the corpus collapses to (word, count) FIRST — pair
counting and merge application run over the distinct-word table (1000x
smaller than the token stream on natural corpora; the classic BPE
implementation trick) with map-side combined sums; each round shuffles
at most |vocab_pairs| rows and collects ONE (pair, count) row to the
driver — driver state is the merge list, never data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import normalize_text, tokens

#: symbol separator inside a word's working representation; U+001F never
#: appears in normalized text
SEP = "\x1f"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n): the distinct-word table all rounds run over."""
    return (
        df.select(F.explode(tokens(normalize_text(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def with_symbols(wc: DataFrame) -> DataFrame:
    """Adds ``syms``: the word as SEP-joined single-character symbols —
    the working representation merges rewrite in place."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.substring(F.col("word"), i, F.lit(1)),
    )
    return wc.withColumn("syms", F.array_join(chars, SEP))


def pair_counts(wsym: DataFrame) -> DataFrame:
    """(s1, s2, cnt): adjacent-symbol pair frequencies weighted by word
    count — every occurrence inside a word counts. One exchange (the
    groupBy), map-side combined."""
    arr = F.split(F.col("syms"), SEP)
    n_pairs = F.size(arr) - 1
    idx = F.when(n_pairs > 0, F.sequence(F.lit(1), n_pairs)).otherwise(
        F.array().cast("array<int>")
    )
    pair = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(arr, i).alias("s1"),
            F.element_at(arr, i + 1).alias("s2"),
        ),
    )
    return (
        wsym.select("n", F.explode(pair).alias("p"))
        .groupBy(F.col("p.s1").alias("s1"), F.col("p.s2").alias("s2"))
        .agg(F.sum("n").alias("cnt"))
    )


def best_pair(pc: DataFrame) -> tuple[str, str, int] | None:
    """Deterministic argmax: highest count, then lexicographic (s1, s2)
    — the tie-break contract the pure-Python reference shares."""
    rows = pc.orderBy(F.desc("cnt"), "s1", "s2").limit(1).collect()
    if not rows:
        return None
    r = rows[0]
    return r["s1"], r["s2"], r["cnt"]


def apply_merge(wsym: DataFrame, s1: str, s2: str) -> DataFrame:
    """Rewrites every word's symbol string, merging adjacent (s1, s2)
    left-to-right non-overlapping (``str.replace`` semantics — the
    standard BPE convention). Pure per-row expression, zero shuffle."""
    return wsym.withColumn(
        "syms", F.replace(F.col("syms"), F.lit(s1 + SEP + s2), F.lit(s1 + s2))
    )


def bpe_learn(df: DataFrame, n_merges: int, text_col: str = "text") -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges. Per round: one pair-count
    aggregation + one 1-row collect; the distinct-word frame is
    persisted (it is re-scanned every round) and replaced, not grown —
    lineage stays one round deep."""
    cur = with_symbols(word_counts(df, text_col)).persist()
    cur.count()
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            best = best_pair(pair_counts(cur))
            if best is None or best[2] < 2:
                break
            s1, s2, _ = best
            merges.append((s1, s2))
            nxt = apply_merge(cur, s1, s2).persist()
            nxt.count()
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    return merges


def bpe_reference(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Pure-Python BPE with the identical conventions (weighted by word
    count, per-occurrence pair counting, count-then-lexicographic
    argmax, str.replace merge application)."""
    wc: dict[str, int] = {}
    for t in texts:
        for w in " ".join(t.lower().split()).split(" "):
            wc[w] = wc.get(w, 0) + 1
    syms = {w: SEP.join(w) for w in wc}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for w, s in syms.items():
            parts = s.split(SEP)
            for a, b in zip(parts, parts[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + wc[w]
        if not pc:
            break
        (s1, s2), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < 2:
            break
        merges.append((s1, s2))
        syms = {w: s.replace(s1 + SEP + s2, s1 + s2) for w, s in syms.items()}
    return merges


def apply_best_merge(wsym: DataFrame) -> DataFrame:
    """Apply round-one's argmax merge with the winning pair as DATA — a
    1-row broadcast crossJoin feeding a dynamic-pattern ``replace`` —
    rather than a driver-collected literal: the whole train+apply round
    stays in one plan (and therefore inside the SQL-oracle's reach,
    q114). Multi-round application goes through ``bpe_learn`` +
    ``apply_merge`` literals instead (one collect per round)."""
    pc = pair_counts(wsym)
    best = pc.orderBy(F.desc("cnt"), "s1", "s2").limit(1).select("s1", "s2")
    return (
        wsym.crossJoin(F.broadcast(best))
        .withColumn(
            "syms",
            F.replace(
                F.col("syms"),
                F.concat(F.col("s1"), F.lit(SEP), F.col("s2")),
                F.concat(F.col("s1"), F.col("s2")),
            ),
        )
        .drop("s1", "s2")
    )


def segment_with_merges(
    wsym: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Apply a learned merge list in order (the tokenizer's APPLY side):
    each merge is one literal ``replace`` — M merges chain into one
    narrow projection, zero shuffles, evaluated left-to-right exactly
    like the reference segmentation."""
    out = wsym
    for s1, s2 in merges:
        out = apply_merge(out, s1, s2)
    return out
