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

#: symbol separator inside a word's working representation. U+001F is a C0
#: control char that normalize_text does NOT remove (it only collapses regex
#: whitespace), so a raw crawl document could carry it and inject fake symbol
#: boundaries — word_counts therefore strips ALL C0 controls from words before
#: any symbol work, making the separator genuinely unreachable.
SEP = "\x1f"

#: C0 control range stripped from words (see SEP note). \x00-\x08 \x0e-\x1f
#: plus \x0b\x0c\x7f; \t\n\r are already regex whitespace and collapsed away.
_C0_RE = "[\\x00-\\x1f\\x7f]"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n): the distinct-word table all rounds run over. C0 control
    characters are stripped from words so SEP (U+001F) can never occur
    inside a symbol sequence (a word of only controls becomes '', which
    with_symbols already guards)."""
    return (
        df.select(F.explode(tokens(normalize_text(F.col(text_col)))).alias("raw"))
        .select(F.regexp_replace("raw", _C0_RE, "").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def with_symbols(wc: DataFrame) -> DataFrame:
    """Adds ``syms``: the word as SEP-joined single-character symbols —
    the working representation merges rewrite in place. Guarded for the
    empty word (a whitespace-only document's split yields ''):
    sequence(1, 0) counts DOWN and would fabricate two phantom empty
    symbols ('\x1f') that the oracles and the reference never see."""
    chars = F.when(
        F.length("word") > 0,
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.substring(F.col("word"), i, F.lit(1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return wc.withColumn("syms", F.array_join(chars, SEP))


def pair_counts(wsym: DataFrame) -> DataFrame:
    """(s1, s2, cnt): adjacent-symbol pair frequencies weighted by word
    count — every occurrence inside a word counts. One exchange (the
    groupBy), map-side combined."""
    # index-explode + flat element projection (exploding a transform()
    # array re-evaluates it per output element — the shingle_rows lesson,
    # O(L^2) per word otherwise, and this runs once per merge round)
    arrd = wsym.withColumn("_arr", F.split(F.col("syms"), SEP))
    n_pairs = F.size("_arr") - 1
    idx = arrd.select(
        "n",
        "_arr",
        F.explode(
            F.when(n_pairs > 0, F.sequence(F.lit(1), n_pairs)).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("i"),
    )
    return (
        idx.select(
            "n",
            F.element_at("_arr", F.col("i")).alias("s1"),
            F.element_at("_arr", F.col("i") + 1).alias("s2"),
        )
        .groupBy("s1", "s2")
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


def _merge_pattern(s1: str, s2: str) -> str:
    r"""Symbol-boundary-anchored regex for merging adjacent (s1, s2):
    a bare string replace of ``s1+SEP+s2`` would also fire when s1 is a
    SUFFIX of the preceding multi-char symbol (or s2 a prefix of the
    next) — e.g. after (b,c), word 'abc' is 'a\x1fbc' and a later
    (a,b) merge must NOT match across the boundary. The left anchor is
    start-of-string or a fixed-width lookbehind on SEP; the right
    anchor is a LOOKAHEAD (zero-width — consuming the trailing SEP
    would break adjacent repeats: a,b,a,b must become ab,ab). This is
    exactly Sennrich et al.'s (?<!\S)pair(?!\S) anchoring transposed
    to the SEP alphabet; Java and Python regex agree on it."""
    import re as _re

    q1, q2 = _re.escape(s1), _re.escape(s2)
    return f"(?:^|(?<={SEP})){q1}{SEP}{q2}(?=$|{SEP})"


def apply_merge(wsym: DataFrame, s1: str, s2: str) -> DataFrame:
    """Rewrites every word's symbol string, merging adjacent (s1, s2)
    left-to-right non-overlapping at SYMBOL boundaries (see
    ``_merge_pattern``). Pure per-row expression, zero shuffle."""
    return wsym.withColumn(
        "syms",
        F.regexp_replace(F.col("syms"), F.lit(_merge_pattern(s1, s2)), F.lit(s1 + s2)),
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
        import re as _re

        pat = _re.compile(_merge_pattern(s1, s2))
        syms = {w: pat.sub(s1 + s2, s) for w, s in syms.items()}
    return merges


def apply_best_merge(wsym: DataFrame) -> DataFrame:
    """Apply round-one's argmax merge with the winning pair as DATA — a
    1-row broadcast crossJoin feeding a dynamic-pattern ``replace`` —
    rather than a driver-collected literal: the whole train+apply round
    stays in one plan (and therefore inside the SQL-oracle's reach,
    q114). The UN-anchored literal replace is exact HERE and only here:
    round one's symbols are all single characters, so any occurrence of
    ``s1+SEP+s2`` necessarily sits on symbol boundaries — multi-round
    application (merged multi-char symbols) must use the anchored
    ``apply_merge`` instead."""
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
