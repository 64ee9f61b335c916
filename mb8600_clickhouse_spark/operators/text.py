"""Text-analysis operators for large-scale corpus pipelines.

All pure Catalyst column expressions — no UDFs, so every op runs inside
WholeStageCodegen and parallelizes embarrassingly (per-row, zero shuffle).
At 100 TB these are scan-bound: with column pruning only the ``text``
column is read.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic
# language identifier. Deliberately small + ASCII so the same literals are
# embeddable in the DuckDB oracle SQL.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "for", "on"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "de": ("der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "du", "est"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1", "zhe4", "bu4"),
}

# BPE-ish pre-tokenizer: letter runs, digit runs, or single punctuation
# clusters (the GPT-2-style pre-split shape, expressed portably for both
# Java regex and RE2).
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed text."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokens (letter/digit/punct runs)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), F.lit(0)))


def punct_ratio(text: Column) -> Column:
    """Punctuation characters / total characters (double)."""
    n_punct = F.length(text) - F.length(
        F.regexp_replace(text, r"[^A-Za-z0-9\s]", "")
    )
    return n_punct.cast("double") / F.length(text).cast("double")


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits.cast("double") / F.size(toks).cast("double")


def mean_token_len(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.size(toks).cast("double")


def quality_score(text: Column) -> Column:
    """Heuristic document-quality score in [0, 1]: rewards mid-length
    docs with low punctuation noise and sane mean word length (the usual
    pretraining-corpus filter features).

    Inline convenience form — re-splits the text per reference; use
    ``with_quality_score`` in pipelines (identical arithmetic, staged
    so tokenizer/regex run once per row)."""
    len_score = F.least(F.length(text).cast("double") / F.lit(500.0), F.lit(1.0))
    punct_penalty = F.least(punct_ratio(text) * 4.0, F.lit(1.0))
    wl = mean_token_len(text)
    wordlen_score = F.when((wl >= 3.0) & (wl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return (len_score * 0.4 + (1.0 - punct_penalty) * 0.3 + wordlen_score * 0.3)


def with_quality_score(df, text_col: str = "text", out_col: str = "quality"):
    """Staged quality score: token array, punctuation-stripped text, and
    mean word length each materialize ONCE per row (the inline
    ``quality_score`` re-evaluates the split per reference and the fold
    per comparison). Arithmetic and operation order are identical, so
    results are bit-equal to the inline form and the oracle."""
    t = F.col(text_col)
    staged = df.withColumns(
        {
            "_q_toks": tokens(t),
            "_q_stripped": F.regexp_replace(t, r"[^A-Za-z0-9\s]", ""),
        }
    ).withColumns(
        {
            "_q_wl": (
                F.aggregate(F.col("_q_toks"), F.lit(0), lambda acc, tk: acc + F.length(tk))
            ).cast("double")
            / F.size(F.col("_q_toks")).cast("double"),
        }
    )
    len_score = F.least(F.length(t).cast("double") / F.lit(500.0), F.lit(1.0))
    n_punct = F.length(t) - F.length(F.col("_q_stripped"))
    punct_penalty = F.least(
        n_punct.cast("double") / F.length(t).cast("double") * 4.0, F.lit(1.0)
    )
    wl = F.col("_q_wl")
    wordlen_score = F.when((wl >= 3.0) & (wl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    score = len_score * 0.4 + (1.0 - punct_penalty) * 0.3 + wordlen_score * 0.3
    return staged.withColumn(out_col, score).drop("_q_toks", "_q_stripped", "_q_wl")


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-overlap scores (distinct-token based).

    NOTE: inline form — ``text``'s token expression is copied into every
    language's intersect. Fine for one-off use; pipelines should use
    ``with_lang_id``, which stages the token array as a materialized
    column (computed once per row)."""
    toks = F.array_distinct(tokens(F.lower(text)))
    out = {}
    for lang, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.array_intersect(toks, sw))
    return out


def lang_id(text: Column) -> Column:
    """Argmax language by stopword overlap; 'und' when no stopwords hit.
    Deterministic tiebreak: language code ascending.

    Column-expression convenience form for SMALL inputs only: the nested
    when-chain copies each score subtree ~3x per level (and each score
    re-inlines the tokenizer), an exponential expression blowup —
    measured 8x slower than ``with_lang_id``'s staged form, which is the
    pipeline spelling."""
    scores = lang_scores(text)
    best = None
    for lang in sorted(scores):  # ascending code order => first max wins
        s = scores[lang]
        if best is None:
            best = F.struct(s.alias("score"), F.lit(lang).alias("lang"))
        else:
            best = F.when(s > best["score"], F.struct(s.alias("score"), F.lit(lang).alias("lang"))).otherwise(best)
    return F.when(best["score"] <= 0, F.lit("und")).otherwise(best["lang"])


def with_lang_id(df, text_col: str = "text", out_col: str = "lang"):
    """DataFrame-staged language ID: tokenize ONCE into a materialized
    column, project the 5 per-language scores as plain columns (cheap
    attribute refs thereafter), then argmax over those attributes.
    CollapseProject keeps multi-referenced non-trivial aliases
    materialized, so nothing is re-evaluated — the linear-size plan the
    inline ``lang_id`` expression can't give (it blows up ~3^langs).
    Same result, same ascending-code tiebreak."""
    langs = sorted(STOPWORDS)
    staged = df.withColumn(
        "_lid_toks", F.array_distinct(tokens(F.lower(F.col(text_col))))
    ).withColumns(
        {
            f"_lid_{lang}": F.size(
                F.array_intersect(
                    "_lid_toks", F.array(*[F.lit(w) for w in STOPWORDS[lang]])
                )
            )
            for lang in langs
        }
    )
    best = F.greatest(*[F.col(f"_lid_{lang}") for lang in langs])
    pick = F.when(best <= 0, F.lit("und"))
    for lang in langs:  # ascending code order => first max wins
        pick = pick.when(F.col(f"_lid_{lang}") == best, F.lit(lang))
    return staged.withColumn(out_col, pick).drop(
        "_lid_toks", *[f"_lid_{lang}" for lang in langs]
    )


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def norm_tokens(text: Column) -> Column:
    """``tokens(normalize_text(text))`` fused to one regex pass:
    ``split(trim(lower(x)), '\\s+')`` — any maximal whitespace run is
    one separator in both spellings and trim handles the edges, so the
    token arrays are IDENTICAL (asserted corpus-wide in
    tests/test_text.py); the collapse-then-split form pays a full
    regexp_replace materialization of the normalized string first
    (measured 0.21 vs 0.13 s warm over the sf0.1 corpus). Use this in
    token hot paths; keep ``normalize_text`` where the normalized
    STRING itself is the output (fingerprints, BPE words)."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def fingerprint(text: Column) -> Column:
    """Deterministic 128-bit content fingerprint of normalized text
    (md5 hex) — the exact-dedup key."""
    return F.md5(normalize_text(text))


# ---------------------------------------------------------------------------
# hashing-trick bag-of-words embeddings (round 5)
# ---------------------------------------------------------------------------
def token_bucket(tok: Column, dim: int) -> Column:
    """Deterministic, ENGINE-PORTABLE token bucket: first 4 hex chars
    of md5 mod dim. md5 is the one hash both Spark and any SQL oracle
    compute identically (the same portability device as the MinHash
    family) — xxhash64 would be faster but is Spark-only."""
    return F.conv(F.substring(F.md5(tok), 1, 4), 16, 10).cast("int") % dim


def hashed_bow_embeddings(
    df: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 32,
) -> "DataFrame":
    """Hashing-trick bag-of-words embeddings: tokens hash into ``dim``
    md5 buckets, counts L2-normalize into a unit array<double> —
    model-free, deterministic text featurization (the classic hashing
    vectorizer). Returns ``(id_col, e)``. Downstream it feeds the SAME
    similarity stack real embeddings use (cosine, LSH, IVF,
    quantization), which makes the whole vector pipeline runnable on a
    corpus that ships no embedding column.

    Distributed shape — explode + ONE hash aggregation (dim ``count_if``
    partial aggregates, map-side combined; dim > 64 falls back to the
    two-phase (id, bucket)-count + per-id map shape so the unrolled
    aggregate list never dominates codegen), then a pure per-row array
    assembly:

        tokens -> (id, bucket) rows -> dim per-id counters
               -> dense normalized array

    A per-row HOF fold with an array-typed accumulator looks tidier but
    is PATHOLOGICAL in Catalyst: the accumulator array is rebuilt per
    token per element (measured 86 s vs 1-2 s for this shape at sf0.1 —
    the nested-lambda copy-on-write trap, cousin of the re-evaluation
    pitfalls documented in dedup.py). The aggregation here carries only
    (id, int, count) rows and map-side combines absorb hot buckets.

    md5 runs once per token OCCURRENCE. The hash-distinct-vocab-then-
    broadcast-join variant was A/B-measured NO faster at sf0.1 (0.91 s
    vs 0.83 s warm — the join overhead eats the md5 savings); it wins
    only when occurrences/vocab is far larger than this corpus's ~100,
    so the simpler shape ships."""
    toks = df.select(
        F.col(id_col),
        F.explode(norm_tokens(F.col(text_col))).alias("tok"),
    )
    b = toks.select(id_col, token_bucket(F.col("tok"), dim).alias("b"))
    if dim <= 64:
        # ONE exchange: dim count_if aggregates, each partially
        # combined map-side — the (id, bucket)-then-(id) two-groupBy
        # shape pays a second full exchange for nothing at small dim
        # (round-6 fusion; measured equal values, see q91 oracle).
        # Above ~64 buckets the unrolled aggregate list starts to
        # dominate codegen, so the two-phase shape remains the wide
        # path.
        agg = b.groupBy(id_col).agg(
            *[F.count_if(F.col("b") == i).alias(f"_b{i}") for i in range(dim)]
        )
        counts = F.array(*[F.col(f"_b{i}") for i in range(dim)])
    else:
        cnt = b.groupBy(id_col, "b").agg(F.count("*").alias("n"))
        agg = cnt.groupBy(id_col).agg(
            F.map_from_entries(F.collect_list(F.struct("b", "n"))).alias("m")
        )
        counts = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.coalesce(F.element_at(F.col("m"), i), F.lit(0)),
        )
    out = agg.withColumn("_c", counts).withColumn(
        "_n",
        F.sqrt(
            F.aggregate(
                F.col("_c"),
                F.lit(0.0),
                lambda a, c: a + c.cast("double") * c.cast("double"),
            )
        ),
    )
    return out.select(
        id_col,
        F.transform(
            F.col("_c"),
            lambda c: F.when(F.col("_n") > 0, c.cast("double") / F.col("_n")).otherwise(
                F.lit(0.0)
            ),
        ).alias("e"),
    )


# ---------------------------------------------------------------------------
# PII redaction (corpus-scrubbing pass; round 6)
# ---------------------------------------------------------------------------
#: regexes portable across Java (Spark) and RE2 (DuckDB): no lookaround,
#: no backreferences, explicit character classes only. Order matters —
#: emails are redacted before phone numbers so a digit-bearing local
#: part can't be double-matched.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}",
    "ipv4": r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind PII match counts (regexp_count, exact)."""
    return {
        kind: F.regexp_count(text, F.lit(pat))
        for kind, pat in PII_PATTERNS.items()
    }


def redact_pii(text: Column, replacement: str = "[PII]") -> Column:
    """Replace every PII match with ``replacement`` — the standard
    pre-training scrub pass. Pure ``regexp_replace`` chain: per-row,
    zero shuffle, whole-stage codegen; at 100 TB this is scan-bound
    like every other text op in this module."""
    out = text
    for pat in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, replacement)
    return out


# ---------------------------------------------------------------------------
# Repetition-based quality signals (Gopher/MassiveText-class rules)
# ---------------------------------------------------------------------------
def with_repetition_signals(df, text_col: str = "text", id_col: str = "doc_id"):
    """Attach the two classic repetition filters:

    - ``dup_word_frac``: 1 - distinct_tokens / total_tokens (a
      boilerplate/spam signal) — pure per-row HOFs, zero shuffle;
    - ``top_bigram_frac``: occurrences of the doc's most frequent word
      bigram / total bigrams (the MassiveText "top n-gram fraction") —
      ALSO per-row: sort the doc's bigram array and take the longest
      equal run via a single ``aggregate`` fold carrying
      (prev, current_run, best_run) state. The r06 explode +
      two-exchange spelling shuffled every bigram occurrence of the
      corpus for a statistic whose group key is one source row (the
      q07 identity); the fold replaces a filter-over-sequence +
      element_at-probe spelling that materialized a position array per
      doc (measured 0.58 -> 0.50 s warm at sf0.1 for the q98 frame;
      the explode form was 1.03 s — and at 100 TB the removed
      exchanges are the whole token stream). zip_with (not
      transform+element_at) builds the bigrams: measured 20% cheaper
      per element. Round 13 (VERDICT r12 #1 — the q98 lever): the
      bigram KEY is ``xxhash64(a, b)`` — an 8-byte bigint — instead of
      the concatenated string. No string materialization per bigram,
      and the sort + equal-run fold compare 8-byte ints instead of
      variable-length UTF8 (the q107 16-byte-fingerprint rule applied
      per-row). A within-document 64-bit collision would merge two
      distinct bigrams' runs; for a doc of n bigrams that is ~n²/2⁶⁵ —
      zero in any real corpus (a 1M-token document: ~5e-8) and the
      statistic only cares about the argmax run.

    Returns (id_col, dup_word_frac, top_bigram_frac) — narrow, zero
    shuffle; join back to the corpus on ``id_col``. Documents with
    fewer than 2 tokens get ``top_bigram_frac`` 0.0 (no bigrams —
    nothing repeated)."""
    d = df.select(
        F.col(id_col), norm_tokens(F.col(text_col)).alias("t")
    )
    dup = F.coalesce(
        1.0
        - F.try_divide(
            F.size(F.array_distinct("t")).cast("double"),
            F.size("t").cast("double"),
        ),
        F.lit(0.0),
    )
    n_bg = F.greatest(F.size("t") - 1, F.lit(0))
    bgs = F.zip_with(
        F.slice("t", 1, n_bg),
        F.slice("t", 2, n_bg),
        lambda a, b: F.xxhash64(a, b),
    )
    d = d.select(F.col(id_col), dup.alias("dup_word_frac"), F.array_sort(bgs).alias("srt"))
    n = F.size("srt")
    # one-pass longest-equal-run fold over the sorted bigram hashes;
    # the null-prev initial state never equals a hash, so the first
    # element always starts a run of 1
    state0 = F.struct(
        F.lit(None).cast("bigint").alias("p"),
        F.lit(0).alias("c"),
        F.lit(0).alias("b"),
    )

    def _step(acc, x):
        cur = F.when(x == acc["p"], acc["c"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("p"), cur.alias("c"), F.greatest(acc["b"], cur).alias("b")
        )

    best = F.aggregate("srt", state0, _step)["b"]
    top = F.when(
        n > 0,
        F.coalesce(F.try_divide(best.cast("double"), n.cast("double")), F.lit(0.0)),
    ).otherwise(F.lit(0.0))
    return d.select(
        id_col, "dup_word_frac", top.alias("top_bigram_frac")
    )


# ---------------------------------------------------------------------------
# Context-window chunking (round 6)
# ---------------------------------------------------------------------------
def chunk_tokens(df, size: int, overlap: int, id_col: str = "doc_id",
                 text_col: str = "text"):
    """Split each document into fixed-size token windows with overlap —
    the step before context-window packing (q68): a 100k-token document
    must become model-sized pieces BEFORE packing can bin them, and the
    overlap preserves boundary context (the standard sliding-window
    chunking every pretraining pipeline runs).

    Returns (id, chunk_id, n_tokens, chunk_md5): the md5 of the
    space-joined window stands in for the window text so the exploded
    frame stays narrow (at 100 TB the chunk TEXT would be ~(size /
    (size - overlap))x the corpus — downstream consumers re-slice from
    the source instead of shipping duplicated text through shuffles).

    Shape: pure per-row HOFs (sequence -> slice under one transform) +
    one explode — no shuffle at all until a consumer aggregates;
    chunking is free at scan time. Window starts step by
    ``size - overlap``; the final window may be short (kept — its
    tokens are real); empty documents yield no chunks.
    """
    if overlap >= size:
        raise ValueError(f"overlap {overlap} must be < size {size}")
    step = size - overlap
    toks = norm_tokens(F.col(text_col))
    chunks = F.transform(
        F.sequence(
            F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(step)
        ),
        lambda s: F.slice(toks, s + 1, size),
    )
    out = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(chunks).alias("chunk_id", "c"),
    )
    # split('') yields [''], so an empty/whitespace-only document would
    # otherwise emit one degenerate empty-text window — gate on the
    # joined text, which is non-empty for every real chunk
    return (
        out.filter(F.array_join("c", " ") != "")
        .select(
            "id",
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.size("c").cast("bigint").alias("n_tokens"),
            F.md5(F.array_join("c", " ")).alias("chunk_md5"),
        )
    )


# ---------------------------------------------------------------------------
# BM25 lexical retrieval (round 6)
# ---------------------------------------------------------------------------
def bm25_topk(df, query_terms: list[str], k: int = 50, k1: float = 1.2,
              b: float = 0.75, id_col: str = "doc_id",
              text_col: str = "text", prepared_stats: bool = False):
    """Okapi BM25 scoring of every document against a fixed term set,
    top-k by score — the lexical-retrieval half of corpus search (the
    embedding stack's `ann_topk` is the dense half). IDF is the
    Lucene/Robertson form ``ln(1 + (N - df + 0.5)/(df + 0.5))``.

    Determinism contract: the final score is a sum of per-term
    contributions in sorted term order — each term yields exactly one
    value per document, so the floating-point addition order is fixed
    by the expression tree itself, never by partitioning (the q34/q85
    fold-order discipline, achieved here without an array sort).

    Scale shape (round 8 — the explode-free spelling): the query term
    set is tiny and FIXED, so per-doc term frequencies are computed
    ARRAY-side (one size(filter(...)) per term) in the same projection
    as dl — no token explode, no (doc, term) exchange, no join. The
    corpus stats AND per-term document frequencies fold into ONE
    single-row aggregate (count_if(tf > 0) per term) that broadcasts
    back as a cross join; scoring is then a pure projection and top-k
    is TakeOrdered (no full sort). Two scan-stage tokenizer passes
    total — the previous spelling paid the same two passes PLUS a
    full-corpus token explode and a (doc, term) shuffle+join (measured
    0.43 -> 0.23 s warm at sf0.1). Returns (id_col, bm25) with bm25
    rounded to 4 decimals for cross-engine hash stability; only
    documents matching >= 1 query term are ranked (unchanged — the
    old spelling's tf rows existed only for matching docs).

    ``prepared_stats=False`` (the DEFAULT — the operator's original
    lazy contract, kept per ADVICE r08) builds one fully-deferred plan:
    stats ride a broadcast cross join, nothing executes at call time.
    ``prepared_stats=True`` EAGERLY runs the corpus-stats aggregate and
    collects its single row AT CALL TIME (index-time constants — the
    q109 driver-state contract); scores are bit-identical between the
    two modes (test-pinned), only plan shape and call-time cost differ.
    Callers embedding this in deferred pipelines must keep the default.
    """
    terms = sorted(set(query_terms))

    def _eq(term: str):
        # one-arg closure: a default-arg lambda would have TWO visible
        # parameters and pyspark would bind the second to the element
        # INDEX (the (x, i) higher-order form)
        return lambda x: x == F.lit(term)

    proj = df.select(
        F.col(id_col).alias("id"),
        norm_tokens(F.col(text_col)).alias("w"),
    ).select(
        "id",
        F.size("w").alias("dl"),
        *[
            F.size(F.filter("w", _eq(t))).alias(f"tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = proj.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.count_if(F.col(f"tf{i}") > 0).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    matched = F.greatest(*[F.col(f"tf{i}") for i in range(len(terms))]) \
        if len(terms) > 1 else F.col("tf0")
    if prepared_stats:
        # index-time constants (the q109 driver-state contract — a
        # retrieval system precomputes N / avgdl / df when it builds
        # the index, not per query): one bounded 1-row collect at
        # PREPARE, then scoring is a single tokenize pass +
        # TakeOrdered. Literal vs broadcast-column operands are the
        # same IEEE values in the same tree — scores are bit-identical
        # to the in-plan mode (test-pinned).
        r = stats.collect()[0]
        nd, ad = F.lit(r["n_docs"]), F.lit(r["avgdl"])
        dfs = [F.lit(r[f"df{i}"]) for i in range(len(terms))]
        scored = proj.filter(matched > 0)
    else:
        nd, ad = F.col("n_docs"), F.col("avgdl")
        dfs = [F.col(f"df{i}") for i in range(len(terms))]
        scored = proj.filter(matched > 0).crossJoin(F.broadcast(stats))
    total = None
    for i in range(len(terms)):
        tf = F.col(f"tf{i}")
        c = (
            F.log(1.0 + (nd - dfs[i] + 0.5) / (dfs[i] + 0.5))
            * tf * (k1 + 1.0)
            / (tf + k1 * (1.0 - b + b * F.col("dl") / ad))
        )
        # a zero tf contributes exactly 0.0 (idf * 0 / positive)
        total = c if total is None else total + c
    return (
        scored.select(
            F.col("id").alias(id_col),
            F.round(total, 4).alias("bm25"),
        )
        .orderBy(F.col("bm25").desc(), id_col)
        .limit(k)
    )


# ---------------------------------------------------------------------------
# C4-style rule filtering (Raffel et al. 2020) — round 7
# ---------------------------------------------------------------------------
def c4_rules(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    bad_words: tuple = ("badword",),
):
    """The classic C4 cleaning rules as one narrow projection — the
    rule-based sibling of the statistical Gopher filters
    (``with_repetition_signals``):

    - LINE level: keep only lines that end in terminal punctuation
      (. ! ? ") AND have at least 5 words;
    - DOC level: at least 3 sentences (terminal-punctuation count over
      the kept lines, ``translate``-based — exact in both engines), no
      "lorem ipsum", no curly brace, no word from ``bad_words``
      (word-boundary match on the lowercased doc).

    Returns (id_col, n_lines, n_kept_lines, n_sentences, flag_lorem,
    flag_brace, flag_badword, kept). Pure per-row string expressions —
    zero shuffle, scan-bound at any corpus size; every predicate is
    spelled with cross-engine-exact primitives (substring probes and
    replace-based counting, no regex dialect surface except the
    word-boundary bad-word check, whose \\b semantics agree between
    Spark's Java regex and DuckDB's RE2 for ASCII word characters)."""
    lines = F.split(F.col(text_col), "\n")
    is_kept = lambda ln: (
        F.substring(ln, -1, 1).isin(".", "!", "?", '"')
        & (F.size(F.split(F.trim(ln), " ")) >= 5)
    )
    kept_lines = F.filter(lines, is_kept)
    joined = F.array_join(kept_lines, "\n")
    n_sent = F.length(joined) - F.length(F.translate(joined, ".!?", ""))
    low = F.lower(F.col(text_col))
    flag_lorem = low.contains("lorem ipsum")
    flag_brace = low.contains("{") | low.contains("}")
    bad = F.lit(False)
    for w in bad_words:
        bad = bad | low.rlike(rf"\b{w}\b")
    return df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.size(kept_lines).alias("n_kept_lines"),
        n_sent.cast("bigint").alias("n_sentences"),
        flag_lorem.alias("flag_lorem"),
        flag_brace.alias("flag_brace"),
        bad.alias("flag_badword"),
        (
            (n_sent >= 3) & ~flag_lorem & ~flag_brace & ~bad
        ).alias("kept"),
    )


#: HTML entities decoded by ``html_to_text`` — the handful that survive
#: tag stripping in real crawl text; plain string replaces so both
#: engines share the literal table.
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # LAST: decoding it earlier would re-expose e.g. &amp;lt;
)


def html_to_text(html: Column) -> Column:
    """Crawl-grade HTML → text (the trafilatura-class extraction step a
    web-corpus pipeline runs before any quality filter): drop script /
    style blocks and comments (lazy-dot patterns — identical in Java
    regex and RE2), strip remaining tags, decode the common entities
    (``HTML_ENTITIES``, amp last), collapse whitespace. Deliberately
    regex-only — no DOM — so it stays a narrow codegen projection at
    100 TB and the exact same dialect-shared patterns replay in the
    SQL oracle (q146)."""
    t = F.regexp_replace(html, r"(?is)<script\b.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"<[^>]*>", " ")
    for ent, rep in HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def html_title(html: Column) -> Column:
    """First ``<title>`` body (whitespace-collapsed), '' when absent."""
    return F.trim(
        F.regexp_replace(
            F.regexp_extract(html, r"(?is)<title>(.*?)</title>", 1), r"\s+", " "
        )
    )


def html_link_count(html: Column) -> Column:
    """Number of ``<a`` anchors: ``<a`` followed by any whitespace or
    ``>`` — minified and newline-wrapped markup writes ``<a\\nhref`` and
    bare ``<a>``, which a space-only probe undercounts. Non-overlapping
    regex counting matches in both engines (DuckDB twin:
    ``len(regexp_extract_all(lower(h), '<a[\\s>]'))``)."""
    return F.regexp_count(F.lower(html), F.lit(r"<a[\s>]")).cast("bigint")


#: The Gopher "required stopwords" set (Rae et al. 2021 §A.1.1): a doc
#: must contain at least 2 of these to pass the quality gate. ASCII so
#: the same literals embed in the DuckDB oracle.
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_rules(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
):
    """The Gopher / MassiveText doc-level quality heuristics (Rae et
    al. 2021 §A.1.1) as one narrow projection — the threshold-rule
    sibling of ``with_repetition_signals`` (which carries the paper's
    repetition half) and ``c4_rules``:

    - word count within [min_words, max_words];
    - mean word length within [min_mean_word_len, max_mean_word_len];
    - symbol-to-word ratio (# and ``...``) at most 0.1;
    - at most 90% of lines starting with a bullet (``- `` / ``* ``);
    - at most 30% of lines ending in an ellipsis;
    - at least 80% of words containing an alphabetic character;
    - at least 2 of the 8 ``GOPHER_STOPWORDS`` present.

    Every gate is evaluated in INTEGER arithmetic (``10*n_sym <=
    n_words`` instead of a float ratio compare), so the kept/dropped
    verdict is bit-exact across engines with no rounding surface; the
    raw counters are returned alongside ``kept`` for downstream
    threshold re-tuning. Pure per-row string/array expressions — zero
    shuffle, scan-bound at any corpus size (the 100 TB posture: this
    runs inside WholeStageCodegen on the scan, the same class as
    ``c4_rules``)."""
    # materialize words/lines/raw ONCE: the split chains are the
    # expensive subexpressions, and higher-order-function lambdas block
    # Catalyst's codegen CSE — without this projection each consumer
    # re-ran the regexp+split (measured 0.84 -> 0.36 s at sf0.1).
    # Round 13 (VERDICT r12 #1, the q141 lever — A/B/C measured at
    # 20x docs, idle box): keep the replace-normalized STRING alongside
    # its split, then total word chars is ALGEBRAIC — length(norm) -
    # (n_words - 1) single-space separators — replacing the per-word
    # aggregate fold (variant A 5.3-5.7 s, this form 3.4-4.0 s; a
    # regex-split + translate(char-count) variant measured 4.3-4.4 s —
    # the one regexp_replace + cheap char-split beats a \\s+ regex
    # split plus a second full-text translate pass).
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    df = df.select(
        F.col(id_col),
        F.col(text_col).alias("__g_raw"),
        F.split(F.col(text_col), "\n").alias("__g_lines"),
        norm.alias("__g_norm"),
        F.split(norm, " ").alias("__g_words"),
    )
    lines = F.col("__g_lines")
    words = F.col("__g_words")
    n_words = F.size(words).cast("bigint")
    n_word_chars = (
        F.length("__g_norm") - (F.size(words) - 1)
    ).cast("bigint")
    n_alpha_words = F.size(F.filter(words, lambda w: w.rlike("[a-z]"))).cast(
        "bigint"
    )
    # distinct stopwords present: one hash-set intersection instead of
    # 8 full array_contains scans of the word array (round 13)
    n_stop_hits = F.size(
        F.array_intersect(words, F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]))
    ).cast("bigint")
    raw = F.col("__g_raw")
    n_hash = F.length(raw) - F.length(F.replace(raw, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(raw) - F.length(F.replace(raw, F.lit("..."), F.lit("")))
    ) / 3
    n_symbols = (n_hash + n_ellipsis).cast("bigint")
    n_lines = F.size(lines).cast("bigint")
    is_bullet = lambda ln: F.trim(ln).startswith("- ") | F.trim(ln).startswith(
        "* "
    )
    n_bullet = F.size(F.filter(lines, is_bullet)).cast("bigint")
    n_ell_lines = F.size(
        F.filter(lines, lambda ln: ln.endswith("..."))
    ).cast("bigint")
    kept = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (n_word_chars >= min_mean_word_len * n_words)
        & (n_word_chars <= max_mean_word_len * n_words)
        & (10 * n_symbols <= n_words)
        & (10 * n_bullet <= 9 * n_lines)
        & (10 * n_ell_lines <= 3 * n_lines)
        & (5 * n_alpha_words >= 4 * n_words)
        & (n_stop_hits >= 2)
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_word_chars.alias("n_word_chars"),
        n_alpha_words.alias("n_alpha_words"),
        n_stop_hits.alias("n_stop_hits"),
        n_symbols.alias("n_symbols"),
        n_lines.alias("n_lines"),
        n_bullet.alias("n_bullet_lines"),
        n_ell_lines.alias("n_ellipsis_lines"),
        kept.alias("kept"),
    )


# ---------------------------------------------------------------------------
# URL normalization + policy filtering (RefinedWeb-class, round 7)
# ---------------------------------------------------------------------------
def url_normalize(url: Column, strip_param_prefixes: tuple = ("utm_",)) -> Column:
    """Canonical URL form for URL-level dedup and policy filtering — the
    first stage of a RefinedWeb-class web-corpus pipeline (Penedo et
    al. 2023 dedupe and filter BY URL before touching content):

    - scheme folded to https (http/https are the same resource for
      dedup purposes);
    - host lowercased, leading ``www.`` and default ports (:80/:443)
      stripped;
    - path kept case-sensitive, trailing slash stripped;
    - query params with a ``strip_param_prefixes`` prefix (tracking:
      utm_*) removed, the rest kept IN ORIGINAL ORDER (re-sorting
      would merge ?a=1&b=2 with ?b=2&a=1 — semantically safe for GET
      but not verifiable byte-wise, so not done);
    - fragment dropped.

    Pure narrow regex/HOF expressions with a deliberately small ASCII
    pattern surface (regexp dialect parity with RE2 is what the q131
    oracle checks). Unparseable inputs (no scheme://host) yield
    ``NULL`` — the caller's quarantine signal, never a silent
    passthrough."""
    host_raw = F.regexp_extract(url, r"^[a-zA-Z]+://([^/?#]+)", 1)
    host = F.lower(host_raw)
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    path = F.regexp_extract(url, r"^[a-zA-Z]+://[^/?#]+([^?#]*)", 1)
    path = F.regexp_replace(path, r"/$", "")
    q = F.regexp_extract(url, r"\?([^#]*)", 1)
    kept_params = F.filter(
        F.split(q, "&"),
        lambda p: (p != "")
        & ~reduce_or(
            [p.startswith(pref) for pref in strip_param_prefixes]
        ),
    )
    qs = F.array_join(kept_params, "&")
    norm = F.concat(
        F.lit("https://"),
        host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    return F.when(host_raw != "", norm).otherwise(F.lit(None))


def reduce_or(conds: list) -> Column:
    """OR-fold a non-empty list of boolean Columns."""
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


def url_host(url: Column) -> Column:
    """Lowercased, www-stripped, port-stripped host of ``url`` (the
    blocklist/quota key; '' when unparseable)."""
    host = F.lower(F.regexp_extract(url, r"^[a-zA-Z]+://([^/?#]+)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    return F.regexp_replace(host, r":(80|443)$", "")
