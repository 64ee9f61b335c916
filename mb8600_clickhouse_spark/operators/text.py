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
    pretraining-corpus filter features)."""
    len_score = F.least(F.length(text).cast("double") / F.lit(500.0), F.lit(1.0))
    punct_penalty = F.least(punct_ratio(text) * 4.0, F.lit(1.0))
    wl = mean_token_len(text)
    wordlen_score = F.when((wl >= 3.0) & (wl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return (len_score * 0.4 + (1.0 - punct_penalty) * 0.3 + wordlen_score * 0.3)


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-overlap scores (distinct-token based)."""
    toks = F.array_distinct(tokens(F.lower(text)))
    out = {}
    for lang, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.array_intersect(toks, sw))
    return out


def lang_id(text: Column) -> Column:
    """Argmax language by stopword overlap; 'und' when no stopwords hit.
    Deterministic tiebreak: language code ascending."""
    scores = lang_scores(text)
    best = None
    for lang in sorted(scores):  # ascending code order => first max wins
        s = scores[lang]
        if best is None:
            best = F.struct(s.alias("score"), F.lit(lang).alias("lang"))
        else:
            best = F.when(s > best["score"], F.struct(s.alias("score"), F.lit(lang).alias("lang"))).otherwise(best)
    return F.when(best["score"] <= 0, F.lit("und")).otherwise(best["lang"])


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Deterministic 128-bit content fingerprint of normalized text
    (md5 hex) — the exact-dedup key."""
    return F.md5(normalize_text(text))
