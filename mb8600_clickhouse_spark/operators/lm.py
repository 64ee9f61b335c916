"""Self-trained n-gram language-model scoring — the CCNet-style fluency
signal (Wenzek et al. 2020 train a KenLM and bucket documents by
perplexity; here the LM is trained ON THE CORPUS ITSELF, distributed,
so the operator has zero model-file dependencies).

Two scores:

- ``bigram_lm_scores`` — add-alpha-smoothed conditional probability
  p(w2|w1), per-document average in the LINEAR domain. Log-free on
  purpose: every arithmetic step (integer counts, IEEE double division,
  decimal snapping, exact decimal sums) is bit-reproducible in a second
  engine, so the whole training+scoring pipeline is differentially
  verifiable (q108). Low avg_p = the document's word transitions are
  rare in the corpus = the same outlier signal perplexity ranks by
  (monotonicity differs, outliers agree).
- ``perplexity`` (on the same frame) — the classic exp(-avg ln p)
  form. Lives in the log domain where libm ``ln`` is only
  ulp-reproducible, so it is pytest-verified against a pure-Python
  reference instead of the SQL oracle.

Scale shape (100 TB): the "model" is the (w1, w2, p) table — at most
|vocab|^2 rows and in practice far smaller; training is two partial
(map-side combined) count aggregations over the bigram stream. Scoring
pre-aggregates each document's bigrams WITH multiplicity first
(groupBy doc — the row count entering the model join is bounded by
distinct-bigrams-per-doc, not tokens), then one shuffle equi-join
against the model on (w1, w2) — probe-side skew on stop-bigrams is
harmless because the model side holds exactly one row per key. No
driver-side collect anywhere: the vocabulary size V enters the plan as
a window aggregate over the vocab-bounded count table (default) or a
broadcast 1-row crossJoin (distributed finalize), never a collected
scalar.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import norm_tokens


def _hint(df: DataFrame, broadcast: bool) -> DataFrame:
    """Model-side join hint: broadcast by default (the (w1,w2) tables are
    bigram-vocab-bounded and typically MBs), but the bound is
    corpus-vocabulary-squared in the worst case — many GB at the 100 TB
    design point — so every scoring entry point exposes
    ``broadcast_model=False`` to fall back to AQE's shuffle join instead
    of an unconditional driver/executor-OOM hint."""
    return F.broadcast(df) if broadcast else df


def bigram_occurrences(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, w1, w2) — one row per positional bigram occurrence. INDEX
    explode + flat element projection (exploding a transform() array
    re-evaluates it per output element — the shingle_rows lesson), over
    a width-corrected input (``dedup.widen_if_narrow``: corpus parquet
    often scans as a handful of partitions and this chain is
    compute-bound)."""
    from .dedup import widen_if_narrow

    toks = widen_if_narrow(df, id_col).select(
        F.col(id_col).alias("id"),
        norm_tokens(F.col(text_col)).alias("toks"),
    )
    # guarded sequence (sequence(1, 0) counts DOWN — see shingle_rows)
    n_bg = F.size("toks") - 1
    idx = toks.select(
        "id",
        "toks",
        F.explode(
            F.when(n_bg > 0, F.sequence(F.lit(1), n_bg)).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("i"),
    )
    return idx.select(
        "id",
        F.element_at("toks", F.col("i")).alias("w1"),
        F.element_at("toks", F.col("i") + 1).alias("w2"),
    )


def bigram_model_from_docb(
    docb: DataFrame, alpha: float = 1.0, local_finalize: bool = True
) -> DataFrame:
    """Train from the per-doc bigram table (id, w1, w2, n): (w1, w2, p)
    with p = (c(w1,w2)+alpha) / (c(w1)+alpha*V), V = distinct successor
    vocabulary. Everything derives from ``docb`` — c2 = sum of n by
    (w1,w2), c1 = sum of c2 by w1, V = distinct w2 of the c2 table — so
    the token stream is consumed exactly once upstream and the model
    aggregations run over vocab-bounded tables (and Spark's
    ReuseExchange shares docb's exchange with the scoring consumer).
    p is a single IEEE double division (bit-identical across engines).

    ``local_finalize=True`` (default) computes c1 and V as WINDOW
    aggregates over ``big`` in a single partition — valid under exactly
    the boundedness assumption the callers already make when they
    BROADCAST the finished model (the window input is the same (w1,w2)
    table the broadcast ships), and it replaces two broadcast builds
    plus the two-exchange countDistinct chain with one tiny exchange:
    measured 0.92 -> 0.79 s warm for q108 end-to-end at sf0.1. On a
    vocab-explosive corpus pass False (with ``broadcast_model=False``
    in the scorers, which threads here) for the fully distributed
    join-based derivation."""
    big = docb.groupBy("w1", "w2").agg(F.sum("n").alias("c2"))
    p_expr = (F.col("c2") + F.lit(alpha)) / (
        F.col("c1") + F.lit(alpha) * F.col("v")
    )
    if local_finalize:
        from pyspark.sql import Window as W

        return (
            big.withColumn(
                "v", F.size(F.collect_set("w2").over(W.partitionBy()))
            )
            .withColumn("c1", F.sum("c2").over(W.partitionBy("w1")))
            .select("w1", "w2", p_expr.alias("p"))
        )
    uni = big.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = big.agg(F.countDistinct("w2").alias("v"))
    return (
        big.join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("w1", "w2", p_expr.alias("p"))
    )


def bigram_model(
    occ: DataFrame, alpha: float = 1.0, local_finalize: bool = True
) -> DataFrame:
    """Train directly from an occurrence stream (id, w1, w2). Kept for
    callers holding raw occurrences; the scoring pipeline uses
    ``bigram_model_from_docb`` to avoid consuming the stream twice."""
    docb = occ.groupBy("id", "w1", "w2").agg(F.count("*").alias("n"))
    return bigram_model_from_docb(docb, alpha, local_finalize)


def bigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    broadcast_model: bool = True,
) -> DataFrame:
    """Score every document against the corpus-trained bigram model:
    (id, n_bigrams, avg_p, min_p). avg_p sums per-position probabilities
    snapped to DECIMAL(12,8) — exact, fold-order-free addition — then
    divides by the position count; min_p is order-free by construction.
    Documents with <2 tokens produce no row."""
    occ = bigram_occurrences(df, id_col, text_col)
    # per-doc bigrams WITH multiplicity: bounds the model-join row count
    # by distinct-bigrams-per-doc, carries the weight n, and is the ONE
    # aggregation of the token stream — the model derives from it
    docb = occ.groupBy("id", "w1", "w2").agg(F.count("*").alias("n"))
    model = bigram_model_from_docb(docb, alpha, broadcast_model)
    # broadcast the model by default: (w1,w2,p) is bigram-vocab-bounded —
    # the scoring join then needs NO re-shuffle of docb (whose aggregation
    # exchange is shared with the model derivation via ReuseExchange). On
    # a corpus whose bigram vocabulary outgrows the broadcast budget, pass
    # broadcast_model=False for AQE's shuffle join — the shape stays
    # correct (see _hint).
    scored = docb.join(_hint(model, broadcast_model), ["w1", "w2"])
    # DECIMAL(12,8), not (18,8): Spark's decimal multiply adds the
    # operand precisions, and (18,8) x bigint exceeds precision 38 —
    # the result is silently rescaled to (38,7), dropping the 8th
    # decimal that DuckDB (whose rules stay within 38 here) keeps: a
    # cross-engine divergence in the snap itself, caught by the
    # property differential. (12,8) x bigint = (33,8) — exact.
    pd8 = F.col("p").cast("decimal(12,8)")
    return (
        scored.groupBy("id")
        .agg(
            F.sum("n").alias("n_bigrams"),
            (F.sum(pd8 * F.col("n")).cast("double") / F.sum("n")).alias(
                "avg_p"
            ),
            F.min(pd8).cast("double").alias("min_p"),
        )
    )


def ccnet_cut_buckets(
    per: DataFrame,
    score_col: str = "avg_p",
    n_buckets: int = 3,
    relative_error: float = 0.001,
) -> DataFrame:
    """CCNet head/middle/tail bucketing by APPROXIMATE quantile cut
    points — the 100 TB replacement for q130's exact ``ntile`` (whose
    global window moves every (id, score) pair through one task).
    ``approxQuantile`` (Greenwald–Khanna) computes the n_buckets-1 cut
    scores in one distributed pass with driver state bounded by
    1/relative_error — the cuts come back as n_buckets-1 SCALARS and
    the bucket assignment is a pure narrow projection (window-free,
    scan-speed, embarrassingly parallel). Bucket 1 is the HEAD (highest
    scores — CCNet's most-fluent tercile), matching the exact variant's
    ``ntile(3) ORDER BY score DESC``.

    Documented trade vs the exact window: documents within
    ±relative_error of a cut may land one bucket off (CCNet itself cuts
    at approximate percentiles — Wenzek et al. 2020 §4.3); bucket
    POPULATIONS are equal only to the same tolerance. Exact-replay
    pipelines (the q130 oracle) keep the window; production corpus
    splits take this lever."""
    cuts = per.approxQuantile(
        score_col,
        [i / n_buckets for i in range(1, n_buckets)],
        relative_error,
    )
    # cuts ascend; one chained CASE, highest cut first:
    # score > cut[k-2] -> 1 (head), ..., > cut[0] -> k-1, else k (tail)
    expr = F.lit(n_buckets)
    for i, c in enumerate(cuts):
        expr = F.when(F.col(score_col) > F.lit(c), n_buckets - 1 - i).otherwise(expr)
    return per.withColumn("bucket", expr.cast("int"))


def perplexity_reference(
    texts: dict[int, str], alpha: float = 1.0
) -> dict[int, float]:
    """Pure-Python reference: exp(-mean ln p) per document under the
    identical add-alpha bigram model. The log-domain twin of
    ``bigram_lm_scores`` for pytest differential checks."""
    occ: list[tuple[int, str, str]] = []
    for i, t in texts.items():
        w = " ".join(t.lower().split()).split(" ")
        occ += [(i, w[j], w[j + 1]) for j in range(len(w) - 1)]
    c2: dict[tuple[str, str], int] = {}
    c1: dict[str, int] = {}
    vocab = set()
    for _, a, b in occ:
        c2[(a, b)] = c2.get((a, b), 0) + 1
        c1[a] = c1.get(a, 0) + 1
        vocab.add(b)
    v = len(vocab)
    out: dict[int, float] = {}
    for i in texts:
        lps = [
            math.log((c2[(a, b)] + alpha) / (c1[a] + alpha * v))
            for d, a, b in occ
            if d == i
        ]
        if lps:
            out[i] = math.exp(-sum(lps) / len(lps))
    return out


def with_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    broadcast_model: bool = True,
) -> DataFrame:
    """(id, n_bigrams, ppl) — exp(-avg ln p): the classic CCNet bucket
    key. Log-domain (libm ``ln`` is ulp- not bit-reproducible across
    engines) so its verification is the pytest differential against
    ``perplexity_reference``, not the SQL oracle. ``broadcast_model``:
    see _hint — pass False on vocab-explosive corpora."""
    occ = bigram_occurrences(df, id_col, text_col)
    docb = occ.groupBy("id", "w1", "w2").agg(F.count("*").alias("n"))
    model = bigram_model_from_docb(docb, alpha, broadcast_model)
    scored = docb.join(_hint(model, broadcast_model), ["w1", "w2"])
    return scored.groupBy("id").agg(
        F.sum("n").alias("n_bigrams"),
        F.exp(
            -F.sum(F.log("p") * F.col("n")) / F.sum("n")
        ).alias("ppl"),
    )


def dsir_weights(
    df: DataFrame,
    target_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    broadcast_model: bool = True,
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023), the
    n-gram-model instantiation: rank every document by how much more it
    resembles the TARGET distribution (rows where ``target_col`` is
    true) than the full SOURCE corpus. Both bigram models are trained
    distributed from one pass over the token stream; per-doc scores are
    the linear-domain average conditional probabilities under each
    (the q108 device — integer counts, IEEE division, decimal-snapped
    sums keep the whole thing bit-reproducible for the SQL oracle; DSIR
    proper uses log-ratios, same ranking signal on the outliers).

    Unseen-bigram smoothing is exact: scoring left-joins the COUNT
    tables (not a pre-divided p-table) so p = (c2+a)/(c1+a*V) with
    missing counts as 0. Returns (id, n_bigrams, p_target, p_source)
    — the importance signal is the p_target/p_source ordering.

    Scale: the model tables are vocab-bounded broadcasts; the corpus is
    tokenized once (docb feeds both models and the scoring join);
    nothing reaches the driver."""
    occ = bigram_occurrences(df, id_col, text_col)
    labels = df.select(
        F.col(id_col).alias("id"), F.col(target_col).cast("boolean").alias("_t")
    )
    # aggregate FIRST, label after: _t is a function of id, so joining
    # the (id,w1,w2,n) table instead of the raw occurrence stream halves
    # the join's probe side — and the join key matches docb's id
    # partitioning (widen_if_narrow), so the docb side never re-shuffles
    # whether AQE picks broadcast (fixture scale) or a co-located
    # shuffle join (corpus-sized label tables at 100 TB)
    docb = (
        occ.groupBy("id", "w1", "w2")
        .agg(F.count("*").alias("n"))
        .join(labels, "id")
    )
    # ONE combined count table: target counts ride along as conditional
    # sums (a bigram absent from the target slice scores c2_t = 0 — the
    # exact unseen-smoothing value), so scoring is a single INNER
    # broadcast join (every scored bigram is in the source model by
    # construction) instead of four left-joins over separate tables.
    big = docb.groupBy("w1", "w2").agg(
        F.sum("n").alias("c2_s"),
        F.coalesce(F.sum(F.when(F.col("_t"), F.col("n"))), F.lit(0)).alias("c2_t"),
    )
    a = F.lit(alpha)

    def _score(side: str):
        return (F.col(f"c2_{side}") + a) / (
            F.col(f"c1_{side}") + a * F.col(f"v_{side}")
        )

    if broadcast_model:
        # both models finalize as window aggregates over the combined
        # count table in one partition — the bigram_model_from_docb
        # local_finalize rationale (bounded by the same vocab^2 bound
        # the broadcast itself assumes), collapsing three model joins
        # into ONE broadcast join
        from pyspark.sql import Window as W

        wall = W.partitionBy()
        ww1 = W.partitionBy("w1")
        model = (
            big.withColumn("v_s", F.size(F.collect_set("w2").over(wall)))
            .withColumn(
                "v_t",
                F.size(
                    F.collect_set(
                        F.when(F.col("c2_t") > 0, F.col("w2"))
                    ).over(wall)
                ),
            )
            .withColumn("c1_s", F.sum("c2_s").over(ww1))
            .withColumn("c1_t", F.sum("c2_t").over(ww1))
        )
        scored = (
            docb.join(F.broadcast(model), ["w1", "w2"])
            .withColumn("p_t", _score("t"))
            .withColumn("p_s", _score("s"))
        )
    else:
        uni = big.groupBy("w1").agg(
            F.sum("c2_s").alias("c1_s"), F.sum("c2_t").alias("c1_t")
        )
        voc = big.agg(
            F.countDistinct("w2").alias("v_s"),
            F.countDistinct(
                F.when(F.col("c2_t") > 0, F.col("w2"))
            ).alias("v_t"),
        )
        scored = (
            docb.join(big, ["w1", "w2"])
            .join(uni, ["w1"])
            .crossJoin(F.broadcast(voc))
            .withColumn("p_t", _score("t"))
            .withColumn("p_s", _score("s"))
        )
    # (12,8): see bigram_lm_scores — (18,8) x bigint loses the 8th
    # decimal to Spark's precision-38 rescale
    pt8 = F.col("p_t").cast("decimal(12,8)")
    ps8 = F.col("p_s").cast("decimal(12,8)")
    return scored.groupBy("id").agg(
        F.sum("n").alias("n_bigrams"),
        (F.sum(pt8 * F.col("n")).cast("double") / F.sum("n")).alias("p_target"),
        (F.sum(ps8 * F.col("n")).cast("double") / F.sum("n")).alias("p_source"),
    )
