"""Distributed linear text-classifier training — the fastText-style
quality/domain classifier of LLM curation pipelines (Joulin et al. 2016;
CCNet / DSIR use the same shape: linear model over hashed n-gram
features), trained with full-batch gradient descent as DataFrame
aggregations.

Verification split (the q83 pattern): the FIRST gradient step from the
zero init is exactly SQL-expressible — sigmoid(0) = 0.5 turns the
logistic gradient into pure integer feature sums,

    w_j   = lr * (s_pos_j - 0.5 * s_all_j) / N
    bias  = lr * (n_pos/N - 0.5)

so one full training step + the scoring pass is differentially verified
against the DuckDB oracle (q109); multi-step training (real sigmoid,
libm exp — ulp-, not bit-reproducible) is pytest-verified against a
numpy reference.

Scale shape (100 TB): features never densify — (id, j, n) rows with
map-side combined counts; the gradient is ONE groupBy over j (at most
``dim`` rows out); the model (dim+1 doubles) is the only thing that
ever reaches the driver between steps, exactly like q83's k x dim
centroids. Scoring joins the weight table (dim rows, broadcast) back to
feature rows and decimal-snaps each term so the per-doc margin sum is
fold-order-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import norm_tokens, token_bucket


def bow_feature_rows(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", dim: int = 64
) -> DataFrame:
    """(id, j, n): hashed-BoW count features in long form — the sparse
    layout that scales (no dense dim-array per doc, map-side combine on
    (id, j))."""
    # NOT width-corrected: at one md5 per token the chain is ~12x
    # lighter than the shingle-signature pipelines — A/B at sf0.1
    # measured the widening exchange as a net loss here (q109 flat,
    # q91 +0.2 s)
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(norm_tokens(F.col(text_col))).alias("tok"),
    )
    return (
        toks.select("id", token_bucket(F.col("tok"), dim).alias("j"))
        .groupBy("id", "j")
        .agg(F.count("*").alias("n"))
    )


def logreg_zero_init_step(
    feat: DataFrame, labels: DataFrame, lr: float = 1.0
) -> tuple[DataFrame, DataFrame]:
    """ONE exact full-batch logistic gradient step from w=0, b=0.
    Returns (weights (j, w), bias 1-row (bias)). All inputs to the
    arithmetic are integer sums; each double op is a single IEEE
    operation — bit-reproducible in any engine."""
    f = feat.join(labels, "id")
    perj = f.groupBy("j").agg(
        F.sum("n").alias("s_all"),
        F.sum(F.col("n") * F.col("y")).alias("s_pos"),
    )
    tot = labels.agg(F.count("*").alias("nn"), F.sum("y").alias("npos"))
    w = perj.crossJoin(F.broadcast(tot)).select(
        "j",
        (
            F.lit(lr) * (F.col("s_pos") - 0.5 * F.col("s_all")) / F.col("nn")
        ).alias("w"),
    )
    bias = tot.select(
        (F.lit(lr) * (F.col("npos") / F.col("nn") - 0.5)).alias("bias")
    )
    return w, bias


def linear_margins(feat: DataFrame, w: DataFrame, bias: DataFrame) -> DataFrame:
    """(id, margin): w . x + b per document. Each term w_j * n_ij is
    snapped to DECIMAL(28,10) before the per-doc sum — exact,
    fold-order-free addition (the q108 device); the weight side of the
    join is at most ``dim`` rows, broadcast."""
    terms = feat.join(F.broadcast(w), "j").select(
        "id", (F.col("w") * F.col("n")).cast("decimal(28,10)").alias("term")
    )
    return (
        terms.groupBy("id")
        .agg(F.sum("term").cast("double").alias("s"))
        .crossJoin(F.broadcast(bias))
        .select("id", (F.col("s") + F.col("bias")).alias("margin"))
    )


def logreg_zero_init_model(
    feat: DataFrame, labels: DataFrame, dim: int, lr: float = 1.0
) -> tuple[list[float], float]:
    """``logreg_zero_init_step`` collected to driver state: the model is
    dim+1 doubles — the SAME driver-state contract every step of
    ``logreg_train`` already uses (and q83's centroids). Returns
    (w[dim], bias); absent feature buckets get weight 0.0 (they
    contribute nothing to any margin, exactly like the join form)."""
    w, bias = logreg_zero_init_step(feat, labels, lr)
    wvec = [0.0] * dim
    for r in w.collect():
        wvec[r["j"]] = r["w"]
    return wvec, bias.collect()[0]["bias"]


def linear_margins_lit(
    feat: DataFrame, wvec: list[float], bias: float
) -> DataFrame:
    """(id, margin) with the model embedded as a LITERAL array — the
    scoring twin of ``linear_margins`` for a collected model: no weight
    join, no bias crossJoin; ``element_at`` on a constant-folded array
    replaces the broadcast. Same per-term DECIMAL(28,10) snap, so the
    margin is bit-identical to the join form."""
    warr = F.array(*[F.lit(float(w)) for w in wvec])
    terms = feat.select(
        "id",
        (F.element_at(warr, F.col("j") + 1) * F.col("n"))
        .cast("decimal(28,10)")
        .alias("term"),
    )
    return (
        terms.groupBy("id")
        .agg(F.sum("term").cast("double").alias("s"))
        .select("id", (F.col("s") + F.lit(float(bias))).alias("margin"))
    )


def logreg_train(
    feat: DataFrame,
    labels: DataFrame,
    dim: int,
    steps: int = 5,
    lr: float = 1.0,
) -> tuple[list[float], float]:
    """Multi-step full-batch logistic regression (real sigmoid). Driver
    state is the model only (dim+1 doubles per step — the q83 centroid
    contract); per step: one margin pass + one gradient groupBy.
    Returns (w, bias). Verified by pytest against a numpy reference
    (libm exp keeps this off the SQL-oracle path)."""
    spark = feat.sparkSession
    # loop-invariant inputs are persisted for the training run (the
    # feature lineage — tokenize + bucket + count — would otherwise
    # re-evaluate for the margin join, the gradient join and the count,
    # every step) and the label count is hoisted: one action, not one
    # per step
    feat = feat.persist()
    labels = labels.persist()
    try:
        tot = labels.count()
        wvec = [0.0] * dim
        b = 0.0
        for _ in range(steps):
            wdf = spark.createDataFrame(
                [(j, wj) for j, wj in enumerate(wvec)], "j int, w double"
            )
            bdf = spark.createDataFrame([(b,)], "bias double")
            m = linear_margins(feat, wdf, bdf)
            p = m.select("id", (1.0 / (1.0 + F.exp(-F.col("margin")))).alias("p"))
            resid = p.join(labels, "id").select(
                "id", (F.col("p") - F.col("y")).alias("r")
            )
            grad_rows = (
                feat.join(resid, "id")
                .groupBy("j")
                .agg((F.sum(F.col("n") * F.col("r")) / F.lit(float(tot))).alias("g"))
                .collect()
            )
            gb = resid.agg((F.sum("r") / F.lit(float(tot))).alias("g")).collect()[0]["g"]
            grad = {r["j"]: r["g"] for r in grad_rows}
            wvec = [wj - lr * grad.get(j, 0.0) for j, wj in enumerate(wvec)]
            b -= lr * gb
    finally:
        feat.unpersist()
        labels.unpersist()
    return wvec, b
