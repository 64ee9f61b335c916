"""Linear classifier training (operators/classifier.py): multi-step
logistic regression is differentially verified against numpy here (libm
exp keeps it off the SQL-oracle path — q109 verifies the exact
zero-init step + scoring pass)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mb8600_clickhouse_spark.operators import classifier

DIM = 16

DOCS = [
    # label 1 docs lean on 'alpha beta', label 0 on 'gamma delta'
    (1, "alpha beta alpha common word here", 1),
    (2, "alpha alpha beta beta common filler", 1),
    (3, "beta alpha common things alpha", 1),
    (4, "gamma delta gamma common word here", 0),
    (5, "delta delta gamma common filler", 0),
    (6, "gamma gamma delta common things", 0),
]


@pytest.fixture()
def feat_labels(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t, _ in DOCS]
    )
    feat = classifier.bow_feature_rows(df, dim=DIM)
    labels = spark.createDataFrame(
        [Row(id=i, y=y) for i, _, y in DOCS]
    )
    return feat, labels


def _numpy_reference(feat_rows, label_map, steps, lr):
    n_docs = len(label_map)
    ids = sorted(label_map)
    x = np.zeros((n_docs, DIM))
    for r in feat_rows:
        x[ids.index(r["id"]), r["j"]] = r["n"]
    y = np.array([label_map[i] for i in ids], dtype=float)
    w = np.zeros(DIM)
    b = 0.0
    for _ in range(steps):
        p = 1.0 / (1.0 + np.exp(-(x @ w + b)))
        w = w - lr * (x.T @ (p - y)) / n_docs
        b = b - lr * float(np.sum(p - y)) / n_docs
    return w, b


class TestLogregTrain:
    def test_matches_numpy(self, feat_labels):
        feat, labels = feat_labels
        w, b = classifier.logreg_train(feat, labels, dim=DIM, steps=4, lr=1.0)
        ref_w, ref_b = _numpy_reference(
            feat.collect(),
            {r["id"]: r["y"] for r in labels.collect()},
            steps=4,
            lr=1.0,
        )
        assert np.allclose(w, ref_w, rtol=1e-9, atol=1e-12)
        assert abs(b - ref_b) < 1e-9

    def test_training_separates_classes(self, feat_labels, spark):
        feat, labels = feat_labels
        w, b = classifier.logreg_train(feat, labels, dim=DIM, steps=25, lr=2.0)
        wdf = spark.createDataFrame(
            [(j, wj) for j, wj in enumerate(w)], "j int, w double"
        )
        bdf = spark.createDataFrame([(b,)], "bias double")
        m = {
            r["id"]: r["margin"]
            for r in classifier.linear_margins(feat, wdf, bdf).collect()
        }
        lab = {r["id"]: r["y"] for r in labels.collect()}
        assert all(
            (m[i] > 0) == (lab[i] == 1) for i in lab
        ), m

    def test_zero_init_step_equals_one_numpy_step(self, feat_labels, spark):
        feat, labels = feat_labels
        w, bias = classifier.logreg_zero_init_step(feat, labels)
        got_w = {r["j"]: r["w"] for r in w.collect()}
        got_b = bias.collect()[0]["bias"]
        ref_w, ref_b = _numpy_reference(
            feat.collect(),
            {r["id"]: r["y"] for r in labels.collect()},
            steps=1,
            lr=1.0,
        )
        for j in range(DIM):
            assert abs(got_w.get(j, 0.0) - ref_w[j]) < 1e-12
        assert abs(got_b - ref_b) < 1e-12
