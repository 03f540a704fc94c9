"""Distributed logistic-regression quality classifier vs a numpy reference."""

import hashlib
import re

import numpy as np
import pandas as pd
import pytest

from forex_feature_generator_spark.ops import classifier as CLF

GOOD = "thorough reference article with citations and careful analysis"
BAD = "click here buy now limited offer winner prize claim free"


def _mk_docs(n=30):
    rows = []
    for i in range(n):
        rows.append((i, f"{GOOD} item {i}", 1))
        rows.append((100 + i, f"{BAD} item {i}", 0))
    return pd.DataFrame(rows, columns=["doc_id", "text", "label"])


def _bucket(word, n_buckets):
    return int(hashlib.md5(word.encode()).hexdigest()[:8], 16) % n_buckets


def _np_features(pdf, n_buckets):
    X = np.zeros((len(pdf), n_buckets))
    for r, text in enumerate(pdf["text"]):
        for w in re.sub(r"[^a-z0-9]+", " ", text.lower()).split():
            X[r, _bucket(w, n_buckets)] += 1.0
    return X


def _np_train(X, y, epochs, lr):
    n, b = X.shape
    w = np.zeros(b)
    bias = 0.0
    for _ in range(epochs):
        p = 1.0 / (1.0 + np.exp(-(X @ w + bias)))
        r = p - y
        w -= lr * (X.T @ r) / n
        bias -= lr * r.sum() / n
    return w, bias


@pytest.fixture(scope="module")
def trained(spark):
    pdf = _mk_docs()
    docs = spark.createDataFrame(pdf)
    w, bias = CLF.train_quality_classifier(
        docs, "label", n_buckets=256, epochs=10, lr=1.0)
    return pdf, docs, np.array(w), bias


def test_train_matches_numpy_reference(trained):
    pdf, _, w, bias = trained
    X = _np_features(pdf, 256)
    y = pdf["label"].to_numpy(dtype=float)
    w_ref, bias_ref = _np_train(X, y, epochs=10, lr=1.0)
    assert np.allclose(w, w_ref, atol=1e-9, rtol=1e-6)
    assert abs(bias - bias_ref) < 1e-9


def test_score_separates_and_matches(spark, trained):
    pdf, docs, w, bias = trained
    out = (CLF.classifier_score(docs, list(w), bias)
           .select("doc_id", "label", "quality_prob").toPandas())
    good = out[out.label == 1]["quality_prob"]
    bad = out[out.label == 0]["quality_prob"]
    assert good.min() > 0.5 > bad.max()      # full separation on train set
    # probabilities equal the numpy model's, rounded to 6
    X = _np_features(pdf, 256)
    p_ref = 1.0 / (1.0 + np.exp(-(X @ w + bias)))
    ref = dict(zip(pdf["doc_id"], np.round(p_ref, 6)))
    got = dict(zip(out["doc_id"], out["quality_prob"]))
    for k in ref:
        assert abs(got[k] - ref[k]) < 2e-6
    # out-of-vocabulary doc falls back to sigmoid(bias)
    extra = spark.createDataFrame(
        pd.DataFrame([(999, "")], columns=["doc_id", "text"]))
    e = CLF.classifier_score(extra, list(w), bias).collect()[0]
    assert abs(e["quality_prob"] - round(1 / (1 + np.exp(-bias)), 6)) < 1e-9


def test_empty_training_frame_raises(spark, trained):
    _, docs, _, _ = trained
    from pyspark.sql import functions as F
    with pytest.raises(ValueError):
        CLF.train_quality_classifier(docs.filter(F.lit(False)), "label")
