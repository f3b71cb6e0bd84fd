"""Distributed logistic regression: gradient math vs a numpy replica,
loss monotonicity on a separable problem, and the zero-shuffle scoring
plan."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from seaexplorertools_spark.operators.classifier import (
    logistic_score,
    logistic_train,
    logloss,
)

FEATS = ["x0", "x1"]


def _df(spark, X, y):
    rows = [(float(a), float(b), float(t)) for (a, b), t in zip(X, y)]
    return spark.createDataFrame(rows, ["x0", "x1", "y"])


def test_matches_numpy_full_batch_gd(spark):
    rng = np.random.default_rng(3)
    X = np.c_[np.ones(80), rng.normal(size=80)]
    y = (X[:, 1] + rng.normal(scale=0.5, size=80) > 0).astype(float)
    df = _df(spark, X, y)
    for n_iter in (1, 3):
        w = np.zeros(2)
        for _ in range(n_iter):
            p = 1 / (1 + np.exp(-(X @ w)))
            w = w - ((p - y)[:, None] * X).mean(axis=0)
        got = logistic_train(df, FEATS, "y", n_iter=n_iter, lr=1.0)
        assert np.allclose(got, w, rtol=1e-12, atol=1e-12)


def test_loss_decreases_and_separates(spark):
    # separable: y = 1 iff x1 > 0, margin 0.5
    X = [(1.0, v) for v in list(np.linspace(-3, -0.5, 40)) + list(np.linspace(0.5, 3, 40))]
    y = [0.0] * 40 + [1.0] * 40
    df = _df(spark, X, y)
    losses = [
        logloss(df, FEATS, "y", logistic_train(df, FEATS, "y", n_iter=k, lr=1.0))
        for k in (0, 2, 6)
    ]
    assert losses[0] == max(losses)  # w=0 → ln 2
    assert math.isclose(losses[0], math.log(2), rel_tol=1e-12)
    assert losses[2] < losses[1] < losses[0]
    w = logistic_train(df, FEATS, "y", n_iter=6, lr=1.0)
    scored = {
        r["x1"]: r["p"] for r in logistic_score(df, FEATS, w).collect()
    }
    assert all(p < 0.5 for v, p in scored.items() if v < 0)
    assert all(p > 0.5 for v, p in scored.items() if v > 0)


def test_scoring_is_a_pure_map(spark):
    df = _df(spark, [(1.0, 0.3), (1.0, -0.2)], [1.0, 0.0])
    plan = (
        logistic_score(df, FEATS, [0.1, -0.2])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_empty_input_raises_clearly(spark):
    import pytest

    from seaexplorertools_spark.operators.classifier import logistic_train

    empty = spark.createDataFrame([], "x0 double, x1 double, y double")
    with pytest.raises(ValueError, match="empty input"):
        logistic_train(empty, FEATS, "y")


def test_nb_langid_hand_example_and_accuracy(spark):
    """Naive Bayes: exact hand-computed scores on a 4-doc corpus, and
    near-perfect self-classification on a separable two-class corpus."""
    from seaexplorertools_spark.operators.classifier import nb_classify, nb_train

    rows = [
        (1, "a", "x x y"),
        (2, "a", "x y"),
        (3, "b", "z z"),
        (4, "b", "z w"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    tc, ct, v = nb_train(docs, "lang")
    assert v == 4  # x y z w
    counts = {(r["label"], r["tok"]): r["cnt"] for r in tc.collect()}
    assert counts[("a", "x")] == 3 and counts[("b", "z")] == 3
    out = {r["doc_id"]: r for r in nb_classify(docs, tc, ct, v).collect()}
    # doc 1 ("x x y") under class a: ln(2/4) + 2·ln(3+1) + ln(2+1) − 3·ln(5+4)
    want = math.log(0.5) + 2 * math.log(4.0) + math.log(3.0) - 3 * math.log(9.0)
    assert out[1]["pred_label"] == "a"
    assert out[1]["score"] == pytest.approx(want, rel=1e-12)
    assert out[3]["pred_label"] == "b" and out[4]["pred_label"] == "b"

    # separable vocabulary ⇒ self-classification is perfect
    big = spark.createDataFrame(
        [(i, "en", "the quick brown fox " * 3) for i in range(30)]
        + [(100 + i, "de", "der schnelle braune fuchs " * 3) for i in range(30)],
        "doc_id long, lang string, text string",
    )
    tc, ct, v = nb_train(big, "lang")
    pred = nb_classify(big, tc, ct, v)
    joined = pred.join(big, "doc_id")
    acc = joined.where(F.col("pred_label") == F.col("lang")).count() / 60
    assert acc == 1.0
