"""Distributed logistic-regression training — the learned quality-filter
component of LLM data pipelines (engine addition; the reference,
``/root/reference/seaexplorertools/process_adcp.py``, has no text or
model ops).

Production corpora gate documents with a small learned classifier (the
CCNet / fastText-style "quality" filter: score each page against a
high-quality reference corpus and keep the confident slice). The
training loop here is full-batch gradient descent expressed the same way
as the k-means and PCA iterations (``operators/clustering.py``,
``operators/pca.py``):

- the model state (one weight per feature) lives on the DRIVER as plain
  floats — the J5 scalar boundary: a handful of numbers, never a row
  shuffle;
- each iteration is ONE map-side-combined aggregate: the weights enter
  the plan as literals, so σ(w·x) is whole-stage-codegen JVM work and
  the shuffle is |features| partial sums, independent of row count;
- scoring with the trained weights is a pure map (zero exchanges).

At 100 TB: per-iteration cost is one scan + a |features|-row aggregate —
the same shape as any global average; iteration count is a small
constant. Nothing is collected except the gradient vector itself.

Determinism: full-batch gradients have no sampling and no
partition-order dependence beyond float-summation ulps; the contract
oracle (unrolled CTEs in DuckDB, same iteration count) matches to 1e-6
after the standard 6-dp rounding.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logistic_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    n_iter: int = 3,
    lr: float = 1.0,
) -> list[float]:
    """Full-batch gradient descent from w = 0: per iteration, ONE
    aggregate computes g_j = mean((σ(w·x) − y)·x_j) with the current
    weights as literals, then the driver applies w ← w − lr·g. Returns
    the final weight list (order = ``feature_cols``)."""
    w = [0.0] * len(feature_cols)
    for _ in range(n_iter):
        z = None
        for wi, c in zip(w, feature_cols):
            t = F.col(c) * F.lit(wi)
            z = t if z is None else z + t
        err = _sigmoid(z) - F.col(label_col).cast("double")
        g = df.agg(
            *[
                F.avg(err * F.col(c)).alias(f"g{j}")
                for j, c in enumerate(feature_cols)
            ]
        ).collect()[0]
        if any(g[f"g{j}"] is None for j in range(len(feature_cols))):
            raise ValueError(
                "logistic_train: gradient is NULL — empty input or a "
                "feature/label column that is NULL on every row"
            )
        w = [wi - lr * g[f"g{j}"] for j, wi in enumerate(w)]
    return w


def logistic_score(
    df: DataFrame,
    feature_cols: list[str],
    weights: list[float],
    out_col: str = "p",
) -> DataFrame:
    """σ(w·x) with literal weights — pure map, zero exchanges."""
    z = None
    for wi, c in zip(weights, feature_cols):
        t = F.col(c) * F.lit(wi)
        z = t if z is None else z + t
    return df.withColumn(out_col, _sigmoid(z))


def logloss(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    weights: list[float],
) -> float:
    """Mean binary cross-entropy of the model on ``df`` (one aggregate)."""
    scored = logistic_score(df, feature_cols, weights, "__p")
    y = F.col(label_col).cast("double")
    ll = -(
        y * F.log(F.col("__p")) + (F.lit(1.0) - y) * F.log(F.lit(1.0) - F.col("__p"))
    )
    return scored.agg(F.avg(ll).alias("l")).collect()[0]["l"]


def sigmoid(z: float) -> float:
    """Driver-side σ for tests."""
    return 1.0 / (1.0 + math.exp(-z))
