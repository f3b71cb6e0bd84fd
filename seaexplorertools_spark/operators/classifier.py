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


def nb_train(
    docs: DataFrame, label_col: str, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """Multinomial Naive Bayes trainer (the other classic lightweight
    corpus classifier next to logistic_train — fastText-era langid /
    topic gates are exactly this shape). Pure aggregation, no driver
    loop: ONE pass builds the per-(label, token) count table and the
    per-label doc/token totals; Laplace-smoothed log-likelihoods are
    derived columns. Returns ``(token_counts, class_table, vocab_size)``
    where token_counts = (label, tok, cnt), class_table = (label,
    n_docs, n_tok) and vocab_size = |distinct tokens| (one scalar —
    the J5 driver boundary).

    At 100 TB: the model IS a table (|vocab| × |labels| upper bound),
    shuffled once on (label, tok) with map-side combine — never
    collected; classification joins it on the token key. The exploded
    token lineage is consistency-cached for the duration of training
    (it feeds both the model aggregate and the vocab count — without
    the cache the tokenize/explode runs once per consumer, the
    lsh_candidate_pairs band-table situation), then released after the
    model table itself is materialized into the ledgered cache."""
    from .dedup import tokens
    from ..caching import consistency_cache

    toks = docs.select(
        F.col(label_col).alias("label"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).cache()  # internal scratch: released before return, never ledgered
    try:
        token_counts = consistency_cache(
            toks.groupBy("label", "tok").agg(F.count("*").alias("cnt"))
        )
        class_table = (
            docs.select(
                F.col(label_col).alias("label"), tokens(F.col(text_col)).alias("__t")
            )
            .groupBy("label")
            .agg(F.count("*").alias("n_docs"), F.sum(F.size("__t")).alias("n_tok"))
        )
        vocab_size = toks.select("tok").distinct().count()
        token_counts.count()  # pin the model while the token scratch is hot
    finally:
        toks.unpersist()
    return token_counts, class_table, vocab_size


def nb_classify(
    docs: DataFrame,
    token_counts: DataFrame,
    class_table: DataFrame,
    vocab_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document against every class and emit the argmax:
    ``(id_col, pred_label, score)`` with score = ln prior +
    Σ_tokens ln(c(l,t)+1) − n_doc·ln(N_l + V) (multinomial NB with
    Laplace smoothing; unseen (label, token) pairs contribute ln 1 = 0
    so the per-doc work is ONE token-keyed equi-join against the model
    table — the only fan-out is |labels| per doc for the base terms).
    Ties break to the lexicographically smallest label (total order).

    Plan shape: explode → join(model on tok) → (doc, label) partial-sum
    → |labels|-per-doc base join → per-doc argmax window keyed by
    id_col. No cross join against the vocabulary, no collect."""
    from .dedup import tokens
    from pyspark.sql.window import Window

    total_docs = class_table.agg(F.sum("n_docs")).collect()[0][0]
    base = class_table.select(
        "label",
        (F.log(F.col("n_docs") / F.lit(float(total_docs)))).alias("prior_ln"),
        F.log(F.col("n_tok") + F.lit(vocab_size)).alias("denom_ln"),
    )
    dtok = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    ndoc = docs.select(
        F.col(id_col), F.size(tokens(F.col(text_col))).alias("n_d")
    )
    hits = (
        dtok.join(token_counts, "tok")
        .groupBy(id_col, "label")
        .agg(F.sum(F.log(F.col("cnt") + F.lit(1.0))).alias("hit_sum"))
    )
    scored = (
        ndoc.crossJoin(F.broadcast(base))  # |labels| rows per doc
        .join(hits, [id_col, "label"], "left")
        .select(
            id_col,
            "label",
            (
                F.col("prior_ln")
                + F.coalesce(F.col("hit_sum"), F.lit(0.0))
                - F.col("n_d") * F.col("denom_ln")
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("label").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(F.col(id_col), F.col("label").alias("pred_label"), "score")
    )
