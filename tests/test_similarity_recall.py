"""Recall measurement for the approximate-ANN paths vs the exact baseline.

An approximate operator without a measured recall is unfalsifiable — these
tests pin recall@5 ≥ 0.9 for both scale paths (banded hyperplane LSH and
multi-probe IVF) against ``brute_force_topk`` on the embeddings fixture.
The fixture is uniform-random 64-d (the adversarial, no-cluster case), so
the default parameters are sized for it; clustered real corpora reach the
same recall with far smaller candidate volume.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seaexplorertools_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
)

SF_DIR = "/root/testdata/sf0.01"
N_QUERIES = 50
K = 5


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


@pytest.fixture(scope="module")
def exact(emb, queries):
    rows = brute_force_topk(emb, queries, k=K).collect()
    truth: dict[int, set[int]] = {}
    for r in rows:
        truth.setdefault(r["query_id"], set()).add(r["nbr_id"])
    assert len(truth) == N_QUERIES
    return truth


def _recall(approx_rows, truth):
    got: dict[int, set[int]] = {}
    for r in approx_rows:
        got.setdefault(r["query_id"], set()).add(r["nbr_id"])
    hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    return hits / sum(len(t) for t in truth.values())


def test_lsh_recall_at_5(emb, queries, exact):
    rows = lsh_topk(emb, queries, dim=64, k=K).collect()
    rec = _recall(rows, exact)
    assert rec >= 0.9, f"banded-LSH recall@5 = {rec:.3f} < 0.9"


def test_ivf_recall_at_5(emb, queries, exact):
    rows = ivf_topk(emb, queries, n_cells=8, nprobe=6, k=K).collect()
    rec = _recall(rows, exact)
    assert rec >= 0.9, f"IVF recall@5 = {rec:.3f} < 0.9"


def test_ivf_single_probe_weaker_but_runs(emb, queries, exact):
    """nprobe=1 is the degenerate fast path — it must still return ≤k rows
    per query and nonzero recall (sanity that probing logic works)."""
    rows = ivf_topk(emb, queries, n_cells=8, nprobe=1, k=K).collect()
    per_q: dict[int, int] = {}
    for r in rows:
        per_q[r["query_id"]] = per_q.get(r["query_id"], 0) + 1
    assert all(v <= K for v in per_q.values())
    rec = _recall(rows, exact)
    assert 0.0 < rec < 1.0


def test_pq_recall_at_5(emb, queries, exact):
    from seaexplorertools_spark.operators.similarity import pq_topk

    rows = pq_topk(emb, queries, n_sub=16, n_cent=16, k=K, shortlist=100).collect()
    rec = _recall(rows, exact)
    assert rec >= 0.9, f"PQ(16x16, shortlist=100) recall@5 = {rec:.3f} < 0.9"


def test_pq_codes_compress(emb):
    """Every vector gets exactly n_sub codes in [0, n_cent) — the 32x
    compression invariant the ADC scan relies on."""
    from seaexplorertools_spark.operators.similarity import (
        pq_assign_codes,
        train_pq_codebooks,
    )

    books = train_pq_codebooks(emb, n_sub=8, n_cent=16)
    codes = pq_assign_codes(emb, books)
    bad = codes.filter(
        (F.size("pq_code") != 8)
        | F.exists("pq_code", lambda c: (c < 0) | (c >= 16))
    ).count()
    assert bad == 0
    assert codes.count() == emb.count()


def test_isotropy_probe_random_vs_collapsed(spark):
    from seaexplorertools_spark.operators.similarity import isotropy_probe
    import numpy as np

    rng = np.random.RandomState(3)
    # healthy: random gaussian vectors -> mean cosine ~ 0
    healthy = [(i, rng.randn(16).tolist()) for i in range(200)]
    h = spark.createDataFrame(healthy, ["vec_id", "embedding"])
    hp = {r["stride"]: r for r in isotropy_probe(h, strides=(1, 7)).collect()}
    assert abs(hp[1]["mean_cos"]) < 0.15 and abs(hp[7]["mean_cos"]) < 0.15
    assert hp[1]["n_pairs"] == 199 and hp[7]["n_pairs"] == 193

    # collapsed: every vector = shared direction + small noise -> mean near 1
    base = rng.randn(16)
    collapsed = [(i, (base + 0.05 * rng.randn(16)).tolist()) for i in range(200)]
    c = spark.createDataFrame(collapsed, ["vec_id", "embedding"])
    cp = {r["stride"]: r for r in isotropy_probe(c, strides=(1,)).collect()}
    assert cp[1]["mean_cos"] > 0.95
