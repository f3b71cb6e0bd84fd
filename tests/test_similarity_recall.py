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


def test_jl_projection_preserves_distances_and_neighbors(spark, sf_dir):
    """JL lemma in practice: 64→16 ±1 projection keeps pairwise squared
    distances within (1±ε) on average and retains most exact nearest
    neighbors; and the projection is a pure map (no shuffle)."""
    import numpy as np

    from seaexplorertools_spark.operators.similarity import jl_project

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    proj = jl_project(emb, "embedding", d_in=64, d_out=16, id_cols=["vec_id"])
    assert "Exchange" not in proj._jdf.queryExecution().executedPlan().toString()

    rows = emb.select("vec_id", "embedding").collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = [r["vec_id"] for r in rows]
    prows = proj.collect()
    order = {r["vec_id"]: k for k, r in enumerate(prows)}
    P = np.array(
        [[prows[order[v]][f"proj_{j:02d}"] for j in range(16)] for v in ids]
    )

    rng = np.random.default_rng(7)
    n = len(ids)
    pairs = rng.choice(n, size=(200, 2))
    pairs = pairs[pairs[:, 0] != pairs[:, 1]]
    d_full = ((X[pairs[:, 0]] - X[pairs[:, 1]]) ** 2).sum(axis=1)
    d_proj = ((P[pairs[:, 0]] - P[pairs[:, 1]]) ** 2).sum(axis=1)
    ratio = d_proj / d_full
    # E[ratio] = 1; spread ~ sqrt(2/d_out) ≈ 0.35 per pair, tight in mean
    assert 0.9 < ratio.mean() < 1.1
    assert np.percentile(ratio, 5) > 0.4 and np.percentile(ratio, 95) < 1.7

    # Neighbor recall is NOT asserted on the parquet fixture: uniform
    # random vectors are the distance-concentration worst case — the
    # relative gaps between a point's neighbors are far smaller than
    # JL's ε ≈ √(ln N / d_out), so no 16-dim sketch can rank them
    # (measured recall ~0.1 here; same for any projection). On CLUSTERED
    # data — the case JL fronts in real ANN pipelines — cluster-mates
    # stay nearest:
    centers = rng.normal(size=(20, 64)) * 3.0
    pts = np.repeat(centers, 10, axis=0) + rng.normal(size=(200, 64)) * 0.3
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(200)],
        "vec_id bigint, embedding array<float>",
    )
    cp = jl_project(cdf, "embedding", d_in=64, d_out=16, id_cols=["vec_id"])
    crows = sorted(cp.collect(), key=lambda r: r["vec_id"])
    CP = np.array([[r[f"proj_{j:02d}"] for j in range(16)] for r in crows])

    def topk(M, qi, k=9):
        d = ((M - M[qi]) ** 2).sum(axis=1)
        d[qi] = np.inf
        return set(np.argsort(d, kind="stable")[:k])

    Xc = pts.astype(np.float32).astype(np.float64)  # what Spark saw
    recalls = [
        len(topk(Xc, qi) & topk(CP, qi)) / 9 for qi in range(0, 200, 10)
    ]
    assert sum(recalls) / len(recalls) > 0.85


def test_hard_negatives_label_exclusion_and_consistency(spark, sf_dir):
    """Every mined negative has a label different from its query's, and
    the result equals the label-filtered re-rank of the unfiltered exact
    top list (the filter changes the candidate set, not the ordering)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from seaexplorertools_spark.operators.similarity import (
        brute_force_topk,
        hard_negatives,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    k = 4
    got = hard_negatives(e, qs, k=k)

    labels = {r["vec_id"]: r["label"] for r in e.select("vec_id", "label").collect()}
    rows = got.collect()
    assert rows, "mining returned nothing"
    for r in rows:
        assert r["neg_label"] == labels[r["nbr_id"]]
        assert r["neg_label"] != labels[r["query_id"]]

    # consistency: full exact ranking (k = N), drop same-label rows,
    # re-rank, take k — must equal the mined set exactly
    n = e.count()
    full = brute_force_topk(e, qs.select("query_id", "embedding"), k=n)
    qlab = qs.select("query_id", F.col("label").alias("q_label"))
    nlab = e.select(F.col("vec_id").alias("nbr_id"), F.col("label").alias("neg_label"))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("nbr_id").asc())
    ref = (
        full.join(qlab, "query_id")
        .join(nlab, "nbr_id")
        .filter(F.col("neg_label") != F.col("q_label"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "nbr_id", "neg_label", "sim")
    )

    def key_set(df):
        return {tuple(r) for r in df.collect()}

    assert key_set(got) == key_set(ref)
