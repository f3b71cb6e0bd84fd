"""k-means (Lloyd) iterative-algorithm tests: SSE monotonicity across
iterations, determinism across runs, and assignment sanity on a crafted
two-cluster fixture. The oracle-parity check of the assignment step is the
q_kmeans_assign contract query."""

from __future__ import annotations

from seaexplorertools_spark.contract import table
from seaexplorertools_spark.operators.clustering import kmeans_lloyd


def test_kmeans_sse_monotone_and_deterministic(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    assign1, cent1, sse1 = kmeans_lloyd(e, k=8, n_iter=3)
    # Lloyd guarantees non-increasing SSE (tiny float slack for re-summation)
    assert all(b <= a * (1 + 1e-9) for a, b in zip(sse1, sse1[1:])), sse1
    assert sse1[-1] < sse1[0]  # it actually improved on this fixture
    _, cent2, sse2 = kmeans_lloyd(e, k=8, n_iter=3)
    assert sse1 == sse2 and cent1 == cent2  # fully deterministic
    n = e.count()
    assert assign1.count() == n  # every vector assigned exactly once


def test_kmeans_separates_obvious_clusters(spark):
    rows = [(i, [10.0 + 0.01 * i, 10.0]) for i in range(5)] + [
        (10 + i, [-10.0 - 0.01 * i, -10.0]) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assign, cents, sse = kmeans_lloyd(df, k=2, n_iter=3)
    got = {r["vec_id"]: r["cluster"] for r in assign.collect()}
    pos = {got[i] for i in range(5)}
    neg = {got[10 + i] for i in range(5)}
    assert len(pos) == 1 and len(neg) == 1 and pos != neg
    assert cents[0][0] * cents[1][0] < 0  # centroids on opposite sides
