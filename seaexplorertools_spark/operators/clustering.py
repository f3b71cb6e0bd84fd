"""Iterative k-means (Lloyd) over the embedding column — the engine's
iterative-algorithm surface, and the quality upgrade path for IVF ANN
centroids (`operators/similarity.py` uses hash-sampled centroids by
default; `kmeans_lloyd` output plugs into the same bucketed search).

Spark shape (the standard distributed Lloyd iteration):

- assignment: broadcast the k centroids (k x dim rows — tiny) and take the
  arg-min squared distance per vector with a window; distance uses the
  dot-product identity ||v-c||^2 = v.v - 2 v.c + c.c so the JVM array
  aggregate from `similarity.dot` is reused and v.v can be computed once.
- update: posexplode the assigned vectors, average per (cluster, dim) —
  one shuffle of |N| x dim rows with map-side partial combine — and
  collect k x dim means back to the driver for the next broadcast.

The only driver-side data is the centroid set (k x dim) and the SSE
scalar per iteration — the collect boundary every distributed k-means has.
Determinism: init is the k lowest-id vectors, distances are rounded to
6 dp before the arg-min (engine-portable), ties break on centroid id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..caching import consistency_cache
from ..functions.litarrays import bigint_array, double_array

from .similarity import dot


def assign_clusters(
    vecs: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    c_id_col: str = "c_id",
    c_vec_col: str = "cv",
) -> DataFrame:
    """Nearest-centroid assignment: broadcast cross join (|N| x k rows,
    never materialized wider than the window) + per-vector arg-min on the
    ROUNDED squared distance with centroid-id tiebreak. Returns
    (id, cluster, d2)."""
    v = F.col(vec_col)
    cv = F.col(c_vec_col)
    d2 = dot(v, v) - F.lit(2.0) * dot(v, cv) + dot(cv, cv)
    joined = vecs.crossJoin(F.broadcast(centroids)).withColumn("__d2", F.round(d2, 6))
    w = Window.partitionBy(id_col).orderBy(F.col("__d2").asc(), F.col(c_id_col).asc())
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, F.col(c_id_col).alias("cluster"), F.col("__d2").alias("d2"))
    )


def assign_clusters_literal(
    vecs: DataFrame,
    cent_rows: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "v",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """ZERO-SHUFFLE assignment for the Lloyd loop, where the centroids are
    already driver-side: per row, an array of rounded d² against literal
    centroids; argmin = array_position(array_min) — first minimal wins,
    which IS the lowest-c_id tiebreak because ``cent_rows`` is ordered by
    id. Identical semantics (and bit-identical rounded d²) to the
    windowed ``assign_clusters``, without the k× crossJoin row blowup or
    the per-vector window shuffle. v·v is staged once; c·c is a
    driver-computed literal (same left-to-right fold as the JVM
    aggregate). ``keep`` lists extra input columns to pass through
    unchanged (e.g. the vector itself for the update step), which lets
    the Lloyd loop avoid a per-iteration join back to the input."""
    v = F.col(vec_col)
    staged = vecs.withColumn("__vv", dot(v, v))
    d2s = F.array(
        *[
            F.round(
                F.col("__vv")
                - F.lit(2.0) * dot(v, double_array(cv))
                + F.lit(float(sum(x * x for x in cv))),
                6,
            )
            for _, cv in cent_rows
        ]
    )
    cids = bigint_array([int(cid) for cid, _ in cent_rows])
    staged = staged.withColumn("__d2s", d2s)
    best = F.array_min(F.col("__d2s"))
    pos = F.array_position(F.col("__d2s"), best)
    return staged.select(
        id_col,
        *keep,
        F.element_at(cids, pos.cast("int")).alias("cluster"),
        best.alias("d2"),
    )


def kmeans_lloyd(
    embeddings: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Distributed Lloyd k-means: ``n_iter`` rounds of broadcast-assign +
    per-dimension mean update. Returns (assignments DataFrame, centroids
    list[list[float]], sse_history list[float]). SSE is non-increasing
    across iterations (pinned in tests/test_clustering.py)."""
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    e = consistency_cache(e)  # scanned by every iteration's 3 actions
    # NOTE: unlike pca.py, NO pre-cache rebalance here — it was measured
    # and REJECTED (2.8 → 3.8 s at sf0.1): k-means' per-iteration actions
    # are many and individually light (assign is a literal-centroid map),
    # so 32-way task overhead × 9 actions outweighs the map parallelism
    # that pays off for PCA's single heavy aggregate per iteration
    init = (
        e.orderBy("vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("c_id"), F.col("v").alias("cv"))
    )
    cent_rows = [(i, r["cv"]) for i, r in enumerate(init.collect())]
    sse_history: list[float] = []
    assign = None
    for _ in range(n_iter):
        # literal-centroid assignment: no crossJoin, no per-vector window
        # shuffle — the centroids are already driver-side in the loop.
        # ``keep`` passes the vector through, so the update step needs no
        # join back to ``e`` (round 9: the per-iteration vec_id join was
        # a pure plan artifact — assignment is a map over e already).
        assign = assign_clusters_literal(e, cent_rows, keep=("v",))
        # ONE action per iteration (round 9, was two): the per-(cluster,
        # dim) mean aggregate also carries sum(d2); every vector repeats
        # its d2 at all ``dim`` positions, so the i=0 slice of the
        # per-(cluster, i) d2 sums IS the per-cluster SSE, and the global
        # SSE is their (cluster-ordered, deterministic) driver-side sum.
        dims = assign.select("cluster", "d2", F.posexplode("v").alias("i", "x"))
        means = (
            dims.groupBy("cluster", "i")
            .agg(F.avg("x").alias("m"), F.sum("d2").alias("sd"))
            .groupBy("cluster")
            .agg(
                F.array_sort(F.collect_list(F.struct("i", "m"))).alias("im"),
                F.max(F.when(F.col("i") == 0, F.col("sd"))).alias("sse_c"),
            )
            .select("cluster", F.col("im.m").alias("cv"), "sse_c")
        )
        mrows = sorted(means.collect(), key=lambda r: r["cluster"])
        sse_history.append(sum(r["sse_c"] for r in mrows))
        new_cent = {r["cluster"]: r["cv"] for r in mrows}
        # empty clusters keep their previous centroid (standard Lloyd detail)
        cent_rows = [(cid, new_cent.get(cid, cv)) for cid, cv in cent_rows]
    assign = assign.select("vec_id", "cluster", "d2")
    return assign, [cv for _, cv in cent_rows], sse_history
