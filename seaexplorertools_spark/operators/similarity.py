"""Similarity search over embedding columns (engine additions).

- Brute-force cosine top-k: the exact baseline. Expressed with
  ``F.zip_with`` + ``F.aggregate`` (JVM-side, no UDF); the candidate set is
  a crossJoin bounded by a blocking predicate, ranked per query with a
  window.
- LSH-bucketed variant (scale path): random-hyperplane signs bucket the
  vectors; candidates only join within a bucket. At 100 TB the bucket join
  replaces the cross join — recall is tunable via n_planes/bands.

Determinism for oracle checks: dot products are computed left-to-right over
the array (same order as DuckDB's list_dot_product); similarity is rounded
before ranking and ties break on vec_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query. ``queries`` has (query_id, embedding).

    The N×M candidate matrix is a crossJoin — correct baseline at any
    scale where M (queries per batch) is bounded; for large M use
    ``lsh_topk``. Rank = row_number over (rounded sim desc, vec_id asc).
    """
    # norms are precomputed per side (NOT per candidate pair — the naive
    # cosine() recomputes each norm |candidates| times; precomputation is
    # bit-identical since the arithmetic is unchanged, just not repeated)
    e = embeddings.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).cast("array<double>").alias("v_e"),
    ).withColumn("n_e", norm(F.col("v_e")))
    qdf = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("v_q"),
    ).withColumn("n_q", norm(F.col("v_q")))
    sim_expr = dot(F.col("v_q"), F.col("v_e")) / F.nullif(
        F.col("n_q") * F.col("n_e"), F.lit(0.0)
    )
    sim = (
        qdf.crossJoin(e)
        .filter(F.col("nbr_id") != F.col("query_id"))
        .withColumn("sim", F.round(sim_expr, 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("nbr_id").asc())
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "nbr_id", "sim")
    )


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id from fixed hyperplanes (random-projection LSH).
    planes is a small driver-side list → pure expressions, no UDF."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        d = F.aggregate(
            F.zip_with(
                vec, F.array(*[F.lit(float(x)) for x in p]), lambda x, y: x * y
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(d >= 0, F.lit(2 ** i)).otherwise(F.lit(0))
    return bucket


def ivf_assign(df: DataFrame, centroids: list[tuple[int, list[float]]], vec_col: str = "v") -> DataFrame:
    """Assign each vector to its nearest centroid (IVF coarse quantizer).
    ``centroids`` is a small driver-side list [(cell_id, vector)].

    The per-cell similarities are materialized ONCE into an array column and
    the argmax is ``array_position(sims, array_max(sims))`` — a cascaded
    when(best_sim < sim, ...) chain would re-inline every previous cosine
    into each branch and blow the expression tree up exponentially
    (observed 200× slowdown)."""
    sims = F.array(
        *[
            cosine(F.col(vec_col), F.array(*[F.lit(float(x)) for x in cvec]))
            for _, cvec in centroids
        ]
    )
    df = df.withColumn("__sims", sims)
    # first maximal cell wins ties (deterministic); centroid order == cell id
    cell = (F.array_position(F.col("__sims"), F.array_max(F.col("__sims"))) - 1).cast("int")
    return df.withColumn("ivf_cell", cell).drop("__sims")


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    n_cells: int = 8,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-style approximate top-k: a deterministic coarse quantizer (the
    first n_cells vectors serve as centroids — a real system would k-means
    them; the partition/search plumbing is identical), candidates restricted
    to the query's cell via equi-join.

    At 100 TB: the inverted lists are just a partitioned table keyed by
    ivf_cell; a query touches |cell| candidates instead of N. Recall is
    tuned by n_cells / nprobe (single-probe here)."""
    cent_rows = (
        embeddings.orderBy(id_col)
        .limit(n_cells)
        .select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    centroids = [(i, list(r["v"])) for i, r in enumerate(cent_rows)]
    e = ivf_assign(
        embeddings.select(
            F.col(id_col).alias("nbr_id"), F.col(vec_col).cast("array<double>").alias("v")
        ),
        centroids,
        "v",
    ).select("nbr_id", F.col("v").alias("v_e"), "ivf_cell")
    qdf = ivf_assign(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("v")
        ),
        centroids,
        "v",
    ).select("query_id", F.col("v").alias("v_q"), "ivf_cell")
    sim = (
        qdf.join(e, "ivf_cell")
        .filter(F.col("nbr_id") != F.col("query_id"))
        .withColumn("sim", F.round(cosine(F.col("v_q"), F.col("v_e")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("nbr_id").asc())
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "nbr_id", "sim")
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's hyperplane
    bucket (equi-join on bucket instead of crossJoin). Recall < 1; the
    100 TB path — bucket cardinality 2^n_planes bounds each join group."""
    e = embeddings.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).cast("array<double>").alias("v_e"),
    ).withColumn("bucket", hyperplane_bucket(F.col("v_e"), planes))
    qdf = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("v_q"),
    ).withColumn("bucket", hyperplane_bucket(F.col("v_q"), planes))
    sim = (
        qdf.join(e, "bucket")
        .filter(F.col("nbr_id") != F.col("query_id"))
        .withColumn("sim", F.round(cosine(F.col("v_q"), F.col("v_e")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("nbr_id").asc())
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "nbr_id", "sim")
    )
