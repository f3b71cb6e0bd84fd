"""Similarity search over embedding columns (engine additions).

- Brute-force cosine top-k: the exact baseline. Expressed with
  ``F.zip_with`` + ``F.aggregate`` (JVM-side, no UDF); the candidate set is
  a crossJoin bounded by a blocking predicate, ranked per query with a
  window.
- Banded hyperplane-LSH (scale path 1): OR-amplified random-projection
  signatures — ``n_bands`` independent bands of ``band_width`` sign bits
  each; a candidate pair needs ONE band collision (same construction as the
  MinHash banding in ``dedup.lsh_candidate_pairs``). Recall per neighbor at
  angular similarity p is 1 − (1 − p^r)^B — tunable, measured by
  ``tests/test_similarity_recall.py`` against the exact baseline.
- IVF (scale path 2): spherical k-means centroids trained driver-side on a
  DETERMINISTIC bounded sample, vectors assigned to their nearest cell
  (inverted lists = a table partitioned by ``ivf_cell``), queries probe
  their ``nprobe`` nearest cells.

At 100 TB the bucket/cell equi-joins replace the cross join; candidate
volume per query is Σ|colliding buckets| / Σ|probed cells|, not N. The
synthetic test fixture is UNIFORM-RANDOM (no cluster structure — the
adversarial case for ANN), so the default parameters are tuned for recall
≥ 0.9 there; on real clustered corpora the same mechanisms reach that
recall with far smaller candidate volume (n_cells ≈ √N, nprobe ≪ n_cells).

Determinism for oracle checks: dot products are computed left-to-right over
the array (same order as DuckDB's list_dot_product); similarity is rounded
before ranking and ties break on vec_id; planes/centroids derive from fixed
seeds and a hash-ordered sample, never from partition order.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..caching import consistency_cache
from ..functions.litarrays import double_array, double_matrix


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


def hard_negatives(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the k
    most cosine-similar vectors whose label DIFFERS from the query's —
    the near-but-wrong examples a contrastive loss learns the most from.
    ``queries`` has (query_id, embedding, label).

    Exact form: same |queries|-bounded crossJoin as ``brute_force_topk``
    (correct at any scale where the query batch is bounded). For large
    query batches, shortlist with ``lsh_topk``/``ivf_topk`` first and
    label-filter the shortlist — the label predicate composes with any
    candidate generator because it is a per-pair filter, not a ranking
    change. Rank = row_number over (rounded sim desc, nbr_id asc).
    """
    e = embeddings.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).cast("array<double>").alias("v_e"),
        F.col(label_col).alias("neg_label"),
    ).withColumn("n_e", norm(F.col("v_e")))
    qdf = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("v_q"),
        F.col(label_col).alias("q_label"),
    ).withColumn("n_q", norm(F.col("v_q")))
    sim_expr = dot(F.col("v_q"), F.col("v_e")) / F.nullif(
        F.col("n_q") * F.col("n_e"), F.lit(0.0)
    )
    sim = (
        qdf.crossJoin(e)
        .filter(
            (F.col("nbr_id") != F.col("query_id"))
            & (F.col("neg_label") != F.col("q_label"))
        )
        .withColumn("sim", F.round(sim_expr, 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("nbr_id").asc())
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "nbr_id", "neg_label", "sim")
    )


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id from fixed hyperplanes (random-projection LSH).
    planes is a small driver-side list → pure expressions, no UDF."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        d = F.aggregate(
            F.zip_with(vec, double_array(p), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(d >= 0, F.lit(2 ** i)).otherwise(F.lit(0))
    return bucket


def gaussian_planes(n: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for random-projection LSH."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, dim)).tolist()


def banded_signature(
    df: DataFrame,
    vec_col: str,
    planes: list[list[float]],
    band_width: int,
    expr_max_elems: int = 1024,
) -> DataFrame:
    """Add ``__bands`` — an array of per-band bucket ids (OR-amplified LSH).

    ``len(planes)`` must be ``n_bands * band_width``; band b's bucket is the
    integer formed by the sign bits of planes [b·r, (b+1)·r).

    Two equivalent row-local paths (identical output on any
    non-degenerate input — a sign could differ only for |dot| ≲ 1e-13,
    measure-zero for Gaussian planes; equality pinned in
    tests/test_similarity_recall.py): small plane matrices replay as JVM
    ``transform``/``aggregate`` expressions; past ``expr_max_elems`` total
    literals the matrix goes through an Arrow-batched pandas UDF doing ONE
    BLAS matmul per batch — a 5,120-literal expression tree falls out of
    whole-stage codegen into interpreted eval (measured 13 s at sf0.001,
    i.e. pure plan cost; the matmul path is ~20×), the same failure mode
    as the editdist probe-array rewrite."""
    n_bands, rem = divmod(len(planes), band_width)
    if rem:
        raise ValueError("len(planes) must be a multiple of band_width")
    if len(planes) * len(planes[0]) > expr_max_elems:
        import numpy as np
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        mat = np.array(planes, dtype=np.float64).T  # dim x n_planes
        weights = np.array(
            [1 << (band_width - 1 - (i % band_width)) for i in range(len(planes))],
            dtype=np.int64,
        )
        bands_ix = np.repeat(np.arange(n_bands), band_width)

        @pandas_udf("array<int>")
        def bands_udf(vecs):
            if len(vecs) == 0:
                return pd.Series([], dtype=object)
            x = np.array(vecs.tolist(), dtype=np.float64)  # batch x dim
            bits = (x @ mat >= 0).astype(np.int64)  # batch x n_planes
            out = np.zeros((len(x), n_bands), dtype=np.int64)
            np.add.at(out.T, bands_ix, (bits * weights).T)
            return pd.Series(list(out.astype(np.int32)))

        return df.withColumn("__bands", bands_udf(F.col(vec_col)))
    planes_col = double_matrix(planes)
    df = df.withColumn("__planes", planes_col)
    dots = F.transform(F.col("__planes"), lambda p: dot(F.col(vec_col), p))
    bits = F.transform(dots, lambda d: F.when(d >= 0, F.lit(1)).otherwise(F.lit(0)))
    df = df.withColumn("__bits", bits).drop("__planes")
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.aggregate(
            F.slice(F.col("__bits"), b * band_width + 1, band_width),
            F.lit(0),
            lambda acc, x: acc * 2 + x,
        ),
    )
    return df.withColumn("__bands", bands).drop("__bits")


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    band_width: int = 4,
    n_bands: int = 20,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k via banded (OR-amplified) hyperplane LSH.

    Candidate pairs = same bucket in ANY of the ``n_bands`` bands (explode
    band index → equi-join on (band, bucket) → distinct pair), exact cosine
    only on candidates, window top-k. Single-band AND-construction (the old
    design) gives one N/2^r-sized bucket join with unmeasured recall; the
    banded construction makes recall 1 − (1 − p^r)^B and each band's bucket
    ~N/2^r — skew-safe by construction, same shape as
    ``dedup.lsh_candidate_pairs``. Defaults (r=4, B=20) measure recall@5 ≈
    0.94 on the uniform-random fixture (see tests/test_similarity_recall.py);
    clustered real data needs far fewer bands.
    """
    planes = gaussian_planes(n_bands * band_width, dim, seed)
    e = banded_signature(
        embeddings.select(
            F.col(id_col).alias("nbr_id"),
            F.col(vec_col).cast("array<double>").alias("v_e"),
        ),
        "v_e",
        planes,
        band_width,
    ).select("nbr_id", "v_e", F.posexplode("__bands").alias("band", "bucket"))
    qdf = banded_signature(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("v_q"),
        ),
        "v_q",
        planes,
        band_width,
    ).select("query_id", "v_q", F.posexplode("__bands").alias("band", "bucket"))
    cand = (
        qdf.join(e, ["band", "bucket"])
        .filter(F.col("nbr_id") != F.col("query_id"))
        .select("query_id", "nbr_id", "v_q", "v_e")
        .distinct()  # a pair colliding in several bands scores ONCE
    )
    sim = cand.withColumn("sim", F.round(cosine(F.col("v_q"), F.col("v_e")), 6))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("nbr_id").asc())
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "nbr_id", "sim")
    )


def train_ivf_centroids(
    embeddings: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 1024,
    seed: int = 7,
    iters: int = 10,
) -> list[tuple[int, list[float]]]:
    """Spherical k-means centroids from a DETERMINISTIC, ENGINE-PORTABLE
    bounded sample.

    Sample = first ``sample_n`` rows by md5(id) (stable across runs,
    partitionings AND engines — DuckDB computes the identical hex
    string, which xxhash64 could not), sorted by id driver-side,
    unit-normalized; init = the ``n_cells`` lowest-id sample rows (the
    kmeans_lloyd lowest-id convention — replayable in SQL, unlike a
    seeded RNG pick); ``iters`` Lloyd rounds with cosine assignment on
    6-dp ROUNDED sims (first maximum wins ties) so the training
    trajectory is bit-replayable by the driver's DuckDB oracle. The
    collect is bounded by ``sample_n`` rows × dim doubles regardless of
    table size — the standard IVF training shape (train on a sample,
    assign the full table with broadcast centroids). ``seed`` is kept
    for API stability but no longer consumed."""
    rows = (
        embeddings.select(
            F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
        )
        .orderBy(F.md5(F.col(id_col).cast("string").cast("binary")), F.col(id_col))
        .limit(sample_n)
        .collect()
    )
    rows = sorted(rows, key=lambda r: r["id"])
    X = np.array([r["v"] for r in rows], dtype=np.float64)
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    C = X[:n_cells].copy()
    for _ in range(iters):
        sims = np.round(
            X @ C.T
            / (np.linalg.norm(X, axis=1, keepdims=True) * np.linalg.norm(C, axis=1)),
            6,
        )
        a = np.argmax(sims, axis=1)  # first max = lowest cell id on ties
        for j in range(n_cells):
            if (a == j).any():
                C[j] = X[a == j].mean(axis=0)
    return [(i, C[i].tolist()) for i in range(n_cells)]


def _cell_sims(df: DataFrame, centroids: list[tuple[int, list[float]]], vec_col: str) -> DataFrame:
    """Materialize per-cell cosine sims ONCE into ``__sims`` — a cascaded
    when(best_sim < sim, ...) chain would re-inline every previous cosine
    into each branch and blow the expression tree up exponentially
    (observed 200× slowdown). Sims are ROUNDED to 6 dp so the argmax /
    probe orderings are engine-deterministic (ties resolve on cell id
    identically here and in the DuckDB oracle replay)."""
    sims = F.array(
        *[
            F.round(cosine(F.col(vec_col), double_array(cvec)), 6)
            for _, cvec in centroids
        ]
    )
    return df.withColumn("__sims", sims)


def ivf_assign(df: DataFrame, centroids: list[tuple[int, list[float]]], vec_col: str = "v") -> DataFrame:
    """Assign each vector to its nearest centroid (IVF coarse quantizer)."""
    df = _cell_sims(df, centroids, vec_col)
    # first maximal cell wins ties (deterministic); centroid order == cell id
    cell = (F.array_position(F.col("__sims"), F.array_max(F.col("__sims"))) - 1).cast("int")
    return df.withColumn("ivf_cell", cell).drop("__sims")


def ivf_probe(
    df: DataFrame, centroids: list[tuple[int, list[float]]], nprobe: int, vec_col: str = "v"
) -> DataFrame:
    """Explode each row to its ``nprobe`` nearest cells (multi-probe search).
    Top-nprobe is JVM-side: sort (−sim, idx) structs, slice, extract idx."""
    df = _cell_sims(df, centroids, vec_col)
    pairs = F.zip_with(
        F.col("__sims"),
        F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
        lambda s, i: F.struct((-s).alias("ns"), i.alias("idx")),
    )
    probes = F.transform(F.slice(F.array_sort(pairs), 1, nprobe), lambda st: st["idx"])
    return (
        df.withColumn("__probe", probes)
        .drop("__sims")
        .withColumn("ivf_cell", F.explode("__probe"))
        .withColumn("ivf_cell", F.col("ivf_cell").cast("int"))
        .drop("__probe")
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    n_cells: int = 8,
    nprobe: int = 6,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    sample_n: int = 1024,
    seed: int = 7,
) -> DataFrame:
    """IVF approximate top-k: sampled spherical-k-means coarse quantizer,
    inverted lists via equi-join on cell, queries probe their ``nprobe``
    nearest cells.

    At 100 TB: the inverted lists are a table partitioned by ``ivf_cell``;
    a query touches Σ|probed cells| ≈ nprobe·N/n_cells candidates instead of
    N, and training cost is bounded by ``sample_n``. Defaults (8 cells,
    nprobe=6) measure recall@5 ≈ 0.93 on the uniform-random fixture (the
    no-structure worst case — see tests/test_similarity_recall.py); real
    clustered corpora use n_cells ≈ √N with nprobe ≪ n_cells."""
    centroids = train_ivf_centroids(
        embeddings, n_cells, id_col=id_col, vec_col=vec_col, sample_n=sample_n, seed=seed
    )
    e = ivf_assign(
        embeddings.select(
            F.col(id_col).alias("nbr_id"), F.col(vec_col).cast("array<double>").alias("v")
        ),
        centroids,
        "v",
    ).select("nbr_id", F.col("v").alias("v_e"), "ivf_cell")
    qdf = ivf_probe(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("v")
        ),
        centroids,
        nprobe,
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


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "q",
) -> DataFrame:
    """L2-normalize each vector, then symmetric int8 quantization:
    q_i = floor(y_i * 127 / max|y| + 0.5) — 4x storage reduction for
    embedding columns at 100 TB (the standard serving-index trick; dot
    products on int8 stay within ~1% of float cosine). All JVM array
    expressions (`transform`/`aggregate`), no UDF; the floor(+0.5) form is
    the same IEEE op sequence DuckDB runs, so values are engine-portable
    bit-for-bit (vs round()'s BigDecimal-vs-float divergence on ties).
    Adds `l2_norm`, `q_scale` (max|y|), and the int8 array `out_col`;
    zero-norm vectors yield NULL (guarded division)."""
    v = F.col(vec_col).cast("array<double>")
    df = df.withColumn("__nrm", norm(v))
    y = F.transform(v, lambda x: x / F.nullif(F.col("__nrm"), F.lit(0.0)))
    df = df.withColumn("__y", y)
    sc = F.array_max(F.transform(F.col("__y"), lambda x: F.abs(x)))
    df = df.withColumn("__sc", sc)
    q = F.transform(
        F.col("__y"),
        lambda x: F.floor(x * F.lit(127.0) / F.col("__sc") + F.lit(0.5)).cast("long"),
    )
    return (
        df.withColumn("l2_norm", F.col("__nrm"))
        .withColumn("q_scale", F.col("__sc"))
        .withColumn(out_col, q)
        .drop("__nrm", "__y", "__sc")
    )


def semdedup_pairs(
    vecs: DataFrame,
    centroids: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) semantic dedup: the
    pairwise cosine comparison runs only WITHIN a cluster — assignment to
    the nearest of k centroids bounds the candidate set to Σ|cluster|²
    instead of the all-pairs N², the same recall-precision split as the
    MinHash-LSH → exact-Jaccard pipeline (dedup.py) but in embedding
    space. Returns (id1, id2, cluster, sim) for rounded cosine ≥
    ``threshold``; drop the higher id of each pair (or feed the pairs to
    the connected-components canonical pick) to dedup.

    100 TB posture: centroids broadcast for assignment (k rows); the
    self-join shuffles each vector once, keyed by cluster. A runaway
    cluster is the skew risk — cap cluster radius by raising k (SemDeDup
    uses k ~ sqrt(N)) or re-cluster oversized cells recursively."""
    from .clustering import assign_clusters

    assigned = assign_clusters(vecs, centroids, id_col=id_col, vec_col=vec_col)
    # norms once per VECTOR, not per pair (the candidate set is quadratic
    # in cluster size — recomputing |v| inside the join triples the
    # per-pair array traversals); cache: both self-join sides reuse it
    va = (
        vecs.join(assigned.select(id_col, "cluster"), id_col)
        .withColumn("__n", norm(F.col(vec_col)))
    )
    va = consistency_cache(va)
    a = va.select(
        F.col(id_col).alias("id1"), F.col("cluster").alias("c1"),
        F.col(vec_col).alias("va"), F.col("__n").alias("na"),
    )
    b = va.select(
        F.col(id_col).alias("id2"), F.col("cluster").alias("c2"),
        F.col(vec_col).alias("vb"), F.col("__n").alias("nb"),
    )
    pairs = a.join(b, (F.col("c1") == F.col("c2")) & (F.col("id1") < F.col("id2")))
    sim = F.round(
        dot(F.col("va"), F.col("vb"))
        / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0)),
        6,
    )
    return (
        pairs.select("id1", "id2", F.col("c1").alias("cluster"), sim.alias("sim"))
        .filter(F.col("sim") >= F.lit(float(threshold)))
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-scale ANN path
# ---------------------------------------------------------------------------


def train_pq_codebooks(
    embeddings: DataFrame,
    n_sub: int = 8,
    n_cent: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 512,
    seed: int = 11,
    iters: int = 8,
) -> list[list[list[float]]]:
    """Per-subspace k-means codebooks from a deterministic, ENGINE-PORTABLE
    bounded sample (same training shape as ``train_ivf_centroids``: sample
    by md5(id), lowest-id init, 6-dp rounded assignment distances,
    driver-side numpy Lloyd, broadcast back as literals — every step
    replayable by the DuckDB oracle). Returns
    ``codebooks[sub][centroid][dim_sub]``. ``seed`` kept for API
    stability but no longer consumed.

    PQ is the quantizer that makes billion-vector ANN fit in memory: a
    64-dim float vector (256 B) compresses to ``n_sub`` uint8 codes
    (8 B, 32x) while distances stay computable from per-query lookup
    tables — the IVF-PQ layout every large-scale vector store uses."""
    rows = (
        embeddings.select(
            F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
        )
        .orderBy(F.md5(F.col(id_col).cast("string").cast("binary")), F.col(id_col))
        .limit(sample_n)
        .collect()
    )
    X = np.array([r["v"] for r in sorted(rows, key=lambda r: r["id"])], dtype=np.float64)
    dim = X.shape[1]
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    d_sub = dim // n_sub
    books: list[list[list[float]]] = []
    for s in range(n_sub):
        Xs = X[:, s * d_sub : (s + 1) * d_sub]
        C = Xs[:n_cent].copy()  # lowest-id init (rows are id-sorted)
        for _ in range(iters):
            d2 = np.round(((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), 6)
            a = np.argmin(d2, axis=1)  # first min = lowest code on ties
            for j in range(n_cent):
                if (a == j).any():
                    C[j] = Xs[a == j].mean(axis=0)
        books.append([c.tolist() for c in C])
    return books


def _sub_d2(vec_col: Column, start: int, cent: list[float]) -> Column:
    """Squared L2 distance between a vector slice and a literal centroid —
    pure codegen (zip_with + aggregate), no Python."""
    sub = F.slice(vec_col, start + 1, len(cent))
    c = double_array(cent)
    diff2 = F.zip_with(sub, c, lambda x, y: (x - y) * (x - y))
    return F.aggregate(diff2, F.lit(0.0), lambda acc, x: acc + x)


def pq_assign_codes(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector as ``n_sub`` small ints (nearest centroid per
    subspace). Embarrassingly parallel map — no shuffle; per-subspace
    distance arrays are materialized ONCE each (the cascaded-when blowup
    documented at ``_cell_sims`` applies here too)."""
    v = F.col(vec_col).cast("array<double>")
    d_sub = len(codebooks[0][0])
    out = df.select(F.col(id_col), v.alias("__v"))
    code_cols = []
    for s, book in enumerate(codebooks):
        # 6-dp rounded distances: code choice is engine-deterministic
        # (ties → lowest code), replayable by the DuckDB oracle
        arr = F.array(
            *[F.round(_sub_d2(F.col("__v"), s * d_sub, c), 6) for c in book]
        )
        out = out.withColumn(f"__d{s}", arr)
        code_cols.append(
            (F.array_position(F.col(f"__d{s}"), F.array_min(F.col(f"__d{s}"))) - 1)
            .cast("int")
            .alias(f"c{s}")
        )
    return out.select(id_col, F.array(*code_cols).alias("pq_code"))


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    n_sub: int = 8,
    n_cent: int = 16,
    k: int = 5,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """PQ-ADC top-k with exact re-rank — the standard two-stage recall
    design: (1) asymmetric-distance scan over 8-byte codes using a
    per-query lookup table (built driver-side from the bounded query
    batch, shipped as literals — no join), (2) exact cosine re-rank of
    the ``shortlist`` best candidates. Output schema matches
    ``brute_force_topk``; recall is pinned in
    tests/test_similarity_recall.py.

    100 TB posture: the code table is 16-32x smaller than the vectors, the
    ADC scan is codegen over int codes + literal LUTs (no vector reads),
    and only |queries| x shortlist full vectors are ever touched for the
    re-rank. Compose with IVF cells to skip most codes entirely."""
    spark = embeddings.sparkSession
    books = train_pq_codebooks(
        embeddings, n_sub=n_sub, n_cent=n_cent, id_col=id_col, vec_col=vec_col
    )
    codes = pq_assign_codes(embeddings, books, id_col=id_col, vec_col=vec_col)

    d_sub = len(books[0][0])
    qrows = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("vq"),
    ).collect()
    # per-query ADC lookup table: lut[s][c] = ||q_sub - centroid||^2
    lut_rows = []
    for r in qrows:
        q = np.array(r["vq"], dtype=np.float64)
        lut = [
            [float(((q[s * d_sub : (s + 1) * d_sub] - np.array(c)) ** 2).sum()) for c in book]
            for s, book in enumerate(books)
        ]
        lut_rows.append((r["query_id"], lut))
    luts = spark.createDataFrame(lut_rows, "query_id long, lut array<array<double>>")

    cand = codes.crossJoin(F.broadcast(luts)).filter(F.col(id_col) != F.col("query_id"))
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(n_sub - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            F.element_at(F.col("lut"), s.cast("int") + 1),
            F.element_at(F.col("pq_code"), s.cast("int") + 1) + 1,
        ),
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.round(adc, 6).asc(), F.col(id_col).asc()
    )
    short = (
        cand.withColumn("__adc_rn", F.row_number().over(w_adc))
        .filter(F.col("__adc_rn") <= shortlist)
        .select("query_id", F.col(id_col).alias("nbr_id"))
    )

    e = embeddings.select(
        F.col(id_col).alias("nbr_id"), F.col(vec_col).cast("array<double>").alias("ve")
    ).withColumn("ne", norm(F.col("ve")))
    qv = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("vq"),
        )
        .withColumn("nq", norm(F.col("vq")))
    )
    sim = F.round(
        dot(F.col("vq"), F.col("ve")) / F.nullif(F.col("nq") * F.col("ne"), F.lit(0.0)), 6
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("nbr_id").asc())
    return (
        short.join(e, "nbr_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "nbr_id", "sim")
    )


def isotropy_probe(
    embeddings: DataFrame,
    strides: tuple[int, ...] = (1, 7, 31),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space health probe: mean/extreme cosine over
    DETERMINISTIC id-stride pairs (i, i+s) for each stride — an isotropic
    (healthy) embedding space has near-zero mean pairwise cosine, while a
    collapsed/anisotropic one (a known failure of contrastively trained
    encoders) shows a large positive mean. Stride pairing gives a
    reproducible linear-volume sample of the pair space: each stride is
    ONE equi-join on id (no crossJoin, no RNG), so the probe costs
    O(strides · N) at any scale."""
    base = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    outs = []
    for s in strides:
        a = base.select((F.col("id") + F.lit(int(s))).alias("id"), F.col("v").alias("va"))
        j = a.join(base.select("id", F.col("v").alias("vb")), "id")
        outs.append(
            j.select(
                F.lit(int(s)).alias("stride"),
                F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"),
            )
        )
    allp = outs[0]
    for o in outs[1:]:
        allp = allp.unionByName(o)
    return allp.groupBy("stride").agg(
        F.count("*").alias("n_pairs"),
        F.avg("cos").alias("mean_cos"),
        F.min("cos").alias("min_cos"),
        F.max("cos").alias("max_cos"),
    )


def jl_sign(i: int, j: int) -> int:
    """Deterministic Rademacher entry of the JL projection matrix: +1 or
    −1 from the first md5 hex nibble of ``"i:j"``. Same function on every
    engine/run — the matrix is part of the model spec, like a seed."""
    import hashlib

    return 1 if int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[0], 16) % 2 == 0 else -1


def jl_project(
    df: DataFrame,
    vec_col: str,
    d_in: int,
    d_out: int = 16,
    id_cols: list[str] | None = None,
    out_prefix: str = "proj_",
) -> DataFrame:
    """Johnson–Lindenstrauss random projection of an embedding column to
    ``d_out`` dims with a ±1 (Rademacher/Achlioptas) matrix scaled by
    1/√d_out — the dimensionality-reduction scale path in front of ANN:
    at 100 TB, projecting 1024-dim vectors to 16–64 dims before
    LSH/IVF/brute-force shrinks every downstream dot product, shuffle
    byte count, and broadcast by the same factor while preserving
    pairwise distances to (1 ± ε), ε ≈ √(ln N / d_out).

    Entirely JVM expression work: each output dim is an explicit
    left-associated sum of ±element terms (no UDF, no shuffle — a pure
    map). Determinism is stronger than usual here: left-associated IEEE
    addition of CAST(float AS DOUBLE) terms times ±1.0, scaled by a
    power of two when ``d_out`` is one (16 → ×0.25), is BIT-EXACT across
    engines — the DuckDB oracle needs no rounding tolerance at all.

    Output: ``id_cols`` + ``d_out`` DOUBLE columns ``{out_prefix}00..``.
    """
    ids = id_cols if id_cols is not None else [c for c in df.columns if c != vec_col]
    scale = 1.0 / (d_out ** 0.5)
    outs = []
    for j in range(d_out):
        terms = " + ".join(
            f"CAST(element_at({vec_col}, {i + 1}) AS DOUBLE) * {jl_sign(i, j)}.0"
            for i in range(d_in)
        )
        outs.append(F.expr(f"({terms}) * {scale!r}").alias(f"{out_prefix}{j:02d}"))
    return df.select(*ids, *outs)
