"""Deterministic sampling for training-data pipelines (engine addition).

Hash-threshold sampling: u(key) = md5(key)[:8] as uint32 / 2³² gives every
row a stable uniform [0, 1) draw derived only from its key — so samples
are reproducible across runs, clusters, and engines (the DuckDB oracle
computes the identical value), composable (nested samples of increasing
fraction are supersets), and embarrassingly parallel (a map-side filter:
no shuffle, no RNG state, no seed coordination across executors — the
property that matters at 100 TB, where `df.sample()`'s per-partition RNG
is neither stable under repartitioning nor reproducible across engines).

Stratified variant: per-stratum fractions (e.g. rebalance languages in a
corpus) via one map-literal lookup — still a pure map-side filter.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hash_uniform(key: Column, salt: str = "") -> Column:
    """Stable uniform [0, 1) draw from a key: first 8 md5 hex chars as
    uint32 over 2³². Exact in double (uint32 < 2⁵³); portable to any engine
    with md5. ``salt`` decorrelates independent sampling decisions made
    from the same key (e.g. train/val/test splits)."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(4294967296.0)


def sample_fraction(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically by key."""
    return df.filter(hash_uniform(F.col(key_col), salt) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum hash-threshold sampling: stratum → fraction, unlisted
    strata get ``default``. One map-side filter, no shuffle."""
    frac_map = F.create_map(
        *chain.from_iterable(
            (F.lit(k), F.lit(float(v))) for k, v in sorted(fractions.items())
        )
    )
    thr = F.coalesce(frac_map[F.col(strata_col)], F.lit(float(default)))
    return df.filter(hash_uniform(F.col(key_col), salt) < thr)


def reservoir_per_group(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    k: int,
    salt: str = "",
    over: float = 4.0,
) -> DataFrame:
    """EXACTLY min(k, |group|) rows per group, uniform without replacement,
    deterministic: rank rows by (hash draw, key) within each group and
    keep the k smallest — the distributed, rerun-stable equivalent of
    per-group reservoir sampling. Adds ``sample_rank`` (1..k).

    Scale path: sorting whole groups just to keep k is wasted work when
    groups are huge, so rows are pre-pruned to draws below
    ``min(1, over*k/|group|)`` (group sizes from one count aggregate)
    before the window — the sort then touches ~over*k rows per group
    instead of |group|. The prune is made EXACT, not probabilistic: any
    group left deficient by the prune (P ≈ exp(-k(over-1-ln over)) —
    vanishing for over=4, but nonzero) is recomputed through the
    full-group window and unioned back, so the output is bit-identical to
    the unpruned formulation (the DuckDB oracle) in every case."""
    u = hash_uniform(F.col(key_col), salt)
    src = df.withColumn("__u", u)
    counts = src.groupBy(*group_cols).agg(F.count("*").alias("__n"))
    thr = F.least(F.lit(1.0), F.lit(float(over * k)) / F.col("__n"))
    pre = src.join(counts, group_cols).filter(F.col("__u") < thr)
    w = Window.partitionBy(*group_cols).orderBy("__u", key_col)
    ranked = pre.withColumn("sample_rank", F.row_number().over(w))
    kept = ranked.filter(F.col("sample_rank") <= k)
    # exactness patch-up: groups whose prune kept fewer than min(k, n) —
    # LEFT join from counts so a group the prune emptied entirely (absent
    # from kept) is still detected
    kept_counts = kept.groupBy(*group_cols).agg(F.count("*").alias("__kept"))
    short = (
        counts.join(kept_counts, group_cols, "left")
        .filter(
            F.coalesce(F.col("__kept"), F.lit(0)) < F.least(F.lit(k), F.col("__n"))
        )
        .select(*group_cols)
    )
    fallback = (
        src.join(short, group_cols, "left_semi")
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )
    good = kept.join(short, group_cols, "left_anti").drop("__n")
    return good.unionByName(fallback).drop("__u")


def weighted_sample_per_group(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Weighted sampling without replacement, EXACTLY min(k, |group|) rows
    per group, deterministic (Efraimidis–Spirakis A-ES): each row draws
    ``key = u^(1/w)`` from its stable hash-uniform ``u`` and weight ``w``;
    the k largest keys per group are the sample — inclusion probability
    proportional to weight, reproducible across runs and engines. Adds
    ``sample_rank`` (1 = largest key).

    Scale path: a giant group never sorts whole. A first window over
    (group, spark_partition_id()) keeps the local top-k of each physical
    partition — a map-side top-k combine, shuffling on a key that is
    |partitions|× finer than the group — and only those ≤ k·|partitions|
    survivors meet the final per-group window. Any row cut by the local
    pass is dominated by k better rows in its own partition, so it cannot
    be in the global top-k: the two-phase result is bit-identical to the
    single-window formulation (the DuckDB oracle). Rows with
    non-positive/null weight are excluded (P=0 under A-ES)."""
    u = hash_uniform(F.col(key_col), salt)
    w_val = F.col(weight_col).cast("double")
    es_key = F.pow(u, F.lit(1.0) / w_val)
    src = (
        df.filter(w_val > 0)
        .withColumn("__es", es_key)
        .withColumn("__part", F.spark_partition_id())
    )
    local_w = Window.partitionBy(*group_cols, "__part").orderBy(
        F.desc("__es"), key_col
    )
    survivors = (
        src.withColumn("__lr", F.row_number().over(local_w))
        .filter(F.col("__lr") <= k)
        .drop("__lr", "__part")
    )
    final_w = Window.partitionBy(*group_cols).orderBy(F.desc("__es"), key_col)
    return (
        survivors.withColumn("sample_rank", F.row_number().over(final_w))
        .filter(F.col("sample_rank") <= k)
        .drop("__es")
    )


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "cap_rank",
) -> DataFrame:
    """Deterministic per-group top-k — the DOMAIN-CAP primitive of a
    pretraining mix ("keep at most k documents per source, best first"):
    rank rows within each group by ``order_cols`` and keep ranks 1..k.
    ``order_cols`` must be a TOTAL order (include a unique tiebreaker,
    e.g. the document id) so the kept set is reproducible across runs,
    engines, and physical layouts. Adds ``rank_col`` (1..k).

    Scale path: a giant group never sorts whole. A first window over
    (group, spark_partition_id()) keeps the local top-k of each physical
    partition — a map-side top-k combine on a key |partitions|× finer
    than the group — and only those ≤ k·|partitions| survivors meet the
    final per-group window. Any row cut locally is dominated by k
    better rows of its own group in its own partition, so it cannot be
    in the global top-k: bit-identical to the single-window formulation
    (the DuckDB oracle) on every input."""
    src = df.withColumn("__part", F.spark_partition_id())
    local_w = Window.partitionBy(*group_cols, "__part").orderBy(*order_cols)
    survivors = (
        src.withColumn("__lr", F.row_number().over(local_w))
        .filter(F.col("__lr") <= k)
        .drop("__lr", "__part")
    )
    final_w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return survivors.withColumn(rank_col, F.row_number().over(final_w)).filter(
        F.col(rank_col) <= k
    )


def upsample_by_repeats(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    repeats: dict[str, float],
    salt: str = "up",
    copy_col: str = "copy_id",
) -> DataFrame:
    """Epoch construction with FRACTIONAL repeat factors: stratum s is
    emitted ``floor(r_s)`` times plus one more copy with probability
    ``frac(r_s)`` via the stable per-key hash draw — the upsampling half
    of domain mixing (the GPT-3-style "books ×2.9" table), complementing
    ``stratified_sample``/mixture resampling which can only keep or drop.
    In expectation stratum s contributes exactly ``r_s · n_s`` rows, and
    the realization is deterministic (reproducible across runs, engines,
    and repartitioning, like every draw in this module).

    Pure map work: a literal per-stratum (base, frac) lookup, then one
    ``sequence``-explode — no shuffle, no driver state beyond the repeat
    dict itself (|strata| floats). Row inflation equals the repeat
    factor by design; downstream shuffles see the post-upsample volume,
    which is the number the mixture designer chose. Unlisted strata get
    0 copies (dropped)."""
    base_map = F.create_map(
        *chain.from_iterable(
            (F.lit(s), F.lit(int(r))) for s, r in sorted(repeats.items())
        )
    )
    frac_map = F.create_map(
        *chain.from_iterable(
            (F.lit(s), F.lit(float(r) - int(r))) for s, r in sorted(repeats.items())
        )
    )
    u = hash_uniform(F.col(key_col), salt)
    reps = (
        F.coalesce(base_map[F.col(strata_col)], F.lit(0))
        + F.when(u < F.coalesce(frac_map[F.col(strata_col)], F.lit(0.0)), 1)
        .otherwise(0)
    ).cast("bigint")
    return (
        df.withColumn("__reps", reps)
        .filter(F.col("__reps") >= 1)
        .withColumn(
            copy_col,
            F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("__reps"))),
        )
        .drop("__reps")
    )
