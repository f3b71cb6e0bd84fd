"""Frequent-pair co-occurrence mining and association rules — the
market-basket readout (which items/brands/sources appear together) that a
curation pipeline runs to find correlated data sources before mixing.

Scale shape (round 9): baskets are reduced to one row per basket holding
the sorted DISTINCT item array (ONE groupBy — ``collect_set`` dedupes
in-aggregate, so the former separate distinct pass is gone), and pairs
are generated in-JVM per basket row from the sorted array (ordered
combinations via ``transform``/``slice`` — no basket-keyed self-join, no
re-shuffle of the presence matrix). Pair volume is still
Σ_b k_b·(k_b−1)/2, bounded by the per-basket distinct-item count, never
by |baskets|² or |items|²; the marginals and basket count reuse the same
cached basket-array frame. With a bounded item vocabulary per basket
(brands, categories, sources — the curation case) this is linear in
baskets. For unbounded per-basket cardinality, cap k per basket upstream
(top-k items by weight) — the classic a-priori guard; a single
mega-basket lands its k²/2 pair generation in one task under this shape,
which that same cap bounds.

Counts are BIGINT-exact; supports/confidence/lift are single divisions of
exact integers, so results are bit-identical on any engine with no
rounding step. (The round-9 rewrite changes only the plan: the old
self-join form produced identical rows — A/B verified exact-equal — at
~2× the wall time, because the presence matrix was recomputed for every
consumer and re-shuffled for both self-join sides.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import consistency_cache


def basket_items(df: DataFrame, basket_col: str, item_col: str) -> DataFrame:
    """Distinct (basket, item) pairs — the presence matrix."""
    return df.select(basket_col, item_col).distinct()


def _basket_arrays(df: DataFrame, basket_col: str, item_col: str) -> DataFrame:
    """One row per basket with its sorted distinct item array — the
    single-shuffle presence representation every consumer below shares."""
    return df.groupBy(basket_col).agg(
        F.sort_array(F.collect_set(item_col)).alias("__its")
    )


def _pairs_from_arrays(arr: DataFrame, min_support: int) -> DataFrame:
    """Ordered-combination pair counts from the basket-array frame:
    (a, b) with a < b emitted in-JVM per basket row, then one count
    aggregate (map-side combinable)."""
    its = F.col("__its")
    combos = F.flatten(
        F.transform(
            its,
            lambda x, i: F.transform(
                F.slice(its, i + F.lit(2), F.greatest(F.size(its) - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("item_a"), y.alias("item_b")),
            ),
        )
    )
    return (
        arr.select(F.explode(combos).alias("p"))
        .select("p.item_a", "p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("pair_n"))
        .filter(F.col("pair_n") >= min_support)
    )


def cooccurrence_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Pair co-occurrence counts across baskets: for every unordered item
    pair (a < b), in how many baskets do both appear? One groupBy to the
    sorted distinct-item array per basket, in-JVM ordered-combination
    explode, one count aggregate. ``min_support`` prunes the long tail
    before it ever leaves the aggregate."""
    return _pairs_from_arrays(_basket_arrays(df, basket_col, item_col), min_support)


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Pair association metrics: support counts plus confidence(a→b),
    confidence(b→a) and lift — P(ab)/(P(a)·P(b)) — for every pair above
    ``min_support``. The basket-array frame is consistency-cached and
    feeds all three consumers (basket count, item marginals, pair
    counts), so the presence matrix is computed exactly once; marginals
    broadcast back onto the (small, support-pruned) pair table. All
    inputs to the divisions are exact BIGINT counts, so every metric is a
    deterministic IEEE division — bit-identical cross-engine."""
    arr = consistency_cache(_basket_arrays(df, basket_col, item_col))
    n_baskets = arr.count()  # populates the cache for the two consumers below
    marg = (
        arr.select(F.explode("__its").alias(item_col))
        .groupBy(item_col)
        .agg(F.count("*").alias("item_n"))
    )
    pairs = _pairs_from_arrays(arr, min_support)
    ma = marg.select(F.col(item_col).alias("item_a"), F.col("item_n").alias("n_a"))
    mb = marg.select(F.col(item_col).alias("item_b"), F.col("item_n").alias("n_b"))
    out = pairs.join(F.broadcast(ma), "item_a").join(F.broadcast(mb), "item_b")
    pn = F.col("pair_n").cast("double")
    return out.select(
        "item_a",
        "item_b",
        "pair_n",
        "n_a",
        "n_b",
        (pn / F.col("n_a").cast("double")).alias("conf_a_b"),
        (pn / F.col("n_b").cast("double")).alias("conf_b_a"),
        (
            pn
            * F.lit(float(n_baskets))
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
        ).alias("lift"),
    )
