"""Frequent-pair co-occurrence mining and association rules — the
market-basket readout (which items/brands/sources appear together) that a
curation pipeline runs to find correlated data sources before mixing.

Scale shape: baskets are reduced to DISTINCT items first (one aggregate),
pairs come from a basket-keyed self-join — pair volume is
Σ_b k_b·(k_b−1)/2, bounded by the per-basket distinct-item count, never by
|baskets|² or |items|². With a bounded item vocabulary per basket (brands,
categories, sources — the curation case) this is linear in baskets. For
unbounded per-basket cardinality, cap k per basket upstream (top-k items
by weight) — the classic a-priori guard.

Counts are BIGINT-exact; supports/confidence/lift are single divisions of
exact integers, so results are bit-identical on any engine with no
rounding step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_items(df: DataFrame, basket_col: str, item_col: str) -> DataFrame:
    """Distinct (basket, item) pairs — the presence matrix."""
    return df.select(basket_col, item_col).distinct()


def cooccurrence_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Pair co-occurrence counts across baskets: for every unordered item
    pair (a < b), in how many baskets do both appear? One distinct pass,
    one basket-keyed self-join (map-side pair generation — the join key is
    the basket, so no shuffle beyond the distinct's), one count aggregate.
    ``min_support`` prunes the long tail before it ever leaves the
    aggregate."""
    items = basket_items(df, basket_col, item_col)
    a = items.alias("a")
    b = items.alias("b")
    pairs = a.join(
        b,
        (F.col(f"a.{basket_col}") == F.col(f"b.{basket_col}"))
        & (F.col(f"a.{item_col}") < F.col(f"b.{item_col}")),
    ).select(
        F.col(f"a.{item_col}").alias("item_a"),
        F.col(f"b.{item_col}").alias("item_b"),
    )
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count("*").alias("pair_n"))
        .filter(F.col("pair_n") >= min_support)
    )


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Pair association metrics: support counts plus confidence(a→b),
    confidence(b→a) and lift — P(ab)/(P(a)·P(b)) — for every pair above
    ``min_support``. Item marginals are one extra aggregate on the
    presence matrix, joined back onto the (small, support-pruned) pair
    table; the basket total is a 1-row broadcast. All inputs to the
    divisions are exact BIGINT counts, so every metric is a deterministic
    IEEE division — bit-identical cross-engine."""
    items = basket_items(df, basket_col, item_col)
    n_baskets = items.select(basket_col).distinct().count()
    marg = items.groupBy(item_col).agg(F.count("*").alias("item_n"))
    pairs = cooccurrence_pairs(df, basket_col, item_col, min_support)
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
