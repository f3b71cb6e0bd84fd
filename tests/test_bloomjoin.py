"""Bloom semi-join reduction: exactness (== plain semi join), actual
row reduction at the prefilter, and false-positive-rate sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from seaexplorertools_spark.operators.bloomjoin import (
    bloom_might_contain,
    bloom_semi_join,
    build_bloom,
)


def _tables(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return li, orders


def test_bloom_semi_join_exact(spark, sf_dir):
    li, urgent = _tables(spark, sf_dir)
    got = sorted(
        bloom_semi_join(li, urgent, "l_orderkey", "o_orderkey")
        .select("l_orderkey", "l_linenumber")
        .collect()
    )
    want = sorted(
        li.join(
            urgent.select("o_orderkey").distinct(),
            li.l_orderkey == F.col("o_orderkey"),
            "left_semi",
        )
        .select("l_orderkey", "l_linenumber")
        .collect()
    )
    assert got == want and len(got) > 0


def test_bloom_prefilter_reduces(spark, sf_dir):
    """The probe predicate alone must cut the fact scan to near the true
    match count: matches + fpr, with fpr < 5% of non-matches at the
    default sizing."""
    li, urgent = _tables(spark, sf_dir)
    bitmap = build_bloom(urgent.select("o_orderkey"), "o_orderkey")
    total = li.count()
    pre = li.filter(bloom_might_contain(bitmap, F.col("l_orderkey"))).count()
    true = li.join(
        urgent.select("o_orderkey").distinct(),
        li.l_orderkey == F.col("o_orderkey"),
        "left_semi",
    ).count()
    assert true <= pre < total
    false_pos = pre - true
    assert false_pos <= 0.05 * (total - true), (
        f"fpr too high: {false_pos}/{total - true} non-matches passed"
    )


def test_bloom_no_false_negatives(spark, sf_dir):
    """A bloom filter may over-approximate, never under-approximate."""
    _, urgent = _tables(spark, sf_dir)
    bitmap = build_bloom(urgent.select("o_orderkey"), "o_orderkey")
    missed = (
        urgent.select(F.col("o_orderkey").alias("k"))
        .distinct()
        .filter(~bloom_might_contain(bitmap, F.col("k")))
        .count()
    )
    assert missed == 0
