"""Mergeable-sketch aggregation (HLL): the property that makes distinct
counting feasible at 100 TB is that per-shard sketch states UNION to the
global state — partial aggregation over sketches, not rows. Pins (a) the
union-of-parts == whole-table estimate and (b) the estimate's error vs the
exact distinct count."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_hll_union_of_shards_equals_whole(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    whole = li.select(
        F.expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey))").alias("e")
    ).first()["e"]
    # shard by an arbitrary partitioning column, sketch per shard, union
    merged = (
        li.groupBy(F.pmod("l_linenumber", F.lit(3)).alias("shard"))
        .agg(F.expr("hll_sketch_agg(l_orderkey)").alias("sk"))
        .select(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("e"))
        .first()["e"]
    )
    # Not bit-identical: DataSketches' union gadget promotes sparse coupon
    # lists to dense HLL_8 registers, which at low cardinality rounds
    # differently than the single-pass sketch. The merge property that
    # matters at scale is bounded error, not state identity.
    assert abs(merged - whole) / whole < 0.02


def test_hll_estimate_error_bound(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = li.select("l_orderkey").distinct().count()
    est = li.select(
        F.expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey))").alias("e")
    ).first()["e"]
    assert abs(est - exact) / exact < 0.05
