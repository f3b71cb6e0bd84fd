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


def test_kmv_estimate_and_exact_branch(spark, sf_dir):
    from seaexplorertools_spark.operators.sketches import kmv_distinct

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = ev.select("user_id").distinct().count()
    row = kmv_distinct(ev, "user_id", k=64).first()
    if exact < 64:
        assert row["est_distinct"] == float(exact)  # exact branch
    else:
        assert abs(row["est_distinct"] - exact) / exact < 0.35  # k=64 ⇒ ~1/8 rel sd
    # huge k ⇒ always the exact branch
    row2 = kmv_distinct(ev, "user_id", k=100000).first()
    assert row2["est_distinct"] == float(exact)


def test_kmv_shard_merge_law(spark, sf_dir):
    """KMV of the union == re-min of the per-shard KMV hash unions: the
    partial-aggregate algebra that lets 1000 executors sketch shards
    independently and combine driver/reduce-side."""
    from pyspark.sql import functions as F

    from seaexplorertools_spark.operators.sketches import (
        kmv_distinct,
        kmv_merge,
        uniform_hash48,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn("g", F.lit("all"))
    whole = kmv_distinct(ev, "user_id", ["g"], k=32).first()
    # shard by event_type, keep each shard's 32 smallest hashes, merge
    shard_hashes = (
        ev.where(F.col("user_id").isNotNull())
        .select("g", "event_type", uniform_hash48(F.col("user_id")).alias("h"))
        .distinct()
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("g", "event_type").orderBy("h")
    per_shard = (
        shard_hashes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 32)
        .select("g", "h")
    )
    merged = kmv_merge(per_shard, ["g"], k=32).first()
    assert merged["kth_hash"] == whole["kth_hash"]
    assert merged["n_kept"] == whole["n_kept"]
    assert merged["est_distinct"] == whole["est_distinct"]


def test_portable_hll_error_bound(spark, sf_dir):
    """From-scratch HLL (p=8 → 256 registers): estimate within the ~3×
    standard-error envelope (1.04/sqrt(256) ≈ 6.5% → 20% bound) of the
    exact distinct count, on both a small-cardinality (linear-counting
    branch) and a larger (raw-estimator branch) column."""
    from seaexplorertools_spark.operators.sketches import hll_estimate, hll_registers

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    for col in ("l_orderkey", "l_partkey"):
        exact = li.select(col).distinct().count()
        regs = hll_registers(li, col, p=8)
        est = hll_estimate(regs, p=8).first()["est_distinct"]
        assert abs(est - exact) / exact < 0.20, (col, est, exact)


def test_portable_hll_merge_law_exact(spark, sf_dir):
    """Unlike the DataSketches union gadget (bounded-error only, above),
    the expression-level HLL merges EXACTLY: registers of the union ==
    elementwise max of per-shard registers, so the merged estimate is
    bit-identical to the whole-table estimate."""
    from seaexplorertools_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    whole = hll_estimate(hll_registers(ev, "user_id", p=8), p=8).first()
    shards = hll_registers(ev, "user_id", ["event_type"], p=8).drop("event_type")
    merged = hll_estimate(hll_merge(shards, p=8), p=8).first()
    assert merged["est_distinct"] == whole["est_distinct"]
    assert merged["n_zero_regs"] == whole["n_zero_regs"]


def test_countmin_never_underestimates_and_merges_linearly(spark, sf_dir):
    from pyspark.sql import functions as F

    from seaexplorertools_spark.operators.dedup import tokens
    from seaexplorertools_spark.operators.sketches import countmin_estimate, countmin_table

    toks = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(tokens(F.col("text"))).alias("tok"))
        .cache()
    )
    cms = countmin_table(toks, "tok", depth=4, width=128)
    true = toks.groupBy("tok").agg(F.count("*").alias("t"))
    est = countmin_estimate(cms, true.select("tok"), "tok", depth=4, width=128)
    j = true.join(est, "tok")
    # CMS guarantee: estimate >= true count, always
    assert j.filter(F.col("est_count") < F.col("t")).count() == 0
    # merge-by-addition: sketch(all) == sketch(shard1) + sketch(shard2)
    h = F.crc32(F.col("tok")) % 2
    s1 = countmin_table(toks.filter(h == 0), "tok", depth=4, width=128)
    s2 = countmin_table(toks.filter(h == 1), "tok", depth=4, width=128)
    merged = (
        s1.select("r", "c", "cnt").unionAll(s2.select("r", "c", "cnt"))
        .groupBy("r", "c").agg(F.sum("cnt").alias("cnt"))
    )
    diff = (
        cms.join(merged, ["r", "c"], "full_outer")
        .filter(cms["cnt"].eqNullSafe(merged["cnt"]) == False)  # noqa: E712
    )
    assert diff.count() == 0
