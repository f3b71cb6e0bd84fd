"""Warehouse/product-analytics operator tests: semantic invariants the
DuckDB oracle can't express (cross-query equivalence, brute-force
comparison) plus the 100 TB plan properties of the new batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from seaexplorertools_spark import contract
from seaexplorertools_spark.plans.inspect import explain_str, uses_broadcast_join


def test_session_window_native_matches_islands(spark, sf_dir):
    """F.session_window must produce exactly the sessions the
    gaps-and-islands cumsum derives (same half-open >= boundary):
    same (user, start, end, count) multiset."""
    native = contract.QUERIES["q_session_window_native"](spark, sf_dir)
    ev = contract.events(spark, sf_dir)
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(*contract.EV_ORDER)
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    boundary = F.when(gap.isNull() | (gap >= 1800000000), 1).otherwise(0)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    islands = (
        ev.withColumn("sid", F.sum(boundary).over(wc))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts_us").alias("session_start_us"),
            (F.max("ts_us") + F.lit(1800000000)).alias("session_end_us"),
            F.count("*").alias("n_events"),
        )
        .drop("sid")
    )
    assert native.count() == islands.count()
    assert native.exceptAll(islands).count() == 0
    assert islands.exceptAll(native).count() == 0


def test_spatial_eps_join_matches_bruteforce(spark, sf_dir):
    """The cell-bucketed ε-join must find EXACTLY the all-pairs result —
    no pair lost at a cell boundary, no pair duplicated by the 3×3
    fan-out."""
    bucketed = contract.QUERIES["q_spatial_eps_join"](spark, sf_dir)
    emb = contract.table(spark, sf_dir, "embeddings")
    p = emb.select(
        "vec_id",
        F.col("embedding")[0].cast("double").alias("x"),
        F.col("embedding")[1].cast("double").alias("y"),
    )
    a = p.select(
        F.col("vec_id").alias("vec_a"), F.col("x").alias("ax"), F.col("y").alias("ay")
    )
    b = p.select(
        F.col("vec_id").alias("vec_b"), F.col("x").alias("bx"), F.col("y").alias("by")
    )
    dx = F.col("ax") - F.col("bx")
    dy = F.col("ay") - F.col("by")
    d2 = dx * dx + dy * dy
    brute = (
        a.crossJoin(b)
        .filter((F.col("vec_a") < F.col("vec_b")) & (d2 < F.lit(0.0625 * 0.0625)))
        .select("vec_a", "vec_b", F.round(F.sqrt(d2), 6).alias("dist"))
    )
    assert bucketed.count() == brute.count()
    assert bucketed.exceptAll(brute).count() == 0


def test_spatial_eps_join_no_crossjoin_in_plan(spark, sf_dir):
    """The production path must be a cell-keyed equi-join: the only
    cartesian allowed is the 9-row broadcast of the neighbor offsets."""
    txt = explain_str(contract.QUERIES["q_spatial_eps_join"](spark, sf_dir), "simple")
    assert "CartesianProduct" not in txt, txt


def test_funnel_is_monotone(spark, sf_dir):
    row = contract.QUERIES["q_funnel_conversion"](spark, sf_dir).collect()[0]
    assert row.step_view >= row.step_click >= row.step_purchase
    assert row.step_view > 0  # non-vacuous at every sf
    if row.step_purchase > 0:
        assert row.avg_convert_us > 0


def test_scd2_intervals_reconstruct(spark, sf_dir):
    """SCD2 invariants: intervals tile each user's history — n_rows sums
    to the user's event count, valid_to equals the next valid_from, and
    exactly one open (valid_to IS NULL) interval per user."""
    iv = contract.QUERIES["q_scd2_intervals"](spark, sf_dir).cache()
    ev = contract.events(spark, sf_dir)
    per_user = iv.groupBy("user_id").agg(
        F.sum("n_rows").alias("n"),
        F.sum(F.when(F.col("valid_to").isNull(), 1).otherwise(0)).alias("open_rows"),
    )
    ev_counts = ev.groupBy("user_id").agg(F.count("*").alias("n_ev"))
    joined = per_user.join(ev_counts, "user_id")
    assert joined.filter(F.col("n") != F.col("n_ev")).count() == 0
    assert joined.filter(F.col("open_rows") != 1).count() == 0
    # adjacency: valid_to = lead(valid_from) is definitional in the query;
    # assert intervals never overlap (valid_to > valid_from where closed)
    assert iv.filter(
        F.col("valid_to").isNotNull() & (F.col("valid_to") <= F.col("valid_from"))
    ).count() == 0
    iv.unpersist()


def test_cdc_snapshot_one_row_per_live_key(spark, sf_dir):
    snap = contract.QUERIES["q_cdc_snapshot"](spark, sf_dir)
    assert snap.groupBy("user_id").count().filter(F.col("count") > 1).count() == 0
    assert snap.filter(F.col("last_op") == "error").count() == 0


def test_tpch_q3_broadcasts_customer(spark, sf_dir):
    df = contract.QUERIES["q_tpch_q3"](spark, sf_dir)
    assert uses_broadcast_join(df), explain_str(df, "simple")
    assert len(df.take(11)) == 10  # LIMIT respected


def test_retention_week_zero_covers_all_users(spark, sf_dir):
    """Every user is active in their own cohort week: the offset-0 cells
    must sum to the total distinct-user count."""
    ret = contract.QUERIES["q_cohort_retention"](spark, sf_dir)
    week0 = (
        ret.filter(F.col("week_offset") == 0)
        .agg(F.sum("active_users").alias("s"))
        .collect()[0]
        .s
    )
    n_users = (
        contract.events(spark, sf_dir).select("user_id").distinct().count()
    )
    assert week0 == n_users


def test_join_size_estimate_is_exact(spark, sf_dir):
    """The count-product estimate IS the true equi-join cardinality, and
    max_key_product matches the hottest key's actual contribution."""
    from pyspark.sql import functions as F

    from seaexplorertools_spark.contract import QUERIES, events, table

    got = QUERIES["q_join_size_estimate"](spark, sf_dir).collect()[0]
    ev = events(spark, sf_dir)
    orders = table(spark, sf_dir, "orders")
    joined = ev.join(orders, ev["user_id"] == orders["o_custkey"])
    assert got["est_rows"] == joined.count()
    hot = (
        joined.groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )
    assert got["max_key_product"] == hot
