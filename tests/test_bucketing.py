"""Bucketed co-located joins — the pre-shuffle strategy for repeated big
joins at 100 TB: both sides bucketed by the join key join with ZERO
exchanges (each task reads matching buckets), vs two full shuffles for
plain parquet. This is the storage-layout half of the scale story; the
runtime half (AQE, broadcast, salting) is covered elsewhere."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seaexplorertools_spark.plans.inspect import count_exchanges, explain_str


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    for name, df, key in (("b_orders", orders, "o_orderkey"), ("b_lineitem", lineitem, "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        # external table path: the warehouse dir is a static conf, so point
        # each table at the pytest tmp dir explicitly
        (df.write.mode("overwrite").format("parquet")
           .option("path", str(wh / name))
           .bucketBy(8, key).sortBy(key).saveAsTable(name))
    yield spark.table("b_orders"), spark.table("b_lineitem")
    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_no_exchange(spark, bucketed):
    orders, lineitem = bucketed
    # broadcast would bypass the bucket path at this tiny SF — force the
    # shuffle-join planner so the test shows what happens at real scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lineitem.join(
            orders, lineitem["l_orderkey"] == orders["o_orderkey"]
        ).groupBy("o_orderpriority").agg(F.count("*").alias("n"))
        # the join itself must not shuffle either side — bucket layout IS
        # the partitioning (the groupBy after it still exchanges, as it must)
        plan = explain_str(joined, "formatted")
        assert "SortMergeJoin" in plan, plan
        n_ex = count_exchanges(joined)
        assert n_ex == 1, f"expected only the groupBy exchange, got {n_ex}:\n{plan}"
        # and the result is right
        total = sum(r["n"] for r in joined.collect())
        assert total == lineitem.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_join_shuffles_both_sides(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lineitem.join(
            orders, lineitem["l_orderkey"] == orders["o_orderkey"]
        ).groupBy("o_orderpriority").agg(F.count("*").alias("n"))
        assert count_exchanges(joined) >= 3, explain_str(joined, "simple")
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
