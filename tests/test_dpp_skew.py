"""Cluster-scale physical-execution features, demonstrated on real plans:

- Dynamic partition pruning (DPP): a partitioned fact table probed through
  a filtered dim join must scan only the partitions the dim selects —
  at 100 TB this is the difference between reading one day and reading
  the decade. Visible as a ``dynamicpruning`` subquery in the fact scan.
- AQE skew-join splitting: a pathologically skewed build side must be
  split into parallel sub-partitions at runtime (``skew=true`` in the
  executed SortMergeJoin) instead of one straggler task.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    with tempfile.TemporaryDirectory() as tmp:
        fact = f"{tmp}/lineitem_by_flag"
        li.write.partitionBy("l_returnflag").mode("overwrite").parquet(fact)
        f_part = spark.read.parquet(fact)
        # the dim's filter is on an AGGREGATE of the data (not the join
        # key), so no static constraint can reach the fact scan — only the
        # runtime DPP subquery can prune partitions. A filter like
        # ``l_returnflag = 'R'`` would NOT exercise DPP: Catalyst's
        # InferFiltersFromConstraints copies key predicates across the
        # join statically (verified — it lands in PartitionFilters).
        dim = (
            li.groupBy("l_returnflag")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > li.count() / 3)  # selects exactly 'N' in this data
            .select("l_returnflag")
        )
        joined = f_part.join(dim.hint("broadcast"), "l_returnflag").groupBy(
            "l_returnflag"
        ).agg(F.sum("l_quantity").alias("q"))
        plan = joined._jdf.queryExecution().toString()
        assert "dynamicpruning" in plan, plan[:4000]
        rows = joined.collect()
        assert len(rows) == 1 and rows[0]["l_returnflag"] == "N"


def test_aqe_splits_skewed_join_partitions(spark):
    # one key owns ~100% of the left side; thresholds lowered so the local
    # fixture trips the same code path a hot key trips at cluster scale
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        # the count() after the join adds a shuffle; allow the skew split
        # anyway (it would otherwise be suppressed to avoid re-shuffling)
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 100 < 99, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.rand(42).alias("x"),
        )
        right = spark.range(0, 1000).select(F.col("id").alias("k"), F.lit(1.0).alias("w"))
        j = left.join(right, "k")
        # execute THIS DataFrame's own QueryExecution (count()/write would
        # clone a new one and the final adaptive plan wouldn't be visible)
        assert len(j.collect()) == 198_010
        txt = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        assert "isFinalPlan=true" in txt, txt[:2000]
        assert "SortMergeJoin(skew=true)" in txt, txt[:4000]
        assert "AQEShuffleRead coalesced and skewed" in txt, txt[:4000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
