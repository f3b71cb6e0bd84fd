"""Interval sweep-line analytics — exact concurrency profile (how many
intervals are open at each moment) without a single-partition stage.

The classic sequential algorithm (sort boundaries, running sum of ±1)
needs a GLOBAL prefix sum — the naive Spark spelling is a global window,
i.e. all data through one task. This implementation distributes it the
same way operators/rank.py::global_rank distributes row_number: range-
repartition boundaries by time, per-partition local cumsum, then add each
partition's total as a broadcast prefix offset. The offsets are computed
WINDOW-free (partition ids are known up front, so each total explodes
onto every higher id and a hash aggregate sums them — ≤ parts² tiny
rows); no WindowExec with an empty partition spec appears in the plan.

Semantics: half-open intervals [start, end) — an interval ending at t
closes before one starting at t opens, so touching intervals never count
as concurrent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..caching import consistency_cache


def concurrency_profile(
    df: DataFrame,
    start_col: str,
    end_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """(t, concurrency) — the step function's value in [t, next_t), one
    row per distinct boundary time. Max over rows = peak concurrency."""
    deltas = (
        df.select(F.col(start_col).alias("t"), F.lit(1).alias("d"))
        .unionByName(df.select(F.col(end_col).alias("t"), F.lit(-1).alias("d")))
        .groupBy("t")
        .agg(F.sum("d").alias("net"))
    )
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = deltas.repartitionByRange(parts, F.col("t")).withColumn(
        "__pid", F.spark_partition_id()
    )
    local_w = Window.partitionBy("__pid").orderBy("t")
    ranged = ranged.withColumn("__local", F.sum("net").over(local_w))
    # consistency cache (see rank.global_rank): the totals branch must see
    # the same sampled range boundaries as the local-cumsum branch
    ranged = consistency_cache(ranged)
    totals = ranged.groupBy("__pid").agg(F.sum("net").alias("__tot"))
    contrib = totals.select(
        F.explode(
            F.when(
                F.col("__pid") < F.lit(parts - 1),
                F.sequence(F.col("__pid") + F.lit(1), F.lit(parts - 1)),
            ).otherwise(F.lit(None).cast("array<int>"))
        ).alias("__pid"),
        F.col("__tot"),
    )
    offsets = contrib.groupBy("__pid").agg(F.sum("__tot").alias("__off"))
    return (
        ranged.join(F.broadcast(offsets), "__pid", "left")
        .select(
            "t",
            (F.coalesce(F.col("__off"), F.lit(0)) + F.col("__local"))
            .cast("long")
            .alias("concurrency"),
        )
    )
