"""ANN index as lakehouse layout: IVF inverted lists written as a
cell-partitioned parquet table, probed with partition pruning — the way a
100 TB vector corpus actually serves queries (a probe reads nprobe cells'
files, never the table)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from seaexplorertools_spark.operators.similarity import (
    ivf_assign,
    train_ivf_centroids,
)


def test_ivf_lists_partition_pruned(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = train_ivf_centroids(emb, n_cells=8)
    lists = ivf_assign(
        emb.select(
            F.col("vec_id"), F.col("embedding").cast("array<double>").alias("v")
        ),
        cents,
        "v",
    )

    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/ivf_index"
        lists.write.mode("overwrite").partitionBy("ivf_cell").parquet(path)

        back = spark.read.parquet(path)
        probe = back.filter(F.col("ivf_cell") == 3)

        # the probe's scan must prune at the PARTITION level: the cell
        # predicate appears as a PartitionFilter, and zero data filters
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [isnotnull(ivf_cell" in plan and "= 3" in plan

        # pruned read returns exactly the cell's rows
        want = lists.filter(F.col("ivf_cell") == 3).count()
        assert probe.count() == want > 0

        # conservation: partitioned layout lost nothing
        assert back.count() == emb.count()
