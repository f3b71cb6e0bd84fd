"""Training-shard sink: exact shard count (one file per shard), stable
assignment across runs and layouts, deterministic in-shard order, and
partition pruning on read-back."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from seaexplorertools_spark.sources.shards import (
    read_training_shards,
    write_training_shards,
)

N_SHARDS = 6


def _rows_per_shard(spark, path):
    out = {}
    for s in range(N_SHARDS):
        out[s] = [
            tuple(r)
            for r in spark.read.parquet(f"{path}/shard={s}").collect()
        ]
    return out


def test_shard_layout_and_determinism(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(docs, p1, N_SHARDS, "doc_id")
    # second write from a different physical layout must shard identically
    write_training_shards(docs.repartition(13, "lang"), p2, N_SHARDS, "doc_id")

    for p in (p1, p2):
        for s in range(N_SHARDS):
            files = glob.glob(f"{p}/shard={s}/*.parquet")
            assert len(files) == 1, (s, files)

    a, b = _rows_per_shard(spark, p1), _rows_per_shard(spark, p2)
    assert a == b  # same assignment AND same in-shard order
    n = docs.count()
    sizes = [len(v) for v in a.values()]
    assert sum(sizes) == n
    assert max(sizes) < 2 * n / N_SHARDS  # md5-mod spreads ~uniformly


def test_shard_read_pruning(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    p = str(tmp_path / "c")
    write_training_shards(docs, p, N_SHARDS, "doc_id")
    sub = read_training_shards(spark, p, shards=[0, 3])
    got = {r["shard"] for r in sub.select("shard").distinct().collect()}
    assert got <= {0, 3}
    # pruning reaches the scan: only the two shard directories are read
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "shard" in plan
    assert sub.count() == sum(
        1 for r in spark.read.parquet(p).collect() if r["shard"] in (0, 3)
    )
