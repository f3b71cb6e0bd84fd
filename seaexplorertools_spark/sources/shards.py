"""Training-shard export sink (engine addition).

Trainers consume fixed-count, similarly-sized, reproducible shards
(webdataset / tfrecord style): shard assignment must be stable across
runs and engines, rows within a shard must arrive in a deterministic
order, and the writer must not funnel data through fewer tasks than
shards. All three properties come from composing existing primitives:

- shard id  = md5-hash-mod (same uniform-draw machinery as
  ``operators/sampling.py`` — engine-portable, layout-independent);
- layout    = ``repartition(n_shards, shard)`` → every shard is exactly
  one task writing exactly one file (plus ``partitionBy`` directories so
  readers prune by shard);
- order     = ``sortWithinPartitions`` on (shard, sort keys) — no global
  sort, no single-task bottleneck.

At 100 TB: the one shuffle is the shard exchange; shard count is chosen
by the caller (rows / target shard size). Skewless by construction —
md5-mod spreads keys uniformly regardless of key distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def shard_id(key, n_shards: int):
    """Stable shard assignment from md5(key) — uniform, engine-portable,
    independent of physical layout (cf. sampling.hash_uniform)."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
    return (h % F.lit(n_shards)).cast("int")


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str,
    sort_cols: list[str] | None = None,
    compression: str = "zstd",
) -> None:
    """Write ``df`` as ``n_shards`` deterministic parquet shards under
    ``path`` (directories ``shard=K/``, one file each)."""
    sort_cols = sort_cols or [key_col]
    out = df.withColumn("shard", shard_id(F.col(key_col), n_shards))
    (
        out.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", *sort_cols)
        .write.mode("overwrite")
        .option("compression", compression)
        .partitionBy("shard")
        .parquet(path)
    )


def read_training_shards(
    spark: SparkSession, path: str, shards: list[int] | None = None
) -> DataFrame:
    """Read shards back; ``shards`` prunes to specific shard directories
    (partition pruning — the scan never touches other shards)."""
    df = spark.read.parquet(path)
    if shards is not None:
        df = df.filter(F.col("shard").isin(shards))
    return df
