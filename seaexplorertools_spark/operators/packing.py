"""Sequence packing — the concatenate-then-chunk manifest pretraining
loaders consume (tokens streamed in deterministic order, cut into
fixed-capacity context windows; a document belongs to the window where it
starts).

The one inherently sequential step — the running token offset — is
parallelized by hash-SHARDING the stream first: each shard's cumsum is an
independent window partition (8 shards here, thousands at 100 TB), so no
global single-partition window ever exists. Everything is exact BIGINT
arithmetic; the hash order also decorrelates document length from
position (no length-sorted pathologies in the training stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import tokens


def pack_manifest(
    docs: DataFrame,
    capacity: int = 2048,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pack",
) -> DataFrame:
    """Per-(shard, bin) packing manifest: document count and token count
    of every capacity-token window of the shard-concatenated stream."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    tk = docs.select(
        id_col,
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tok"),
        h.alias("h"),
    ).withColumn("shard", F.col("h") % n_shards)
    w = (
        Window.partitionBy("shard")
        .orderBy("h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cs = tk.withColumn("start_off", F.sum("n_tok").over(w) - F.col("n_tok"))
    return (
        cs.withColumn("bin", F.floor(F.col("start_off") / F.lit(float(capacity))))
        .groupBy("shard", "bin")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
    )
