"""Stream-static enrichment join (engine addition, SURVEY §2.10).

The most common production streaming shape: an unbounded fact stream
joined to a small, slowly-changing dimension. Spark plans the static side
as a broadcast into every micro-batch — no state store, no watermark
needed for an inner equi-join against a static side, and the dim is
re-resolved each batch (so a dim refresh is picked up on the next
micro-batch when the static side is a table/file source).

Both forms share one logical plan:

- ``enrich(events, dim)``        — batch twin (contract oracle:
  ``st_enrich_static``).
- ``stream_enrich(spark, path, dim)`` — ``readStream`` form.

At 100 TB/day of stream: the broadcast is |dim|-bounded, each micro-batch
maps side-free (no shuffle at all before the windowless aggregate's one
exchange) — the join adds zero state to the streaming query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def enrich(events: DataFrame, dim: DataFrame, key: str = "event_type") -> DataFrame:
    """Broadcast-join the dim, then hourly weighted rollup per family."""
    return (
        events.join(F.broadcast(dim), key)
        .groupBy(F.window("ts", "1 hour").alias("w"), "family")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value") * F.col("weight")).alias("weighted_v"),
        )
        .select(
            F.col("w.start").alias("window_start"), "family", "n", "weighted_v"
        )
    )


def stream_enrich(
    spark: SparkSession,
    path: str,
    dim: DataFrame,
    schema: str = EVENT_SCHEMA,
    key: str = "event_type",
    watermark: str = "2 hours",
) -> DataFrame:
    """readStream → broadcast dim join → watermarked hourly rollup. The
    watermark bounds the aggregate's state (the join itself is stateless)."""
    stream = spark.readStream.schema(schema).parquet(path)
    return (
        stream.withWatermark("ts", watermark)
        .join(F.broadcast(dim), key)
        .groupBy(F.window("ts", "1 hour").alias("w"), "family")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value") * F.col("weight")).alias("weighted_v"),
        )
        .select(
            F.col("w.start").alias("window_start"), "family", "n", "weighted_v"
        )
    )
