"""Structured Streaming surface (engine addition — the reference is pure
batch, SURVEY §2.10; the driver's ``events`` table is the stream analogue).

The same logical aggregation runs in both modes:

- ``windowed_counts(df)``     — batch form (used by the contract oracle).
- ``stream_windowed_counts``  — ``readStream`` file source + watermark +
  tumbling window, the canonical late-data-tolerant streaming agg.

At scale: the streaming agg's state is bounded by (windows in watermark ×
event types); shuffle partitions carry partial counts (map-side combine
applies to streaming aggregates too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window count/sum per event_type — batch form."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_v"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_v",
        )
    )


def stream_windowed_counts(
    spark: SparkSession,
    path: str,
    schema: str = "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """readStream → watermark → windowed agg. Start with
    ``.writeStream.trigger(availableNow=True)`` for a bounded catch-up run,
    or leave unbounded for continuous ingestion."""
    stream = spark.readStream.schema(schema).parquet(path)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_v"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_v",
        )
    )
