"""Streaming first-seen dedup == batch first_seen when arrival order
respects event time (time-sorted source file), and state stays bounded via
the watermark eviction path."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from seaexplorertools_spark.contract import ts_us_col
from seaexplorertools_spark.streaming.dedup import first_seen, stream_first_seen

KEYS = ["user_id", "event_type"]


def test_stream_dedup_matches_batch(spark, sf_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .transform(lambda d: d.withColumn("ts", F.timestamp_micros(ts_us_col(d))))
    )
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/events_sorted"
        # single time-sorted file: arrival order == event-time order, so
        # first-arrival (stream) and first-event-time (batch) must agree
        ev.orderBy("ts", "event_id").coalesce(1).write.mode("overwrite").parquet(src)

        batch_src = spark.read.parquet(src)
        batch = {
            (r["user_id"], r["event_type"]): r["event_id"]
            for r in first_seen(batch_src, KEYS).collect()
        }

        stream_df = stream_first_seen(spark, src, KEYS)
        q = (
            stream_df.writeStream.format("memory")
            .queryName("firstseen")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["user_id"], r["event_type"]): r["event_id"]
            for r in spark.sql("SELECT * FROM firstseen").collect()
        }
    assert got == batch
    assert len(got) > 50
