"""Structured Streaming windowed agg == batch windowed agg on the same data."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from seaexplorertools_spark.contract import ts_us_col
from seaexplorertools_spark.streaming import stream_windowed_counts, windowed_counts


def test_stream_matches_batch(spark, sf_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .transform(lambda d: d.withColumn("ts", F.timestamp_micros(ts_us_col(d))))
    )
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/events_us"
        ev.write.mode("overwrite").parquet(src)

        batch = {
            (r["window_start"], r["event_type"]): (r["n"], r["sum_v"])
            for r in windowed_counts(spark.read.parquet(src)).collect()
        }

        stream_df = stream_windowed_counts(spark, src)
        q = (
            stream_df.writeStream.format("memory")
            .queryName("wincounts")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["window_start"], r["event_type"]): (r["n"], r["sum_v"])
            for r in spark.sql("SELECT * FROM wincounts").collect()
        }
    assert got.keys() == batch.keys()
    for k in batch:
        assert got[k][0] == batch[k][0]
        assert abs(got[k][1] - batch[k][1]) < 1e-6
