"""Stream-stream interval join == batch interval_join on a bounded,
in-watermark input; the time-range predicate makes the query runnable
(bounded state) at all."""

from __future__ import annotations

from pyspark.sql import functions as F

from seaexplorertools_spark.contract import ts_us_col
from seaexplorertools_spark.operators.joins import interval_join
from seaexplorertools_spark.streaming.joins import stream_interval_join

TOL_S = 60


def test_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .transform(lambda d: d.withColumn("ts_us", ts_us_col(d)))
        .drop("ts", "props")
        .withColumn("t", F.timestamp_micros(F.col("ts_us")))
        .limit(400)
    )
    src = str(tmp_path / "ev")
    ev.orderBy("t", "event_id").coalesce(1).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    batch_src = spark.read.parquet(src)
    want = {
        (r["user_id"], r["event_id"], r["event_id_right"])
        for r in interval_join(
            batch_src.select("user_id", "event_id", "ts_us"),
            batch_src.select(
                "user_id", F.col("event_id").alias("event_id_right"), "ts_us"
            ),
            on=["user_id"],
            time_col="ts_us",
            tol=float(TOL_S * 1_000_000),
        ).collect()
    }

    sl = spark.readStream.schema(schema).parquet(src)
    sr = spark.readStream.schema(schema).parquet(src)
    out = stream_interval_join(sl, sr, on=["user_id"], time_col="t", tol_seconds=TOL_S)
    q = (
        out.writeStream.format("memory")
        .queryName("sjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["event_id"], r["event_id_r"])
        for r in spark.sql(
            "SELECT user_id, event_id, event_id_r FROM sjoin"
        ).collect()
    }
    assert got == want
    assert len(got) > 400  # join is non-vacuous (self-pairs + neighbors)
