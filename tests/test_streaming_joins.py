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


def test_stream_interval_join_outer_emits_unmatched_with_nulls(spark, tmp_path):
    import time as _time

    from seaexplorertools_spark.streaming.joins import stream_interval_join_outer

    # left rows at t=0s and t=1000s; right matches only the first. Outer
    # null-emission requires the RIGHT watermark to pass the unmatched
    # row's window, so a second right file (a later non-matching row) is
    # appended mid-stream to push the watermark forward — exactly how
    # production outer joins flush: the other stream keeps moving.
    left = spark.createDataFrame(
        [(1, 100, "2024-01-01 00:00:00"), (1, 101, "2024-01-01 00:16:40")],
        "user_id long, event_id long, ts string",
    ).select("user_id", "event_id", F.col("ts").cast("timestamp").alias("t"))
    right1 = spark.createDataFrame(
        [(1, 900, "2024-01-01 00:00:30")], "user_id long, rid long, ts string"
    ).select("user_id", "rid", F.col("ts").cast("timestamp").alias("t"))
    right2 = spark.createDataFrame(
        [(99, 901, "2024-01-01 01:00:00")], "user_id long, rid long, ts string"
    ).select("user_id", "rid", F.col("ts").cast("timestamp").alias("t"))
    # the join's GLOBAL watermark is min(left wm, right wm) — BOTH streams
    # must advance for the unmatched row to flush
    left2 = spark.createDataFrame(
        [(98, 199, "2024-01-01 01:00:00")], "user_id long, event_id long, ts string"
    ).select("user_id", "event_id", F.col("ts").cast("timestamp").alias("t"))
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    left.coalesce(1).write.mode("overwrite").parquet(lsrc)
    right1.coalesce(1).write.mode("overwrite").parquet(rsrc)
    sl = spark.readStream.schema(left.schema).option("maxFilesPerTrigger", "1").parquet(lsrc)
    sr = spark.readStream.schema(right1.schema).option("maxFilesPerTrigger", "1").parquet(rsrc)
    out = stream_interval_join_outer(sl, sr, on=["user_id"], time_col="t", tol_seconds=60)
    q = (
        out.writeStream.format("memory")
        .queryName("sjoin_outer")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        def rows():
            return {
                (r["event_id"], r["rid_r"])
                for r in spark.sql("SELECT * FROM sjoin_outer").collect()
            }

        deadline = _time.time() + 60
        while (100, 900) not in rows() and _time.time() < deadline:
            _time.sleep(1)
        right2.coalesce(1).write.mode("append").parquet(rsrc)
        left2.coalesce(1).write.mode("append").parquet(lsrc)
        while (101, None) not in rows() and _time.time() < deadline:
            _time.sleep(1)
        got = rows()
    finally:
        q.stop()
    assert (100, 900) in got
    assert (101, None) in got  # unmatched left row flushed with null right
