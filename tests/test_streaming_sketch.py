"""Streaming KMV sketch == batch KMV sketch: the stateful streaming
operator's final per-group estimate must equal ``kmv_distinct`` over the
same data — same hashes, same k-minimum state, same estimator."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from seaexplorertools_spark.contract import ts_us_col
from seaexplorertools_spark.operators.sketches import kmv_distinct, uniform_hash48
from seaexplorertools_spark.streaming.sketch import kmv_stateful

K = 16  # < distinct users so the estimator branch is exercised


def test_streaming_kmv_matches_batch(spark, sf_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_type", "user_id")
    batch = {
        r["event_type"]: (r["n_kept"], r["kth_hash"], r["est_distinct"])
        for r in kmv_distinct(ev, "user_id", ["event_type"], k=K).collect()
    }

    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/ev"
        # split into files so the stream sees multiple micro-batch inputs
        ev.repartition(4).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema("event_type string, user_id long")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .where(F.col("user_id").isNotNull())
            .select("event_type", uniform_hash48(F.col("user_id")).alias("h"))
        )
        q = (
            kmv_stateful(stream, k=K)
            .writeStream.format("memory")
            .queryName("kmv_stream")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        q.stop()
        rows = spark.sql(
            "SELECT * FROM kmv_stream"
        ).collect()

    # update mode re-emits per micro-batch: the LAST row per group is the
    # final sketch (rows arrive in batch order within the memory sink)
    final = {}
    for r in rows:
        final[r["event_type"]] = (r["n_kept"], r["kth_hash"], r["est_distinct"])
    assert final == batch


def test_streaming_quantile_sketch_matches_batch(spark, sf_dir):
    from seaexplorertools_spark.operators.sketches import quantile_sketch
    from seaexplorertools_spark.streaming.sketch import quantile_sketch_stateful

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("value").isNotNull())
        .select("event_type", "event_id", "value")
    )
    batch = {
        r["event_type"]: (r["sample_n"], r["q_50"], r["q_90"])
        for r in quantile_sketch(
            ev, "event_id", "value", ["event_type"], k=16, qs=(0.5, 0.9)
        ).collect()
    }

    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/ev"
        ev.repartition(4).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema("event_type string, event_id long, value double")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .select(
                "event_type",
                uniform_hash48(F.col("event_id")).alias("h"),
                "value",
            )
        )
        q = (
            quantile_sketch_stateful(stream, k=16)
            .writeStream.format("memory")
            .queryName("qsketch_stream")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        q.stop()
        rows = spark.sql("SELECT * FROM qsketch_stream").collect()

    final = {}
    for r in rows:
        final[r["event_type"]] = (r["sample_n"], r["q_50"], r["q_90"])
    # bottom-k is order-free and mergeable: stream end-state == batch sketch,
    # bit-for-bit (same hash selection, same interpolation definition)
    assert final == batch
