"""RocksDB state store (the at-scale streaming state backend — the default
HDFSBackedStateStore keeps all state on-heap, which caps state size at
executor memory; RocksDB spills to local disk): the stateful operators
must produce IDENTICAL results under both providers."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from seaexplorertools_spark.contract import ts_us_col
from seaexplorertools_spark.streaming.stateful import sessionize_batch, sessionize_stateful

ROCKS = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def test_stateful_sessionize_under_rocksdb_matches_batch(spark, sf_dir):
    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .transform(lambda d: d.withColumn("ts_us", ts_us_col(d)))
        .filter(F.col("user_id") < 15)
        .select("user_id", "ts_us", "value")
        .coalesce(2)
    )
    expected = {
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in sessionize_batch(ev).collect()
    }
    try:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKS)
        with tempfile.TemporaryDirectory() as tmp:
            src = f"{tmp}/ev"
            ev.write.mode("overwrite").parquet(src)
            stream = spark.readStream.schema("user_id long, ts_us long, value double").parquet(src)
            q = (
                sessionize_stateful(stream)
                .writeStream.format("memory")
                .queryName("rocks_sessions")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(60)
            q.stop()
            got = {
                (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
                for r in spark.sql("SELECT * FROM rocks_sessions").collect()
            }
    finally:
        if old is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
    # the stream emits CLOSED sessions; every emitted session must be a
    # batch session, and most batch sessions close within the run
    assert got <= expected
    assert len(got) >= len(expected) * 0.5
