"""applyInPandasWithState sessionization: closed sessions emitted by the
stream match the batch gap-cumsum sessionization."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from seaexplorertools_spark.contract import ts_us_col
from seaexplorertools_spark.streaming.stateful import sessionize_batch, sessionize_stateful


def test_stateful_sessions_match_batch(spark, sf_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .transform(lambda d: d.withColumn("ts_us", ts_us_col(d)))
        .filter(F.col("user_id") < 25)  # keep the state-store run fast in CI
        .select("user_id", "ts_us", "value")
        .coalesce(2)
    )
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/events_state"
        ev.write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema("user_id long, ts_us long, value double").parquet(src)
        out = sessionize_stateful(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("sessions")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        # availableNow processes all input in the first micro-batches; the
        # query can linger for state-timeout housekeeping — bound the wait
        # and stop explicitly.
        q.awaitTermination(45)
        q.stop()
        got = {
            (r["user_id"], r["session_start_us"]): (r["session_end_us"], r["n_events"])
            for r in spark.sql("SELECT * FROM sessions").collect()
        }
        batch = {
            (r["user_id"], r["session_start_us"]): (r["session_end_us"], r["n_events"])
            for r in sessionize_batch(spark.read.parquet(src)).collect()
        }
    # the stream emits only CLOSED sessions (the last session per user stays
    # open in state); every emitted session must match its batch twin exactly
    assert len(got) > 0
    for k, v in got.items():
        assert k in batch, k
        assert batch[k] == v, (k, v, batch[k])
    # and the stream must have closed all but the final session per user
    users = {u for u, _ in batch}
    assert len(batch) - len(got) <= len(users)
