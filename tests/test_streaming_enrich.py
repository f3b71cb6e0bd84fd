"""Stream-static broadcast enrichment == batch twin on the same data: the
join is stateless (static side broadcast per micro-batch), so an
availableNow catch-up run must reproduce the batch rollup exactly."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from seaexplorertools_spark.contract import ts_us_col
from seaexplorertools_spark.streaming import enrich, stream_enrich

DIM = [
    ("view", 1.0, "passive"),
    ("click", 2.0, "active"),
    ("signup", 5.0, "active"),
    ("purchase", 10.0, "active"),
    ("error", 0.0, "ops"),
]


def test_stream_enrich_matches_batch(spark, sf_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    dim = spark.createDataFrame(DIM, "event_type string, weight double, family string")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").transform(
        lambda d: d.withColumn("ts", F.timestamp_micros(ts_us_col(d)))
    )
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/events_us"
        ev.write.mode("overwrite").parquet(src)

        batch = {
            (r["window_start"], r["family"]): (r["n"], r["weighted_v"])
            for r in enrich(spark.read.parquet(src), dim).collect()
        }

        q = (
            stream_enrich(spark, src, dim)
            .writeStream.format("memory")
            .queryName("enriched")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["window_start"], r["family"]): (r["n"], r["weighted_v"])
            for r in spark.sql("SELECT * FROM enriched").collect()
        }
    assert got.keys() == batch.keys()
    for k in batch:
        assert got[k][0] == batch[k][0]
        assert abs(got[k][1] - batch[k][1]) < 1e-6


def test_stream_enrich_is_broadcast(spark, sf_dir):
    """The static side must appear as a broadcast exchange in the batch
    twin's plan (the streaming planner uses the same join strategy)."""
    dim = spark.createDataFrame(DIM, "event_type string, weight double, family string")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").transform(
        lambda d: d.withColumn("ts", F.timestamp_micros(ts_us_col(d)))
    )
    plan = enrich(ev, dim)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
