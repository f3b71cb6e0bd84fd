"""Exactly-once streaming sink: the backlog lands once, a restarted
stream with the same checkpoint adds nothing, and a replayed epoch
(at-least-once redelivery) overwrites instead of duplicating."""

from __future__ import annotations

from seaexplorertools_spark.contract import events
from seaexplorertools_spark.streaming.sink import (
    BATCH_COL,
    batch_writer,
    write_stream_idempotent,
)


def _drain(q):
    q.awaitTermination(120)
    assert not q.isActive


def test_stream_sink_exactly_once(spark, sf_dir, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev = events(spark, sf_dir).drop("ts")  # nanos ts normalized to ts_us
    ev.write.mode("overwrite").parquet(src)
    n = ev.count()

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    _drain(write_stream_idempotent(stream, out, ckpt))
    got = spark.read.parquet(out)
    assert got.count() == n
    assert got.drop(BATCH_COL).exceptAll(ev).count() == 0

    # restart with the same checkpoint: offsets committed, nothing new
    stream2 = spark.readStream.schema(schema).parquet(src)
    _drain(write_stream_idempotent(stream2, out, ckpt))
    assert spark.read.parquet(out).count() == n


def test_replayed_epoch_overwrites_not_appends(spark, sf_dir, tmp_path):
    out = str(tmp_path / "out")
    ev = events(spark, sf_dir).drop("ts").limit(100)
    write = batch_writer(out)
    write(ev, 0)
    n1 = spark.read.parquet(out).count()
    write(ev, 0)  # at-least-once redelivery of the SAME epoch
    assert spark.read.parquet(out).count() == n1 == 100
    write(ev, 1)  # a NEW epoch appends its own partition
    assert spark.read.parquet(out).count() == 200
