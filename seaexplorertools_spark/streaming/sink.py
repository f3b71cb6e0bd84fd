"""Idempotent (exactly-once) streaming parquet sink.

Structured Streaming guarantees at-least-once delivery to ``foreachBatch``:
after a crash between "batch written" and "offset committed", the SAME
micro-batch is re-delivered with the SAME ``epoch_id``. Exactly-once
output therefore needs the write itself to be an idempotent function of
``epoch_id`` — the classic pattern is partition-by-batch + dynamic
partition overwrite: replaying batch N overwrites partition
``_batch_id=N`` in place instead of appending duplicates.

This composes with any downstream reader: the ``_batch_id`` partition
column is pruned away on read, and the small files it creates are exactly
what ``sources/compact.py`` exists to fold up. At 100 TB ingest this is
the difference between "restart the stream after a crash" and "re-ingest
and re-dedup everything downstream".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

BATCH_COL = "_batch_id"


def batch_writer(path: str):
    """The idempotent per-batch write: f(batch, epoch) with the property
    f(batch, e); f(batch, e) ≡ f(batch, e) — replay overwrites, never
    appends. Exposed separately so tests (and backfills) can invoke the
    exact function the stream runs."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.withColumn(BATCH_COL, F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(BATCH_COL)
            .parquet(path)
        )

    return write


def write_stream_idempotent(
    stream_df: DataFrame, path: str, checkpoint: str
) -> StreamingQuery:
    """Drain all available input into ``path`` exactly-once: offsets are
    tracked in ``checkpoint``, and replayed epochs overwrite their own
    partition. ``availableNow`` processes the backlog then stops — rerun
    the same call to pick up new data incrementally."""
    return (
        stream_df.writeStream.foreachBatch(batch_writer(path))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
