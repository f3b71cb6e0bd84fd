"""Custom stateful streaming operator — per-user session aggregation via
``applyInPandasWithState`` (engine addition; SURVEY §2.10 notes the
reference is batch-only, so this is the Spark-native streaming surface for
the same sessionization semantics as the batch ``q_sessionize`` query).

State: per user, the open session's (start, last_ts, count, sum). An event
more than ``gap`` after the last one closes the session (emitted) and opens
a new one; GroupStateTimeout flushes idle sessions.

Scale: state size is O(active users), each entry a 4-tuple; the stream
shuffles by user_id only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start_us", LongType(), True),
        StructField("session_end_us", LongType(), True),
        StructField("n_events", LongType(), True),
        StructField("sum_value", DoubleType(), True),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType(), True),
        StructField("last_us", LongType(), True),
        StructField("n", LongType(), True),
        StructField("sum_v", DoubleType(), True),
    ]
)

GAP_US = 30 * 60 * 1_000_000


def sessionize_stateful(events_stream: DataFrame, gap_us: int = GAP_US) -> DataFrame:
    """events_stream needs columns (user_id long, ts_us long, value double)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                start, last, n, sv = state.get
                state.remove()
                yield pd.DataFrame(
                    [(user_id, start, last, n, sv)], columns=[f.name for f in SESSION_SCHEMA]
                )
            return
        rows = pd.concat(list(pdfs)).sort_values("ts_us")
        start, last, n, sv = state.get if state.exists else (None, None, 0, 0.0)
        out = []
        for ts, v in zip(rows["ts_us"], rows["value"]):
            ts = int(ts)
            if last is not None and ts - last > gap_us:
                out.append((user_id, start, last, n, sv))
                start, last, n, sv = ts, ts, 1, float(v or 0.0)
            else:
                start = ts if start is None else start
                last, n, sv = ts, n + 1, sv + float(v or 0.0)
        state.update((start, last, n, sv))
        state.setTimeoutDuration(60_000)
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in SESSION_SCHEMA])

    return events_stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def sessionize_batch(events: DataFrame, gap_us: int = GAP_US) -> DataFrame:
    """Batch twin: closed sessions per user via gap-cumsum (same semantics,
    used to validate the stateful operator)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts_us")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    boundary = F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = events.withColumn("session_id", F.sum(boundary).over(wc))
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        F.count("*").alias("n_events"),
        F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("sum_value"),
    )
