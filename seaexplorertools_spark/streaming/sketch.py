"""Streaming KMV distinct-count — a custom stateful sketch operator
(``applyInPandasWithState``; SURVEY §2.10 surface).

State per group is the K smallest distinct 48-bit hashes (a bounded
``array<long>``, ≤ K entries forever — the KMV guarantee), so unbounded
streams sketch distinct cardinality with O(K) state per key and no
watermark requirement. Each micro-batch emits the group's refreshed
estimate (update mode). The batch twin is
``operators/sketches.py::kmv_distinct`` — identical hash, identical
estimator, equivalence pinned in ``tests/test_streaming_sketch.py``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.sketches import HASH_SPACE

OUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType(), False),
        StructField("n_kept", LongType(), True),
        StructField("kth_hash", LongType(), True),
        StructField("est_distinct", DoubleType(), True),
    ]
)

STATE_SCHEMA = StructType([StructField("mins", ArrayType(LongType()), True)])


def kmv_stateful(hashed_stream: DataFrame, k: int = 64) -> DataFrame:
    """``hashed_stream`` needs (event_type string, h long) — h from
    ``operators.sketches.uniform_hash48``. Returns per-group sketch rows
    refreshed every micro-batch."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        if state.hasTimedOut:  # pragma: no cover — no timeout configured
            return
        mins = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            mins.update(int(x) for x in pdf["h"].dropna())
        kept = sorted(mins)[:k]
        state.update((kept,))
        if not kept:
            return
        n = len(kept)
        est = float(n) if n < k else round((k - 1) * HASH_SPACE / kept[-1], 6)
        yield pd.DataFrame(
            [(etype, n, kept[-1], est)], columns=[f.name for f in OUT_SCHEMA]
        )

    return hashed_stream.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
