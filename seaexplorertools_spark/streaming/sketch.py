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


QSKETCH_OUT = StructType(
    [
        StructField("event_type", StringType(), False),
        StructField("sample_n", LongType(), True),
        StructField("q_50", DoubleType(), True),
        StructField("q_90", DoubleType(), True),
    ]
)

# bottom-k survivors: parallel arrays of (hash, value) — ≤ k entries forever
QSKETCH_STATE = StructType(
    [
        StructField("hs", ArrayType(LongType()), True),
        StructField("vs", ArrayType(DoubleType()), True),
    ]
)


def _interp_quantile(xs: list[float], q: float) -> float:
    """Sorted-linear-interpolation quantile — the SAME definition as
    Spark's exact ``percentile`` and DuckDB's ``quantile_cont``, so the
    streaming sketch is value-compatible with the batch twin."""
    if not xs:
        return float("nan")
    pos = q * (len(xs) - 1)
    lo = int(pos)
    hi = min(lo + 1, len(xs) - 1)
    frac = pos - lo
    return xs[lo] + (xs[hi] - xs[lo]) * frac


def quantile_sketch_stateful(hashed_stream: DataFrame, k: int = 64) -> DataFrame:
    """Streaming bottom-k quantile sketch: per group, keep the k rows
    with the SMALLEST uniform hash (with their values) — the same
    deterministic sample operators/sketches.py::quantile_sketch selects
    in batch, maintained incrementally with O(k) state per key and no
    watermark. Each micro-batch emits refreshed q50/q90 interpolated over
    the survivor sample. Because bottom-k is mergeable and order-free,
    the stream converges to EXACTLY the batch sketch on the same data —
    the equivalence test pins it bit-for-bit.

    ``hashed_stream`` needs (event_type string, h long, value double)."""

    def fn(key, pdfs, state):
        (etype,) = key
        if state.hasTimedOut:  # pragma: no cover — no timeout configured
            return
        if state.exists:
            hs, vs = list(state.get[0]), list(state.get[1])
            best = dict(zip(hs, vs))
        else:
            best = {}
        for pdf in pdfs:
            for h, v in zip(pdf["h"], pdf["value"]):
                if pd.notna(h) and pd.notna(v):
                    best[int(h)] = float(v)
        kept = sorted(best.items())[:k]
        state.update(([h for h, _ in kept], [v for _, v in kept]))
        if not kept:
            return
        xs = sorted(v for _, v in kept)
        yield pd.DataFrame(
            [
                (
                    etype,
                    len(kept),
                    _interp_quantile(xs, 0.5),
                    _interp_quantile(xs, 0.9),
                )
            ],
            columns=[f.name for f in QSKETCH_OUT],
        )

    return hashed_stream.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=QSKETCH_OUT,
        stateStructType=QSKETCH_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
