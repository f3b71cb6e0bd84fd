"""Watermarked stream-stream interval join — the online twin of
``operators/joins.py::interval_join``.

Two unbounded streams joined on keys with |t_l − t_r| ≤ tol. Structured
Streaming keeps each side's rows in state until the OTHER side's
watermark passes beyond the tolerance window, so state is bounded by
(input rate × (tolerance + allowed lateness)) — the property that lets
the join run forever. Without the time-range condition in the join
predicate Spark rejects the query (state would be unbounded); with it,
eviction is automatic.

Batch equivalence: on a bounded input where no row is later than the
watermark delay, the result equals the batch interval join
(tests/test_streaming_joins.py pins it)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    time_col: str,
    tol_seconds: int,
    watermark_delay: str = "1 minute",
    right_suffix: str = "_r",
) -> DataFrame:
    """Inner-join two streams on ``on`` keys where the right row's event
    time is within ±``tol_seconds`` of the left's. Both sides MUST carry
    an event-time column ``time_col`` (timestamp type); right-side
    columns are suffixed to keep the output schema unambiguous."""
    l = left.withWatermark(time_col, watermark_delay)
    r = right.withWatermark(time_col, watermark_delay)
    for c in r.columns:
        r = r.withColumnRenamed(c, f"{c}{right_suffix}")
    keys = [F.col(k) == F.col(f"{k}{right_suffix}") for k in on]
    lo = F.col(time_col) - F.expr(f"INTERVAL {tol_seconds} SECONDS")
    hi = F.col(time_col) + F.expr(f"INTERVAL {tol_seconds} SECONDS")
    rt = F.col(f"{time_col}{right_suffix}")
    conds = keys + [rt >= lo, rt <= hi]
    cond = conds[0]
    for c in conds[1:]:
        cond = cond & c
    return l.join(r, cond)


def stream_interval_join_outer(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    time_col: str,
    tol_seconds: int,
    watermark_delay: str = "1 minute",
    right_suffix: str = "_r",
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: matched pairs emit like the
    inner join; an UNMATCHED left row emits with null right columns only
    after the right watermark passes its tolerance window (before that,
    a match could still arrive — outer results are inherently
    watermark-delayed). Same bounded-state guarantee as the inner join;
    this is the streaming twin of enrich-or-null pipelines where absence
    is itself signal (e.g. click-without-impression detection)."""
    l = left.withWatermark(time_col, watermark_delay)
    r = right.withWatermark(time_col, watermark_delay)
    for c in r.columns:
        r = r.withColumnRenamed(c, f"{c}{right_suffix}")
    keys = [F.col(k) == F.col(f"{k}{right_suffix}") for k in on]
    lo = F.col(time_col) - F.expr(f"INTERVAL {tol_seconds} SECONDS")
    hi = F.col(time_col) + F.expr(f"INTERVAL {tol_seconds} SECONDS")
    rt = F.col(f"{time_col}{right_suffix}")
    conds = keys + [rt >= lo, rt <= hi]
    cond = conds[0]
    for c in conds[1:]:
        cond = cond & c
    return l.join(r, cond, "left_outer")
