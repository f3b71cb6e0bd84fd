"""2-D skyline (Pareto frontier) — maximize both dimensions; a point is
dominated if another point is ≥ in both and > in at least one. Engine
addition for data-selection frontiers (e.g. quality vs quantity trade-off
curves over candidate corpora); public textbook operator (Börzsönyi et
al., "The Skyline Operator", ICDE 2001).

Scale shape — two-phase: a partition-local prune first (each partition
sorts locally and drops rows strictly dominated inside it; no shuffle,
output ≈ per-partition frontier, typically ≪ N), then the exact global
pass runs over the tiny candidate set. The naive formulation is an N²
NOT EXISTS — that IS the DuckDB oracle, so every hash match certifies
the two-phase plan loses nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _exact_flags(df: DataFrame, x: str, y: str):
    """Domination test via the peer-group trick (no N² join): a row is on
    the frontier iff y equals its x-group max AND every strictly larger x
    has group-max y < this row's y. Duplicates of a frontier point are
    all kept (neither dominates the other)."""
    gmax = F.max(y).over(Window.partitionBy(x))
    # max y over all strictly-greater x = the EXCLUSIVE global running max
    # over x-groups ordered x desc — windowless via rank.global_running_max
    # (round 4: the former unpartitioned running-max/lag pair was bounded
    # by |distinct x| of the pruned survivors but still a single-partition
    # stage; now it range-partitions like every other global prefix op)
    from .rank import global_running_max

    grp = global_running_max(
        df.groupBy(x).agg(F.max(y).alias("__gy")),
        [F.col(x).desc()],
        "__gy",
        "__strict",
        exclusive=True,
    )
    return (
        df.withColumn("__gmax", gmax)
        .join(grp.select(x, "__strict"), x)
        .filter(
            (F.col(y) == F.col("__gmax"))
            & (F.col("__strict").isNull() | (F.col("__strict") < F.col(y)))
        )
        .drop("__gmax", "__strict")
    )


def skyline2d(df: DataFrame, x: str, y: str, prune: bool = True) -> DataFrame:
    """Rows on the maximize-(x, y) Pareto frontier, exactly — including
    all duplicates of frontier points.

    With ``prune`` (default), a partition-local pass drops rows strictly
    dominated within their partition first: sorted by (x desc, y desc),
    any row preceded (in its own partition) by a row with larger y is
    dominated by it (that row has x ≥ and y >) — safe to drop, never
    drops a global-frontier row. The exact pass then sees only local
    frontiers (the global window's input is ~|partitions| · frontier
    size, not N)."""
    if prune:
        wp = Window.partitionBy(F.spark_partition_id()).orderBy(
            F.col(x).desc(), F.col(y).desc()
        )
        run = F.max(y).over(wp.rowsBetween(Window.unboundedPreceding, -1))
        df = (
            df.withColumn("__prev", run)
            .filter(F.col("__prev").isNull() | (F.col("__prev") <= F.col(y)))
            .drop("__prev")
        )
    return _exact_flags(df, x, y)
