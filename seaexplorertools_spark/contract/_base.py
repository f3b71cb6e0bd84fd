"""Driver-contract query registry: every operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable plus a DuckDB oracle SQL string.

Conventions (these make the driver's order-insensitive value-hash match):

- Every computed/aggregate column is aliased IDENTICALLY in the Spark code
  and the oracle SQL.
- Every float expression is rounded to 6 decimals ON BOTH SIDES — Spark and
  DuckDB agree to well below 1e-6 on identical inputs, so rounding removes
  summation-order and libm noise without hiding real bugs.
- ``events.ts`` physical type varies by driver testdata generation
  (ns-as-long, µs timestamp_ntz, …). ``ts_us_col`` normalizes every case
  to BIGINT microseconds matching DuckDB's ``epoch_us(ts)``; all event
  queries go through it.
- ``o_orderdate`` / ``l_shipdate`` are parquet µs → Spark ``timestamp_ntz``,
  which compares tz-safely against DuckDB's naive TIMESTAMP.
- All SQL is ANSI-safe (guarded divisions) because the driver may run the
  session with ``spark.sql.ansi.enabled=true`` (Spark 4 default).

Reference citations (`/root/reference/seaexplorertools/process_adcp.py`)
are on each query; the operator IDs (P1.., J1.., A1.., W1.., F1..) are
SURVEY.md §2's inventory.
"""

from __future__ import annotations

import math
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import windows as W
from ..operators.grid import binned_agg_2d, histogram
from ..operators.joins import asof_join, interp_join
from ..operators.qc import qc_velocity

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        # a second registration under the same name would silently
        # REPLACE the first (dict write), changing a query's semantics
        # and output schema out from under its driver CORRECTNESS
        # history — refuse loudly instead
        if name in QUERIES:
            raise ValueError(f"contract query {name!r} is already registered")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def r6(c):
    return F.round(c, 6)


def r6p(c):
    """Portable 6-dp rounding: floor(x*1e6 + 0.5)/1e6 — the SAME IEEE ops in
    Spark and DuckDB, so results are bit-identical even on exact round-half
    ties (where Spark's BigDecimal HALF_UP and DuckDB's multiply-then-round
    disagree) and never -0.0. Used where tie-prone arithmetic (2-decimal
    money/value inputs through divisions) feeds the rounded output."""
    return F.floor(c * F.lit(1000000.0) + F.lit(0.5)).cast("double") / F.lit(1000000.0)


R6P_SQL = "floor({} * 1000000.0 + 0.5) / 1000000.0"


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


#: Bytes of compressed input per restored partition. Measured on the
#: sf0.1 fixture (4-point curve, plans/r09 notes): dense decode lanes
#: bottom out at 8-16 partitions for the ~585 KB documents file, while a
#: flat fan-out to all 32 cores pays ~0.25-0.3 s of per-task scheduling
#: and Arrow-batch fragmentation (~300 rows/task) that LIGHT lanes never
#: earn back. 48 KiB/partition lands that file at ~12 partitions — inside
#: the optimum for every lane measured. Env-tunable for other deployments.
_PTABLE_SPLIT_BYTES = int(os.environ.get("SPARK_GRAFT_DENSE_SPLIT_BYTES", 48 * 1024))


def ptable(spark: SparkSession, sf_dir: str, name: str = "documents") -> DataFrame:
    """``table()`` + guarded parallelism-restoring round-robin repartition
    for CPU-dense per-row lanes (payload adapters, codec decodes, codegen
    text extraction): the local fixture parquet arrives as a SINGLE split,
    which pins all map-side work — Python workers and JVM codegen alike —
    to one core. The fan-out target is derived from the input size
    (ceil(bytes / ``SPARK_GRAFT_DENSE_SPLIT_BYTES``), capped at the
    session's default parallelism) rather than a flat core count, so tiny
    inputs are not shredded into hundreds-of-rows tasks whose scheduling
    overhead exceeds the decode they parallelize. On a many-split
    production input the partition-count guard short-circuits FIRST (no
    file sizing, no shuffle): this is a local-parallelism restorer, a
    no-op at scale. Only the narrow source rows are shuffled, never
    constructed payloads."""
    df = table(spark, sf_dir, name)
    max_parts = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= max_parts:
        return df
    try:
        nbytes = sum(
            os.path.getsize(p[len("file:") :] if p.startswith("file:") else p)
            for p in df.inputFiles()
        )
        parts = min(max_parts, max(1, -(-nbytes // _PTABLE_SPLIT_BYTES)))
    except OSError:  # non-local / unstatable input: restore full parallelism
        parts = max_parts
    if df.rdd.getNumPartitions() < parts:
        df = df.repartition(parts)
    return df


def ts_us_col(df: DataFrame, col: str = "ts"):
    """BIGINT µs-since-epoch from whatever physical type the driver's parquet
    writer used for event time — ns-as-long (legacy flag), timestamp_ntz
    (µs parquet), or tz-aware timestamp. The NTZ branch uses naive datetime
    arithmetic (timestampdiff against the NTZ epoch) so the result is
    session-timezone-independent and equals DuckDB's ``epoch_us(ts)``."""
    dt = dict(df.dtypes)[col]
    if dt == "bigint":  # nanosAsLong: ns integer
        return F.expr(f"{col} div 1000")
    if dt == "timestamp_ntz":
        return F.expr(f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})")
    return F.unix_micros(F.col(col))


def events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts_us BIGINT (µs, matches DuckDB's ns→µs truncation)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = table(spark, sf_dir, "events")
    return ev.withColumn("ts_us", ts_us_col(ev))


# per-user event ordering used by every window query (stable tiebreaker)
EV_ORDER = ["ts_us", "event_id"]


