"""events.ts physical-type drift regression (the round-2 bench/correctness
crash): the driver's testdata generator has written ns-as-long, µs
timestamp_ntz, and tz-aware timestamp across rounds. ts_us_col must yield
the IDENTICAL BIGINT µs for all three — and stay session-timezone-proof."""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from seaexplorertools_spark.contract import ts_us_col

US = [1_700_000_000_000_000, 1_700_000_123_456_789, 1_704_067_200_000_000]


def _write(tmp: str, name: str, arr: pa.Array) -> str:
    path = os.path.join(tmp, name)
    pq.write_table(pa.table({"ts": arr}), path)
    return path


def _read_us(spark, path: str) -> list[int]:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    return [r["u"] for r in df.select(ts_us_col(df).alias("u")).orderBy("u").collect()]


def test_ts_us_col_identical_across_physical_types(spark):
    with tempfile.TemporaryDirectory() as tmp:
        p_ns = _write(tmp, "ns.parquet", pa.array([u * 1000 for u in US], pa.timestamp("ns")))
        p_ntz = _write(tmp, "ntz.parquet", pa.array(US, pa.timestamp("us")))
        p_tz = _write(tmp, "tz.parquet", pa.array(US, pa.timestamp("us", tz="UTC")))
        assert _read_us(spark, p_ns) == _read_us(spark, p_ntz) == _read_us(spark, p_tz) == sorted(US)


def test_ts_us_col_ntz_is_session_timezone_proof(spark):
    old = spark.conf.get("spark.sql.session.timeZone")
    with tempfile.TemporaryDirectory() as tmp:
        p_ntz = _write(tmp, "ntz.parquet", pa.array(US, pa.timestamp("us")))
        try:
            spark.conf.set("spark.sql.session.timeZone", "America/New_York")
            shifted = _read_us(spark, p_ntz)
        finally:
            spark.conf.set("spark.sql.session.timeZone", old)
        assert shifted == sorted(US)
