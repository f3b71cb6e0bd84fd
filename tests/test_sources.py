"""Glider Parquet source (S1) and gridded sink (S6) round-trips."""

from __future__ import annotations

import tempfile

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from seaexplorertools_spark.sources.parquet import load_glider, write_gridded


def test_load_glider_reference_columns(spark):
    """Reference-shaped parquet (Timestamp/profileNum/LEGATO_PRESSURE names,
    process_adcp.py:83-92) loads with renames, epoch-µs and soundspeed."""
    n = 50
    pdf = pd.DataFrame(
        {
            "Timestamp": pd.date_range("2024-03-01", periods=n, freq="10s"),
            "Temperature": np.linspace(10, 12, n),
            "Salinity": np.full(n, 35.1),
            "Latitude": np.full(n, 58.0),
            "Longitude": np.full(n, 11.0),
            "profileNum": np.arange(n) // 10,
            "Declination": np.full(n, 4.4),
            "LEGATO_PRESSURE": np.linspace(0, 40, n),
            "speed_vert": np.full(n, 0.1),
            "speed_horz": np.full(n, 0.3),
            "DeadReckoning": np.zeros(n, dtype=np.int64),
            "NAV_RESOURCE": np.full(n, 116, dtype=np.int64),
            "diveNum": np.ones(n, dtype=np.int64),
            "IGNORED_EXTRA": np.zeros(n),
        }
    )
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/glider.parquet"
        pdf.to_parquet(path)
        out = load_glider(spark, path)
        rows = out.orderBy("time_us").collect()
    cols = set(out.columns)
    assert {"time_us", "temperature", "salinity", "pressure", "profile_number",
            "soundspeed", "diveNum"} <= cols
    assert "IGNORED_EXTRA" not in cols
    # Mackenzie soundspeed at (11C, 35.1, ~0m) ≈ 1490 m/s
    assert 1480 < rows[0]["soundspeed"] < 1510
    assert rows[1]["time_us"] - rows[0]["time_us"] == 10_000_000


def test_write_gridded_partitioned_roundtrip(spark):
    df = spark.range(100).select(
        (F.col("id") % 10).alias("profile_num"),
        F.floor(F.col("id") / 10).alias("depth_bin"),
        (F.col("id") * 0.5).alias("Sh_E"),
    )
    with tempfile.TemporaryDirectory() as tmp:
        write_gridded(df, f"{tmp}/out", partition_by=["profile_num"])
        back = spark.read.parquet(f"{tmp}/out")
        assert back.count() == 100
        # partition pruning works on the layout
        pruned = back.filter(F.col("profile_num") == 3)
        assert pruned.count() == 10
