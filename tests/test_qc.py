"""QC masking operators (P3) — thresholds and removed-fraction reporting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seaexplorertools_spark.operators.qc import mask_where, qc_velocity, removed_fraction


def test_qc_velocity_thresholds(spark):
    rows = [
        # (vel, corr, amp) → kept?
        (0.5, 80.0, 60.0, True),
        (0.5, 60.0, 60.0, False),   # correlation below floor
        (0.5, 80.0, 80.0, False),   # amplitude above ceiling
        (0.9, 80.0, 60.0, False),   # |velocity| above max
        (-0.9, 80.0, 60.0, False),
        (None, 80.0, 60.0, None),   # already-null velocity stays null
        (0.5, None, 60.0, True),    # NULL threshold channel doesn't newly mask
    ]
    df = spark.createDataFrame(
        [(i, v, c, a) for i, (v, c, a, _) in enumerate(rows)],
        "i long, velocity_beam1 double, correlation_beam1 double, amplitude_beam1 double",
    )
    out = qc_velocity(df, [1], corr_min=70, amp_max=75, vel_max=0.8)
    got = {r["i"]: r["velocity_beam1"] for r in out.collect()}
    for i, (v, c, a, kept) in enumerate(rows):
        if kept is None or not kept:
            assert got[i] is None, i
        else:
            assert got[i] == v, i


def test_removed_fraction(spark):
    df = spark.createDataFrame(
        [(float(i),) for i in range(10)] + [(None,)], "v double"
    )
    masked = mask_where(F.col("v"), F.col("v") >= 8)  # removes 2 of 10 finite
    frac = df.agg(removed_fraction(df, "v", masked).alias("f")).first()["f"]
    assert frac == pytest.approx(0.2)
