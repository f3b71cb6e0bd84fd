"""verify_depth_bias diagnostic (reference :1859-1951) as DataFrames."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seaexplorertools_spark.pipeline import default_options, shear_from_adcp, velocity_from_shear
from seaexplorertools_spark.pipeline.diagnostics import depth_bias_asymmetry, depth_bias_stats
from tests.mission_fixture import make_mission


@pytest.fixture(scope="module")
def grid(spark):
    glider_pd, ping_pd, cells_pd, bt_pd, attrs = make_mission()
    glider = spark.createDataFrame(glider_pd)
    ping = spark.createDataFrame(ping_pd)
    cells = spark.createDataFrame(cells_pd)
    bt = spark.createDataFrame(bt_pd)
    options = default_options()
    options["correctADCPHeading"] = False
    gridded, ping_aug, options = shear_from_adcp(cells, ping, glider, attrs, options)
    g = velocity_from_shear(gridded, ping_aug, glider, bt, options)
    # diagnostics need latitude on the grid — join from the glider grid
    from seaexplorertools_spark.pipeline.gridding import grid_pings

    lat = grid_pings(ping_aug).select("profile_num", "depth_bin", "latitude")
    return g.join(lat, ["profile_num", "depth_bin"], "left").cache()


def test_depth_bias_stats_structure(grid):
    stats = depth_bias_stats(grid).toPandas()
    assert {"variable", "direction", "depth_class", "mean_v", "stderr_v", "n"} <= set(stats.columns)
    assert set(stats["variable"]) == {"ADCP_E", "ADCP_N"}
    assert set(stats["direction"]) <= {"north", "south"}
    assert (stats["n"] > 0).all()


def test_mission_travels_north_only(grid):
    """The synthetic mission drifts monotonically north — the direction
    classifier must find no southbound profiles (and asymmetry is empty)."""
    stats = depth_bias_stats(grid).toPandas()
    assert set(stats["direction"]) == {"north"}
    assert len(depth_bias_asymmetry(grid).toPandas()) == 0


def test_depth_bias_asymmetry_detects_injected_bias(spark):
    """Handcrafted grid: northbound profiles biased +0.2, southbound -0.2 —
    the asymmetry z-score must flag it strongly positive."""
    import numpy as np

    rng = np.random.default_rng(5)
    rows = []
    for p in range(40):
        north = p % 2 == 0
        lat = 58.0 + (0.01 * p if north else -0.01 * p)  # alternating drift
        for d in range(30):
            bias = 0.2 if north else -0.2
            rows.append(
                (p, d, float(bias + rng.normal(0, 0.05)), float(rng.normal(0, 0.05)), lat)
            )
    # make latitude gradient alternate: even profiles higher than neighbours
    df = spark.createDataFrame(
        rows, "profile_num long, depth_bin long, ADCP_E double, ADCP_N double, latitude double"
    )
    z = depth_bias_asymmetry(df).toPandas()
    ze = z[z["variable"] == "ADCP_E"]["asymmetry_z"]
    zn = z[z["variable"] == "ADCP_N"]["asymmetry_z"]
    assert len(ze) > 0
    # the injected E gap is strongly significant; the unbiased N is not
    assert ze.abs().median() > 2.0
    assert zn.abs().median() < 2.0


@pytest.fixture(scope="module")
def gridded_cells(spark):
    """The (time_us × gridded_bin) ENU cell table from pipeline stage 1 —
    input shape for the verify_calcENUfromXYZ diagnostics."""
    glider_pd, ping_pd, cells_pd, bt_pd, attrs = make_mission()
    glider = spark.createDataFrame(glider_pd)
    ping = spark.createDataFrame(ping_pd)
    cells = spark.createDataFrame(cells_pd)
    options = default_options()
    options["correctADCPHeading"] = False
    gridded, _, _ = shear_from_adcp(cells, ping, glider, attrs, options)
    return gridded.cache()


def test_enu_sign_check_structure(gridded_cells):
    from seaexplorertools_spark.pipeline.diagnostics import enu_sign_check

    out = enu_sign_check(gridded_cells).toPandas()
    assert {"regime", "variable", "n", "mean_v", "frac_expected_sign"} <= set(out.columns)
    assert set(out["variable"]) == {"x", "u"}
    assert set(out["regime"]) <= {"dive", "climb"}
    assert (out["n"] > 0).all()
    assert out["frac_expected_sign"].between(0.0, 1.0).all()


def test_vertical_speed_consistency_detects_injected_bias(spark):
    """Handcrafted V-shaped cast where U̅ equals dz/dt exactly: residual
    means ~0; adding a +0.1 m/s bias to U must surface as mean_resid
    ≈ -0.1 in BOTH regimes (the reference's axvline moving off zero)."""
    from seaexplorertools_spark.pipeline.diagnostics import vertical_speed_consistency

    rows = []
    n = 200
    for i in range(n):
        t_us = i * 1_000_000
        if i < n // 2:
            depth, pitch, dzdt = float(i), -20.0, 1.0
        else:
            depth, pitch, dzdt = float(n - i), 20.0, -1.0
        for b in range(3):
            rows.append((t_us, b, depth, depth, pitch, dzdt))
    cells = spark.createDataFrame(
        rows, "time_us long, gridded_bin int, depth double, pressure double, pitch double, u double"
    )
    clean = vertical_speed_consistency(cells).toPandas().set_index("regime")
    assert set(clean.index) == {"dive", "climb"}
    # interior central differences are exact on the linear ramps; the two
    # apex/edge pings contribute small one-sided errors only
    assert abs(clean.loc["dive", "mean_resid"]) < 0.02
    assert abs(clean.loc["climb", "mean_resid"]) < 0.02
    biased = cells.withColumn("u", F.col("u") + F.lit(0.1))
    out = vertical_speed_consistency(biased).toPandas().set_index("regime")
    assert abs(out.loc["dive", "mean_resid"] + 0.1) < 0.02
    assert abs(out.loc["climb", "mean_resid"] + 0.1) < 0.02


def test_enu_sign_check_flags_flipped_axis(spark):
    """If the X axis is sign-flipped (a beam-mapping bug), the dive/climb
    frac_expected_sign for x collapses toward 0 — the table catches what
    the reference's histogram shows visually."""
    from seaexplorertools_spark.pipeline.diagnostics import enu_sign_check

    rows = []
    for i in range(400):
        pitch = -20.0 if i % 2 == 0 else 20.0
        u = 0.3 if pitch < 0 else -0.3
        rows.append((i, 50.0, pitch, -0.25, u))
    cells = spark.createDataFrame(
        rows, "time_us long, depth double, pitch double, x double, u double"
    )
    good = enu_sign_check(cells).toPandas()
    assert (good["frac_expected_sign"] == 1.0).all()
    flipped = cells.withColumn("x", -F.col("x"))
    bad = enu_sign_check(flipped).toPandas().set_index(["variable", "regime"])
    assert bad.loc[("x", "dive"), "frac_expected_sign"] == 0.0
    assert bad.loc[("x", "climb"), "frac_expected_sign"] == 0.0
    assert bad.loc[("u", "dive"), "frac_expected_sign"] == 1.0
