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
