"""Extra pipeline coverage: O3 shear correction path and value-level
verification of stage-2 gridding against a direct numpy implementation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from seaexplorertools_spark.pipeline import default_options, shear_from_adcp
from seaexplorertools_spark.pipeline.gridding import grid_cells
from tests.mission_fixture import make_mission


@pytest.fixture(scope="module")
def mission_small(spark):
    glider_pd, ping_pd, cells_pd, bt_pd, attrs = make_mission(n_dives=3)
    return (
        glider_pd,
        ping_pd,
        cells_pd,
        spark.createDataFrame(glider_pd),
        spark.createDataFrame(ping_pd),
        spark.createDataFrame(cells_pd),
        attrs,
    )


def test_o3_shear_correction_path_runs(mission_small):
    """correct_shear (O3, reference :682-784) with correctXshear on: the
    beam→XYZZ→correct→beam roundtrip must run and change beam velocities
    while preserving schema/row counts."""
    glider_pd, ping_pd, cells_pd, glider, ping, cells, attrs = mission_small
    base = default_options()
    base["correctADCPHeading"] = False

    on = dict(base)
    on["correctXshear"] = True
    g_off, _, _ = shear_from_adcp(cells, ping, glider, attrs, dict(base))
    g_on, _, _ = shear_from_adcp(cells, ping, glider, attrs, on)
    assert g_on.count() == g_off.count()
    a = g_off.agg(F.avg(F.abs("v1"))).first()[0]
    b = g_on.agg(F.avg(F.abs("v1"))).first()[0]
    assert a is not None and b is not None
    assert a != pytest.approx(b, rel=1e-12)  # correction actually applied


def test_grid_cells_values_match_numpy(mission_small):
    """Stage-2 gridding values vs a direct numpy floor-bucket groupby mean
    over the engine's own gridded cells (independent recomputation)."""
    glider_pd, ping_pd, cells_pd, glider, ping, cells, attrs = mission_small
    options = default_options()
    options["correctADCPHeading"] = False
    gridded, ping_aug, options = shear_from_adcp(cells, ping, glider, attrs, options)
    pdf = gridded.select("profile_number", "bin_depth", "sh_e").toPandas()
    got = {
        (r["profile_num"], r["depth_bin"]): r["Sh_E"]
        for r in grid_cells(gridded, 1.0).collect()
        if r["Sh_E"] is not None
    }
    prof = np.floor(pdf["profile_number"].to_numpy(float))
    depth = np.floor(pdf["bin_depth"].to_numpy(float))
    val = pdf["sh_e"].to_numpy(float)
    gd = np.isfinite(prof) & np.isfinite(depth) & np.isfinite(val)
    ref = pd.DataFrame({"p": prof[gd], "d": depth[gd], "v": val[gd]}).groupby(["p", "d"])["v"].mean()
    assert len(got) == len(ref)
    for (p, d), v in ref.items():
        assert got[(int(p), int(d))] == pytest.approx(v, rel=1e-9), (p, d)
