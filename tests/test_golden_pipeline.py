"""Golden-style end-to-end pipeline regression test — the reference's own
test philosophy (single e2e compare, rtol=1e-3; SURVEY §5) on the
deterministic synthetic mission. Guards the full three-stage chain against
semantic drift."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F  # noqa: F401

from seaexplorertools_spark.pipeline import (
    default_options,
    grid_shear,
    shear_from_adcp,
    velocity_from_shear,
)
from tests.mission_fixture import make_mission

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_pipeline.json")


@pytest.fixture(scope="module")
def outputs(spark):
    glider_pd, ping_pd, cells_pd, bt_pd, attrs = make_mission()
    glider = spark.createDataFrame(glider_pd)
    ping = spark.createDataFrame(ping_pd)
    cells = spark.createDataFrame(cells_pd)
    bt = spark.createDataFrame(bt_pd)
    options = default_options()
    options["correctADCPHeading"] = False
    gridded, ping_aug, options = shear_from_adcp(cells, ping, glider, attrs, options)
    gridded = gridded.cache()
    g = grid_shear(gridded, ping_aug, glider, options).toPandas()
    v = velocity_from_shear(gridded, ping_aug, glider, bt, options).toPandas()
    return g, v


def _check(df, expected, cols):
    for c in cols:
        vals = df[c].to_numpy(float)
        want = expected[c]
        assert int(np.isfinite(vals).sum()) == want["n_finite"], c
        if want["mean"] is not None:
            assert np.nanmean(vals) == pytest.approx(want["mean"], rel=1e-3, abs=1e-6), c
            assert np.nanstd(vals) == pytest.approx(want["std"], rel=1e-3, abs=1e-6), c


def test_golden_pipeline(outputs):
    g, v = outputs
    golden = json.load(open(GOLDEN))
    assert len(g) == golden["grid_rows"]
    assert len(v) == golden["velocity_rows"]
    _check(g, golden["grid"], list(golden["grid"]))
    _check(v, golden["velocity"], list(golden["velocity"]))


def test_baroclinic_integrates_to_zero(outputs):
    """Reference invariant (:1682): per-profile demeaned baroclinic velocity
    has zero mean."""
    _, v = outputs
    for c in ("v_E", "v_N"):
        assert np.nanmean(v[c].to_numpy(float)) == pytest.approx(0.0, abs=1e-9)
