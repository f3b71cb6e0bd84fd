"""End-to-end parity against an INDEPENDENT replay of the reference.

``tests/reference_replay.py`` re-implements the reference's three-stage
chain (process_adcp.py:2046-2083) in pure numpy/pandas, derived from the
reference source alone — it imports nothing from the engine. This test
runs both on the synthetic mission and compares at the reference's own
test tolerance (``tests/test_adcp_processing.py:48``:
``np.allclose(equal_nan=True, atol=1e-7, rtol=1e-3)``), making the
expected values come from code that shares nothing with the engine —
unlike ``golden_pipeline.json``, which is a self-snapshot regression
guard.

Compared surfaces:
- stage-1 gridded cells: E/N/U and Sh_E/Sh_N/Sh_U per (ping, gridded_bin)
- stage-2 grid: Sh_E/Sh_N/Sh_U per (profile, depth bin), NaN masks equal
- stage-3 velocity: ADCP_E/ADCP_N per (profile, depth bin), NaN masks equal
- DAC columns per glider row; surface drift per dive; bottom track per ping
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import reference_replay as RR
from seaexplorertools_spark.pipeline import (
    default_options,
    grid_shear,
    shear_from_adcp,
    velocity_from_shear,
)
from tests.mission_fixture import make_mission

ATOL, RTOL = 1e-7, 1e-3  # the reference's own test tolerance


@pytest.fixture(scope="module")
def mission():
    return make_mission()


@pytest.fixture(scope="module")
def replica(mission):
    glider_pd, ping_pd, cells_pd, bt_pd, attrs = mission
    ropts = {
        "correlationThreshold": 70.0,
        "ampThreshold": 75.0,
        "velocityThreshold": 0.8,
        "ADCP_regrid_correlation_threshold": 20.0,
        "y_res": 1.0,
    }
    adcp = RR.replay_shear_from_adcp(glider_pd, ping_pd, cells_pd, attrs, ropts)
    grid = RR.replay_grid_shear(adcp, glider_pd, ropts)
    vel = RR.replay_velocity_from_shear(adcp, glider_pd, bt_pd, ropts)
    return adcp, grid, vel


@pytest.fixture(scope="module")
def engine(spark, mission):
    glider_pd, ping_pd, cells_pd, bt_pd, attrs = mission
    options = default_options()
    options["correctADCPHeading"] = False
    glider = spark.createDataFrame(glider_pd)
    gridded, ping_aug, options = shear_from_adcp(
        spark.createDataFrame(cells_pd),
        spark.createDataFrame(ping_pd),
        glider,
        attrs,
        options,
    )
    gridded = gridded.cache()
    g = grid_shear(gridded, ping_aug, glider, options).toPandas()
    v = velocity_from_shear(
        gridded, ping_aug, glider, spark.createDataFrame(bt_pd), options
    ).toPandas()
    return gridded, ping_aug, g, v, options


def _to_matrix(df, col, xaxis, yaxis):
    """Long engine grid rows → the replica's [len(yaxis), len(xaxis)]
    matrix. Reference column i holds the rows whose profile number equals
    xaxis[i+1] (pd.cut right-closed on unit-spaced integer edges); depth
    row j is depth_bin j."""
    m = np.full((len(yaxis), len(xaxis)), np.nan)
    prof = df["profile_num"].to_numpy(float)
    dep = df["depth_bin"].to_numpy(float)
    val = df[col].to_numpy(float)
    x0 = xaxis[0]
    for p, j, x in zip(prof, dep, val):
        if not (np.isfinite(p) and np.isfinite(j)):
            continue
        i = int(p - x0) - 1
        jj = int(j)
        if 0 <= i < len(xaxis) and 0 <= jj < len(yaxis):
            m[jj, i] = x
    return m


def _assert_grid_parity(em, rm, name, min_cells):
    assert (np.isfinite(em) == np.isfinite(rm)).all(), f"{name}: NaN masks differ"
    n = int(np.isfinite(rm).sum())
    assert n >= min_cells, f"{name}: only {n} finite cells — fixture degenerated"
    assert np.allclose(em, rm, equal_nan=True, atol=ATOL, rtol=RTOL), (
        f"{name}: max abs diff "
        f"{np.nanmax(np.abs(em - rm))}"
    )


def test_stage1_gridded_cells_match(engine, replica):
    """E/N/U and shear per (ping, gridded_bin) — the stage-1 long table
    against the replica's matrices, exact alignment on (time, offset)."""
    gridded = engine[0]
    adcp = replica[0]
    pdf = gridded.select(
        "time_us", "gridded_bin", "e", "n", "u", "sh_e", "sh_n", "sh_u"
    ).toPandas()
    t_index = {t: i for i, t in enumerate(adcp["time_us"])}
    for eng_col, rep_key, min_cells in [
        ("e", "E", 2000), ("n", "N", 2000), ("u", "U", 2000),
        # shear needs ≥2 consecutive finite bins (central diff) — sparser
        ("sh_e", "Sh_E", 800), ("sh_n", "Sh_N", 800), ("sh_u", "Sh_U", 800),
    ]:
        em = np.full_like(adcp[rep_key], np.nan)
        rows = pdf["time_us"].map(t_index).to_numpy()
        cols = pdf["gridded_bin"].to_numpy(int)
        em[rows, cols] = pdf[eng_col].to_numpy(float)
        rm = adcp[rep_key]
        assert (np.isfinite(em) == np.isfinite(rm)).all(), eng_col
        assert int(np.isfinite(rm).sum()) > min_cells, eng_col
        assert np.allclose(em, rm, equal_nan=True, atol=ATOL, rtol=RTOL), eng_col


def test_stage2_shear_grids_match(engine, replica):
    g = engine[2]
    grid = replica[1]
    xaxis, yaxis = grid["xaxis"], grid["yaxis"]
    for col in ("Sh_E", "Sh_N", "Sh_U"):
        em = _to_matrix(g, col, xaxis, yaxis)
        _assert_grid_parity(em, grid[col], col, min_cells=400)


def test_stage3_velocity_match(engine, replica):
    v = engine[3]
    vel = replica[2]
    xaxis, yaxis = vel["xaxis"], vel["yaxis"]
    for col in ("ADCP_E", "ADCP_N"):
        em = _to_matrix(v, col, xaxis, yaxis)
        _assert_grid_parity(em, vel[col], col, min_cells=400)


def test_dac_columns_match(spark, engine, replica, mission):
    """get_DAC parity per glider row (reference :1327-1432)."""
    from seaexplorertools_spark.pipeline.velocity import get_dac

    glider_pd = mission[0]
    ping_aug, options = engine[1], engine[4]
    out = (
        get_dac(ping_aug, spark.createDataFrame(glider_pd), options)
        .select("time_us", "speed_e", "speed_n", "dac_e", "dac_n")
        .toPandas()
        .sort_values("time_us")
        .reset_index(drop=True)
    )
    rg = replica[2]["glider_dac"].sort_values("time_us").reset_index(drop=True)
    assert (out["time_us"].to_numpy() == rg["time_us"].to_numpy()).all()
    for eng_col, rep_col in [
        ("speed_e", "speed_e"), ("speed_n", "speed_n"),
        ("dac_e", "DAC_E"), ("dac_n", "DAC_N"),
    ]:
        e = out[eng_col].to_numpy(float)
        r = rg[rep_col].to_numpy(float)
        assert np.allclose(e, r, equal_nan=True, atol=ATOL, rtol=RTOL), eng_col


def test_surface_drift_matches(spark, engine, replica, mission):
    """getSurfaceDrift parity per dive (reference :1435-1477)."""
    from seaexplorertools_spark.pipeline.velocity import get_dac, surface_drift

    glider_pd = mission[0]
    ping_aug, options = engine[1], engine[4]
    gl = get_dac(ping_aug, spark.createDataFrame(glider_pd), options)
    drift = surface_drift(gl, options).toPandas().set_index("diveNum").sort_index()
    dE, dN, dT = replica[2]["drift"]
    for dive in drift.index:
        i = int(dive) - 1
        assert np.isclose(drift.loc[dive, "drift_e"], dE[i], atol=ATOL, rtol=RTOL)
        assert np.isclose(drift.loc[dive, "drift_n"], dN[i], atol=ATOL, rtol=RTOL)
        assert np.isclose(drift.loc[dive, "drift_t"], dT[i], atol=1e-3, rtol=RTOL)
    # every replica dive with a finite drift must be present in the engine
    assert len(drift) == int(np.isfinite(dE).sum())


def test_bottom_track_matches(spark, engine, replica, mission):
    """bottom_track parity per ping (reference :1480-1597)."""
    from seaexplorertools_spark.pipeline.velocity import bottom_track

    bt_pd = mission[3]
    ping_aug, options = engine[1], engine[4]
    out = (
        bottom_track(spark.createDataFrame(bt_pd), ping_aug, options)
        .select("time_us", "bt_e", "bt_n", "bt_u")
        .toPandas()
        .sort_values("time_us")
        .reset_index(drop=True)
    )
    adcp = replica[0]
    be, bn, bu = replica[2]["bt"]
    assert (out["time_us"].to_numpy() == adcp["time_us"]).all()
    for eng_col, rep in [("bt_e", be), ("bt_n", bn), ("bt_u", bu)]:
        e = out[eng_col].to_numpy(float)
        assert (np.isfinite(e) == np.isfinite(rep)).all(), eng_col
        assert int(np.isfinite(rep).sum()) >= 10, eng_col
        assert np.allclose(e, rep, equal_nan=True, atol=ATOL, rtol=RTOL), eng_col


def test_stage1_with_shear_correction_enabled(spark, mission):
    """O3 parity under an INDEPENDENT replay: rerun stage 1 with
    correctZZshear + correctYshear ON — selection band, per-bin mean
    difference, NaN-poisoned cumsum, demean, component subtraction and the
    XYZZ round-trip must all match the reference math (replayed from
    process_adcp.py:682-784, sharing nothing with the engine)."""
    glider_pd, ping_pd, cells_pd, bt_pd, attrs = mission
    options = default_options()
    options["correctADCPHeading"] = False
    options["correctZZshear"] = True
    options["correctYshear"] = True
    glider = spark.createDataFrame(glider_pd)
    gridded, ping_aug, options = shear_from_adcp(
        spark.createDataFrame(cells_pd),
        spark.createDataFrame(ping_pd),
        glider,
        attrs,
        options,
    )
    pdf = gridded.select(
        "time_us", "gridded_bin", "e", "n", "u", "sh_e", "sh_n", "sh_u"
    ).toPandas()

    ropts = {
        "correlationThreshold": 70.0,
        "ampThreshold": 75.0,
        "velocityThreshold": 0.8,
        "ADCP_regrid_correlation_threshold": 20.0,
        "y_res": 1.0,
        "correctZZshear": True,
        "correctYshear": True,
    }
    adcp = RR.replay_shear_from_adcp(glider_pd, ping_pd, cells_pd, attrs, ropts)
    t_index = {t: i for i, t in enumerate(adcp["time_us"])}
    n_checked = 0
    for eng_col, rep_key in [("e", "E"), ("n", "N"), ("u", "U"), ("sh_e", "Sh_E")]:
        em = np.full_like(adcp[rep_key], np.nan)
        rows = pdf["time_us"].map(t_index).to_numpy()
        cols = pdf["gridded_bin"].to_numpy(int)
        em[rows, cols] = pdf[eng_col].to_numpy(float)
        rm = adcp[rep_key]
        assert (np.isfinite(em) == np.isfinite(rm)).all(), eng_col
        assert np.allclose(em, rm, equal_nan=True, atol=ATOL, rtol=RTOL), (
            eng_col, float(np.nanmax(np.abs(em - rm)))
        )
        n_checked += int(np.isfinite(rm).sum())
    assert n_checked > 5000
    # the correction must have CHANGED something vs the flags-off replica
    base = RR.replay_shear_from_adcp(
        glider_pd, ping_pd, cells_pd, attrs,
        {k: v for k, v in ropts.items() if not k.startswith("correct")},
    )
    both = np.isfinite(adcp["E"]) & np.isfinite(base["E"])
    assert np.nanmax(np.abs(adcp["E"][both] - base["E"][both])) > 1e-6
