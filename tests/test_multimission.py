"""Multi-mission partitioning: two missions with OVERLAPPING clocks in one
DataFrame, processed with options['mission_col'], must reproduce each
single-mission result exactly (no cross-mission window leakage) — the
100 TB shape is many missions, not one long one."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from seaexplorertools_spark.pipeline import default_options, shear_from_adcp
from seaexplorertools_spark.pipeline.velocity import get_dac, surface_drift
from tests.mission_fixture import make_mission


def _mission(spark, seed, mission_id, prof_offset):
    glider_pd, ping_pd, cells_pd, bt_pd, attrs = make_mission(n_dives=3, seed=seed)
    glider_pd = glider_pd.copy()
    glider_pd["profile_number"] += prof_offset
    glider = spark.createDataFrame(glider_pd).withColumn("mission", F.lit(mission_id))
    ping = spark.createDataFrame(ping_pd).withColumn("mission", F.lit(mission_id))
    cells = spark.createDataFrame(cells_pd)
    return glider, ping, cells, attrs


@pytest.fixture(scope="module")
def two_missions(spark):
    a = _mission(spark, 7, "A", 0)
    b = _mission(spark, 11, "B", 1000)
    return a, b


def _dac_map(df, with_mission):
    cols = ["time_us", "dac_e", "dac_n", "speed_e"]
    if with_mission:
        cols = ["mission"] + cols
    out = {}
    for r in df.select(*cols).collect():
        key = (r["mission"], r["time_us"]) if with_mission else r["time_us"]
        out[key] = (r["dac_e"], r["dac_n"], r["speed_e"])
    return out


def test_get_dac_mission_isolation(spark, two_missions):
    (ga, pa, ca, attrs), (gb, pb, cb, _) = two_missions
    base = default_options()
    base["correctADCPHeading"] = False

    # single-mission runs (global windows)
    _, ping_a, opts_a = shear_from_adcp(ca, pa.drop("mission"), ga.drop("mission"), attrs, dict(base))
    _, ping_b, opts_b = shear_from_adcp(cb, pb.drop("mission"), gb.drop("mission"), attrs, dict(base))
    solo_a = _dac_map(get_dac(ping_a, ga.drop("mission"), opts_a), False)
    solo_b = _dac_map(get_dac(ping_b, gb.drop("mission"), opts_b), False)

    # combined run partitioned by mission (clocks overlap!)
    combined_glider = ga.unionByName(gb)
    combined_ping = ping_a.withColumn("mission", F.lit("A")).unionByName(
        ping_b.withColumn("mission", F.lit("B"))
    )
    opts = dict(opts_a)
    opts["mission_col"] = "mission"
    both = _dac_map(get_dac(combined_ping, combined_glider, opts), True)

    assert len(both) == len(solo_a) + len(solo_b)
    for t, want in solo_a.items():
        got = both[("A", t)]
        for g, w in zip(got, want):
            assert (g is None and w is None) or g == pytest.approx(w, rel=1e-12), t
    for t, want in solo_b.items():
        got = both[("B", t)]
        for g, w in zip(got, want):
            assert (g is None and w is None) or g == pytest.approx(w, rel=1e-12), t


def test_surface_drift_mission_isolation(spark, two_missions):
    (ga, pa, ca, attrs), (gb, pb, cb, _) = two_missions
    base = default_options()
    base["correctADCPHeading"] = False
    _, ping_a, opts_a = shear_from_adcp(ca, pa.drop("mission"), ga.drop("mission"), attrs, dict(base))
    solo = {
        r["diveNum"]: (r["drift_e"], r["drift_n"])
        for r in surface_drift(ga.drop("mission"), opts_a).collect()
    }
    combined = ga.unionByName(gb)
    opts = dict(opts_a)
    opts["mission_col"] = "mission"
    both = {
        (r["mission"], r["diveNum"]): (r["drift_e"], r["drift_n"])
        for r in surface_drift(combined, opts).collect()
    }
    for d, want in solo.items():
        got = both[("A", d)]
        for g, w in zip(got, want):
            assert (g is None and w is None) or g == pytest.approx(w, rel=1e-12), d


def test_velocity_from_shear_mission_isolation(spark, two_missions):
    """Full stage 3 end-to-end with mission_col: per-mission ADCP_E/N equal
    the single-mission runs exactly (incl. per-mission bias fits and
    partitioned bottom-track matching with overlapping clocks)."""
    from seaexplorertools_spark.pipeline import velocity_from_shear

    (ga, pa, ca, attrs), (gb, pb, cb, _) = two_missions
    base = default_options()
    base["correctADCPHeading"] = False

    grids, pings = {}, {}
    solo = {}
    for mid, (g, p, c) in {"A": (ga, pa, ca), "B": (gb, pb, cb)}.items():
        gridded, ping_aug, opts = shear_from_adcp(
            c, p.drop("mission"), g.drop("mission"), attrs, dict(base)
        )
        gridded = gridded.cache()
        grids[mid], pings[mid] = gridded, ping_aug
        out = velocity_from_shear(gridded, ping_aug, g.drop("mission"), None, opts)
        solo[mid] = {
            (r["profile_num"], r["depth_bin"]): (r["ADCP_E"], r["ADCP_N"])
            for r in out.select("profile_num", "depth_bin", "ADCP_E", "ADCP_N").collect()
        }

    combined_glider = ga.unionByName(gb)
    combined_ping = pings["A"].withColumn("mission", F.lit("A")).unionByName(
        pings["B"].withColumn("mission", F.lit("B"))
    )
    combined_cells = grids["A"].unionByName(grids["B"])
    opts = dict(base)
    opts["top_mounted"] = False
    opts["mission_col"] = "mission"
    both = velocity_from_shear(combined_cells, combined_ping, combined_glider, None, opts)
    got = {
        (r["profile_num"], r["depth_bin"]): (r["ADCP_E"], r["ADCP_N"])
        for r in both.select("profile_num", "depth_bin", "ADCP_E", "ADCP_N").collect()
    }

    want = {**solo["A"], **solo["B"]}
    assert got.keys() == want.keys()
    n_checked = 0
    for k, (we, wn) in want.items():
        ge, gn = got[k]
        if we is None:
            assert ge is None, k
        else:
            assert ge == pytest.approx(we, rel=1e-9, abs=1e-12), k
            n_checked += 1
        if wn is None:
            assert gn is None, k
        else:
            assert gn == pytest.approx(wn, rel=1e-9, abs=1e-12), k
    assert n_checked > 50


def _unpartitioned_windows(df) -> int:
    """Count window specs with NO partition key in the formatted physical
    plan (the scripts/audit_plans.py detector)."""
    import re

    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    n = 0
    for spec in re.findall(r"windowspecdefinition\((.*?)specifiedwindowframe", plan):
        head = [a.strip() for a in spec.split(",") if a.strip()]
        if not any((" ASC" not in a and " DESC" not in a) for a in head):
            n += 1
    return n


def test_mission_partitioned_plans_have_no_global_windows(spark, two_missions):
    """With options['mission_col'] set, EVERY window in the DAC and
    referencing plans must carry a partition key — a single unpartitioned
    window would serialize the whole fleet of missions through one task."""
    from seaexplorertools_spark.pipeline.velocity import reference_shear

    (ga, pa, ca, attrs), (gb, pb, cb, _) = two_missions
    base = default_options()
    base["correctADCPHeading"] = False
    gridded_a, ping_a, opts = shear_from_adcp(
        ca, pa.drop("mission"), ga.drop("mission"), attrs, dict(base)
    )
    combined_glider = ga.unionByName(gb)
    combined_ping = ping_a.withColumn("mission", F.lit("A"))
    opts = dict(opts)
    opts["mission_col"] = "mission"

    dac = get_dac(combined_ping, combined_glider, opts)
    assert _unpartitioned_windows(dac) == 0

    # cut the stage-1 lineage: stage 1 runs per mission by design (its
    # global interp windows are the documented single-series semantics),
    # so the assertion targets the stage-3 plan alone
    gridded = gridded_a.localCheckpoint(eager=True)
    ref = reference_shear(gridded, dac, opts)
    assert _unpartitioned_windows(ref) == 0
