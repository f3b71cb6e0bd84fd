#!/usr/bin/env python
"""Fleet e2e bench — measures the SCALING.md claim "at 100 TB the
parallelism axis is missions" instead of asserting it.

Architecture under test (the same composition tests/test_pipeline_scale.py
pins for correctness): the SHEAR stage runs per mission — its inputs are
per-mission scalar attrs (cell size, blanking distance) and it ends in
two driver-boundary scalars of its own (orientation detect, the regrid
depth-offset ladder), so one shear DAG per mission is the semantics, not
a limitation. The N shear DAGs are submitted CONCURRENTLY from driver
threads (Spark job scheduling interleaves their tasks across the
executor pool — on a cluster this is exactly N missions filling the
fleet). The per-mission frames are then combined by
``pipeline.combine_missions`` (mission tag + bounded-partition union +
eager lineage truncation — see pipeline/fleet.py for the measured
plan-explosion rationale) and the heavy GRID + VELOCITY stages run as
ONE combined DAG with ``mission_col`` partitioning and bucketed interp
joins.

If the per-mission windows/joins really partition by mission, wall time
should stay near-flat while N scales — the single-mission scheduling
floor (velocity's ~20 sequential tiny stages) amortizes across the
fleet. A slope near N would mean the engine serializes missions: the
scale-killer this bench exists to catch.

Usage:
    python scripts/fleet_bench.py [N ...]        # default: 1 8 32
    python scripts/fleet_bench.py --parity       # 2-mission fleet result
        parity vs solo runs (reference tolerance) instead of timing

Prints ONE JSON line: {"metric": "pipeline_e2e_fleet", "missions":
{"1": {...}, "8": {...}, "32": {...}}, ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DIVES = 20
BUCKET_US = 3600e6  # 1 h — far above the ~10 s sample gap, so exact
SHEAR_THREADS = 8  # concurrent per-mission shear submissions


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def build_fleet(spark, n_missions: int) -> list[dict]:
    """N distinct 20-dive missions (seeded fixtures, mission-unique
    profile_number ranges). Driver-side pandas — excluded from the
    timed section. Frames carry NO mission tag (per-mission shear sees
    exactly what a solo run sees); the tag is added at the union."""
    from tests.mission_fixture import make_mission

    fleet = []
    for k in range(n_missions):
        glider_pd, ping_pd, cells_pd, bt_pd, attrs = make_mission(
            n_dives=N_DIVES, seed=7 + k
        )
        glider_pd = glider_pd.copy()
        glider_pd["profile_number"] += 1000 * k
        fleet.append(
            {
                "k": k,
                "glider": spark.createDataFrame(glider_pd),
                "ping": spark.createDataFrame(ping_pd),
                "cells": spark.createDataFrame(cells_pd),
                "bt": spark.createDataFrame(bt_pd),
                "attrs": attrs,
            }
        )
    return fleet


def base_options():
    from seaexplorertools_spark.pipeline import default_options

    options = default_options()
    options["correctADCPHeading"] = False
    # bucketed interp joins in the per-mission shear too: the windows
    # partition by time bucket instead of going global (zero
    # unpartitioned-window warnings fleet-wide), and the bucket is far
    # above the sample gap so results are exact (parity-pinned)
    options["interp_bucket"] = BUCKET_US
    return options


def run_fleet(spark, fleet: list[dict], timed: bool = True):
    """One full fleet pass. Returns (wall, stages) when ``timed``, else
    the combined velocity DataFrame (parity mode)."""
    from seaexplorertools_spark.caching import release_consistency_caches
    from seaexplorertools_spark.pipeline import (
        combine_missions,
        grid_shear,
        shear_from_adcp,
        velocity_from_shear,
    )

    t0 = time.time()

    def shear_one(m: dict):
        gridded, ping_aug, opts = shear_from_adcp(
            m["cells"], m["ping"], m["glider"], m["attrs"], base_options()
        )
        gridded = gridded.cache()
        _noop(gridded)  # materialize: the shear stage's compute
        return gridded, ping_aug, opts

    with ThreadPoolExecutor(max_workers=min(len(fleet), SHEAR_THREADS)) as ex:
        sheared = list(ex.map(shear_one, fleet))
    t1 = time.time()

    # Union + lineage truncation (pipeline/fleet.py): the naive union of
    # N deep shear lineages is the measured scale-killer — 183 s velocity
    # / 40 s grid at N=32 of pure driver plan re-analysis, vs 14 s / 3 s
    # after combine_missions' eager localCheckpoint. The combine stage
    # also materializes ping_aug's lineage ONCE (previously recomputed
    # inside every downstream consumer).
    combined = combine_missions(
        [
            {"gridded": g, "ping_aug": p, "glider": m["glider"], "bt": m["bt"]}
            for (g, p, _), m in zip(sheared, fleet)
        ],
        mission_ids=[m["k"] for m in fleet],
    )
    gridded, ping_aug = combined["gridded"], combined["ping_aug"]
    glider, bt = combined["glider"], combined["bt"]
    t1b = time.time()
    opts = dict(sheared[0][2])
    opts["mission_col"] = "mission"
    opts["interp_bucket"] = BUCKET_US

    try:
        if not timed:
            out = velocity_from_shear(gridded, ping_aug, glider, bt, opts)
            return out.select(
                "mission", "profile_num", "depth_bin", "ADCP_E", "ADCP_N"
            ).toPandas()
        _noop(grid_shear(gridded, ping_aug, glider, opts))
        t2 = time.time()
        _noop(velocity_from_shear(gridded, ping_aug, glider, bt, opts))
        t3 = time.time()
    finally:
        for g, _, _ in sheared:
            g.unpersist()
        release_consistency_caches()
    return t3 - t0, {
        "shear": t1 - t0,
        "combine": t1b - t1,
        "grid": t2 - t1b,
        "velocity": t3 - t2,
    }


def time_fleet(spark, sizes: list[int], runs: int = 3) -> dict:
    out = {}
    for n in sizes:
        fleet = build_fleet(spark, n)
        samples, stage_runs = [], []
        for r in range(runs + 1):  # first run = warmup
            wall, stages = run_fleet(spark, fleet)
            if r:
                samples.append(wall)
                stage_runs.append(stages)
        samples_sorted = sorted(samples)
        med = samples_sorted[len(samples_sorted) // 2]
        med_idx = samples.index(med)
        out[str(n)] = {
            "wall_sec": round(med, 3),
            "spread": round(samples_sorted[-1] - samples_sorted[0], 3),
            "stages": {k: round(v, 3) for k, v in stage_runs[med_idx].items()},
        }
        print(f"# fleet n={n}: {out[str(n)]}", file=sys.stderr)
    return out


def parity(spark) -> int:
    """2-mission fleet (bt included) vs each solo run at the reference
    e2e tolerance (atol=1e-7, rtol=1e-3) — the full-pipeline twin of
    tests/test_pipeline_scale.py's velocity-stage parity."""
    import numpy as np

    from seaexplorertools_spark.pipeline import (
        shear_from_adcp,
        velocity_from_shear,
    )

    fleet = build_fleet(spark, 2)
    solo = {}
    for m in fleet:
        gridded, ping_aug, opts = shear_from_adcp(
            m["cells"], m["ping"], m["glider"], m["attrs"], base_options()
        )
        out = velocity_from_shear(gridded, ping_aug, m["glider"], m["bt"], opts)
        for r in out.select("profile_num", "depth_bin", "ADCP_E", "ADCP_N").collect():
            if r["profile_num"] is not None and r["depth_bin"] is not None:
                solo[(r["profile_num"], r["depth_bin"])] = (r["ADCP_E"], r["ADCP_N"])

    got_pd = run_fleet(spark, fleet, timed=False)
    got = {
        (r.profile_num, r.depth_bin): (r.ADCP_E, r.ADCP_N)
        for r in got_pd.itertuples()
        if r.profile_num is not None and r.depth_bin is not None
    }
    keys = sorted(solo)
    missing = [k for k in keys if k not in got]
    assert not missing, f"{len(missing)} solo grid keys missing from fleet run"

    def arr(d, i):
        return np.array(
            [np.nan if d[k][i] is None else d[k][i] for k in keys], dtype=float
        )

    ok = True
    for i, name in enumerate(("ADCP_E", "ADCP_N")):
        s, g = arr(solo, i), arr(got, i)
        if not np.allclose(g, s, atol=1e-7, rtol=1e-3, equal_nan=True):
            bad = (~np.isclose(g, s, atol=1e-7, rtol=1e-3, equal_nan=True)).sum()
            print(f"PARITY FAIL {name}: {bad}/{len(s)} cells differ")
            ok = False
    print(f"parity: {'PASS' if ok else 'FAIL'} over {len(keys)} grid cells")
    return 0 if ok else 1


def main() -> int:
    from seaexplorertools_spark.session import get_spark

    spark = get_spark("fleet_bench")
    spark.range(1000000).selectExpr("sum(id)").collect()  # JVM warmup
    args = sys.argv[1:]
    if args and args[0] == "--parity":
        return parity(spark)
    sizes = [int(a) for a in args] or [1, 8, 32]
    fleet = time_fleet(spark, sizes)
    record = {
        "metric": "pipeline_e2e_fleet",
        "unit": "sec",
        "missions": fleet,
        "n_dives_per_mission": N_DIVES,
        "mode": "warm (1 warmup + median of 3; per-mission shear submitted "
        "concurrently, combined grid+velocity with mission_col + bucketed "
        "interp joins; bottom track included)",
    }
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    sys.exit(main())
