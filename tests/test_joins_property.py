"""Property-based tests (hypothesis) for interp_join / asof_join vs
numpy/pandas ground truth — random sample/probe sets, including duplicates,
NULL holes, empty sides, and out-of-hull probes."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from seaexplorertools_spark.operators.joins import asof_join, interp_join


@st.composite
def series_case(draw):
    n_s = draw(st.integers(min_value=0, max_value=25))
    n_p = draw(st.integers(min_value=1, max_value=25))
    xs = sorted(draw(st.lists(st.integers(0, 1000), min_size=n_s, max_size=n_s, unique=True)))
    ys = [
        None if draw(st.booleans()) and draw(st.booleans()) else float(draw(st.integers(-100, 100)))
        for _ in xs
    ]
    xp = draw(st.lists(st.integers(-100, 1100), min_size=n_p, max_size=n_p, unique=True))
    return xs, ys, xp


def _ref_interp(xs, ys, xp):
    x = np.array(xs, float)
    y = np.array([np.nan if v is None else v for v in ys], float)
    gg = np.isfinite(x) & np.isfinite(y)
    out = []
    for t in xp:
        if gg.sum() == 0 or t < x[gg].min() or t > x[gg].max():
            out.append(np.nan)
        else:
            out.append(float(np.interp(t, x[gg], y[gg])))
    return out


@pytest.mark.usefixtures("spark")
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(case=series_case())
def test_interp_join_property(spark, case):
    xs, ys, xp = case
    samples = spark.createDataFrame(
        list(zip(map(float, xs), ys)) or [(None, None)], "t double, v double"
    ).filter("t is not null")
    probes = spark.createDataFrame([(float(t),) for t in xp], "t double")
    got = {r["t"]: r["vi"] for r in interp_join(samples, probes, "t", ["v"], suffix="i").collect()}
    want = dict(zip(map(float, xp), _ref_interp(xs, ys, xp)))
    assert set(got) == set(want)
    for t in want:
        if np.isnan(want[t]):
            assert got[t] is None, (t, got[t])
        else:
            assert got[t] == pytest.approx(want[t], rel=1e-12), t


@pytest.mark.usefixtures("spark")
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(case=series_case())
def test_asof_nearest_property(spark, case):
    xs, ys, xp = case
    xs_f = [x for x, y in zip(xs, ys) if y is not None]
    ys_f = [y for y in ys if y is not None]
    samples = spark.createDataFrame(
        list(zip(map(float, xs_f), ys_f)) or [(None, None)], "t double, v double"
    ).filter("t is not null")
    probes = spark.createDataFrame([(float(t),) for t in xp], "t double")
    got = {r["t"]: r["v"] for r in asof_join(samples, probes, "t", ["v"]).collect()}
    x = np.array(xs_f, float)
    for t in xp:
        if len(x) == 0:
            assert got[float(t)] is None
        else:
            idx = int(np.argmin(np.abs(t - x)))  # first minimum ⇒ earlier wins ties
            assert got[float(t)] == pytest.approx(ys_f[idx]), t
