"""binned_agg_2d vs the reference grid2d (pd.cut + groupby) semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from seaexplorertools_spark.operators.grid import binned_agg_2d, densify, histogram


def _grid2d_ref(x, y, v, xi, yi, fn="mean"):
    # faithful re-implementation of reference grid2d (process_adcp.py:117-134)
    grid = {}
    df = pd.DataFrame({"x": pd.cut(x, xi, labels=False), "y": pd.cut(y, yi, labels=False), "v": v})
    agg = df.groupby(["x", "y"]).agg(fn).reset_index()
    for _, r in agg.iterrows():
        grid[(int(r["x"]), int(r["y"]))] = r["v"]
    return grid


@pytest.fixture(scope="module")
def cloud(spark):
    rng = np.random.default_rng(11)
    x = rng.uniform(0, 100, 5000)
    y = rng.uniform(0, 50, 5000)
    v = rng.normal(10, 3, 5000)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x, y, v)], "x double, y double, v double"
    )
    return x, y, v, df


@pytest.mark.parametrize("fn", ["mean", "median", "count"])
def test_binned_agg_matches_pandas_cut(cloud, fn):
    x, y, v, df = cloud
    # pd.cut is right-closed → closed='right'
    want = _grid2d_ref(x, y, v, np.arange(0, 101, 10), np.arange(0, 51, 5), fn)
    agg = {"mean": F.avg("v"), "median": F.median("v"), "count": F.count("v")}[fn]
    got = {
        (r["xbin"], r["ybin"]): r["g"]
        for r in binned_agg_2d(df, "x", "y", {"g": agg}, 0, 10, 0, 5, closed="right").collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9), (k, fn)


def test_densify_fills_grid(cloud):
    _, _, _, df = cloud
    g = binned_agg_2d(df, "x", "y", {"n": F.count("v")}, 0, 10, 0, 5)
    dense = densify(g, (0, 9), (0, 9))
    assert dense.count() == 100


def test_histogram_density(spark):
    rng = np.random.default_rng(5)
    vals = rng.normal(0, 1, 2000)
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    got = {r["bin"]: (r["n"], r["pdf"]) for r in histogram(df, "v", -3, 3, 12).collect()}
    want_n, edges = np.histogram(vals, bins=12, range=(-3, 3))
    want_pdf, _ = np.histogram(vals, bins=12, range=(-3, 3), density=True)
    for i in range(12):
        if want_n[i] == 0:
            assert i not in got
        else:
            n, pdf = got[i]
            assert n == want_n[i]
            assert pdf == pytest.approx(want_pdf[i], rel=1e-6)
