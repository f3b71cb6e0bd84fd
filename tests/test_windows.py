"""Window kit vs numpy/pandas ground truth (reference W1–W8 semantics)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from seaexplorertools_spark.operators import windows as W


def _running_mean_ref(x, n):
    # reference RunningMean (process_adcp.py:137-141): NaN-padded, nanmean
    grid = np.ones((len(x) + 2 * n, 1 + 2 * n)) * np.nan
    for istep in range(grid.shape[1]):
        grid[istep : len(x) + istep, istep] = x
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return np.nanmean(grid, axis=1)[n:-n]


@pytest.fixture(scope="module")
def tsdf(spark):
    rng = np.random.default_rng(3)
    x = rng.normal(size=100)
    x[rng.integers(0, 100, 10)] = np.nan
    df = spark.createDataFrame(
        [(i, None if np.isnan(v) else float(v)) for i, v in enumerate(x)], "i long, v double"
    )
    return x, df


def test_centered_mean(tsdf):
    x, df = tsdf
    got = [
        r["m"]
        for r in df.withColumn("m", W.centered_mean("v", 3, [], ["i"])).orderBy("i").collect()
    ]
    want = _running_mean_ref(x, 3)
    got = np.array([np.nan if g is None else g for g in got])
    assert np.allclose(got, want, equal_nan=True)


def test_central_diff_matches_gradient(spark):
    t = np.array([0.0, 1.0, 3.0, 6.0, 10.0])
    v = np.array([0.0, 2.0, 3.0, 9.0, 11.0])
    df = spark.createDataFrame([(float(a), float(b)) for a, b in zip(t, v)], "t double, v double")
    got = [r["g"] for r in df.withColumn("g", W.central_diff("v", "t", [], ["t"])).orderBy("t").collect()]
    want = np.gradient(v, t)
    assert np.allclose(got, want)


def test_cumsum_nan_as_zero_and_reverse(spark):
    v = [1.0, None, 2.0, 3.0, None]
    df = spark.createDataFrame([(i, x) for i, x in enumerate(v)], "i long, v double")
    fwd = [r["c"] for r in df.withColumn("c", W.cumsum("v", [], ["i"])).orderBy("i").collect()]
    assert fwd == [1.0, 1.0, 3.0, 6.0, 6.0]
    rev = [r["c"] for r in df.withColumn("c", W.cumsum("v", [], ["i"], reverse=True)).orderBy("i").collect()]
    assert rev == [6.0, 5.0, 5.0, 3.0, 0.0]


def test_cumsum_reset(spark):
    # reference reset_transport_at_GPS (:1329-1333): re-zero at marker rows
    rows = [(0, 1.0, False), (1, 1.0, False), (2, 1.0, True), (3, 2.0, False), (4, 1.0, True), (5, 5.0, False)]
    df = spark.createDataFrame(rows, "i long, v double, gps boolean")
    got = [
        r["c"]
        for r in df.withColumn("c", W.cumsum_reset("v", F.col("gps"), [], ["i"])).orderBy("i").collect()
    ]
    assert got == [1.0, 2.0, 0.0, 2.0, 0.0, 5.0]


def test_ffill_bfill_demean(spark):
    df = spark.createDataFrame(
        [(0, None), (1, 5.0), (2, None), (3, 7.0), (4, None)], "i long, v double"
    )
    f = [r["f"] for r in df.withColumn("f", W.ffill("v", [], ["i"])).orderBy("i").collect()]
    b = [r["b"] for r in df.withColumn("b", W.bfill("v", [], ["i"])).orderBy("i").collect()]
    assert f == [None, 5.0, 5.0, 7.0, 7.0]
    assert b == [5.0, 5.0, 7.0, 7.0, None]
    d = [r["d"] for r in df.withColumn("d", W.demean("v", [])).orderBy("i").collect()]
    assert d[1] == -1.0 and d[3] == 1.0 and d[0] is None


def test_tail_flag(spark):
    df = spark.createDataFrame(
        [(i, float(i) if i % 3 else None) for i in range(12)], "depth long, v double"
    )
    got = {
        r["depth"]: r["tf"]
        for r in df.withColumn(
            "tf", W.tail_flag("v", 3, [], [F.col("depth").desc()])
        ).collect()
    }
    deepest_nonnull = [i for i in range(11, -1, -1) if i % 3][:3]
    for i in range(12):
        assert got[i] == (i in deepest_nonnull), (i, got[i])


def test_bfill_rejects_sortorder_keys(spark):
    """bfill reverses the sort internally; a caller-supplied SortOrder
    (.desc()/.asc()) would nest SortOrders and only explode at runtime as
    Spark INTERNAL_ERROR — reject it loudly at build time instead."""
    df = spark.createDataFrame([(0, 1.0)], "i long, v double")
    with pytest.raises(TypeError, match="plain ascending"):
        df.withColumn("b", W.bfill("v", [], [F.col("i").desc()]))
    with pytest.raises(TypeError, match="plain ascending"):
        df.withColumn("b", W.bfill("v", [], [F.col("i").asc()]))
    # bare Column keys (the documented API) still work
    got = df.withColumn("b", W.bfill("v", [], [F.col("i")])).collect()
    assert got[0]["b"] == 1.0
