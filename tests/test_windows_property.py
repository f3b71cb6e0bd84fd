"""Property-based window-kit tests vs pandas/numpy on random series with
NULL holes and duplicate-free random ordering keys."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from seaexplorertools_spark.operators import windows as W


@st.composite
def series(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    vals = [
        None if draw(st.booleans()) and draw(st.booleans()) else float(draw(st.integers(-50, 50)))
        for _ in range(n)
    ]
    return vals


def _df(spark, vals):
    return spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v double")


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=series(), n=st.integers(min_value=1, max_value=4))
def test_centered_mean_property(spark, vals, n):
    got = [
        r["m"]
        for r in _df(spark, vals).withColumn("m", W.centered_mean("v", n, [], ["i"])).orderBy("i").collect()
    ]
    s = pd.Series(vals, dtype=float)
    want = s.rolling(2 * n + 1, center=True, min_periods=1).mean()
    for g, w in zip(got, want):
        if pd.isna(w):
            assert g is None
        else:
            assert g == pytest.approx(w, rel=1e-12)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=series())
def test_cumsum_property(spark, vals):
    got = [
        r["c"]
        for r in _df(spark, vals).withColumn("c", W.cumsum("v", [], ["i"])).orderBy("i").collect()
    ]
    want = np.nancumsum([np.nan if v is None else v for v in vals])
    assert np.allclose(got, want)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=series())
def test_ffill_bfill_property(spark, vals):
    df = _df(spark, vals)
    f = [r["f"] for r in df.withColumn("f", W.ffill("v", [], ["i"])).orderBy("i").collect()]
    b = [r["b"] for r in df.withColumn("b", W.bfill("v", [], ["i"])).orderBy("i").collect()]
    s = pd.Series(vals, dtype=float)
    wf, wb = s.ffill(), s.bfill()
    for g, w in zip(f, wf):
        assert (g is None) == pd.isna(w) and (g is None or g == w)
    for g, w in zip(b, wb):
        assert (g is None) == pd.isna(w) and (g is None or g == w)
