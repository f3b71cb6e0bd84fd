"""regrid_interp implementation equivalence: the pure-JVM union+window
formulation must produce the same grid as the mapInPandas/numpy paths
(reference regridADCPdata semantics: NaN outside hull, per-value
null-skipping, first-occurrence x dedup)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from seaexplorertools_spark.operators.regrid import regrid_interp

LADDER = [0.0, 2.5, 5.0, 7.5, 10.0, 12.5]


@pytest.fixture(scope="module")
def sample_df(spark):
    rng = np.random.default_rng(11)
    rows = []
    order = 0
    for g in range(40):
        n = int(rng.integers(2, 15))
        xs = np.sort(rng.uniform(0, 12, n))
        for x in xs:
            v = float(rng.normal()) if rng.random() > 0.15 else None
            w = float(rng.normal()) if rng.random() > 0.3 else None
            rows.append((g, order, float(x), v, w))
            order += 1
    # a group with a single sample and one with none finite
    rows.append((90, order, 4.0, 1.5, None)); order += 1
    rows.append((91, order, 3.0, None, None)); order += 1
    # duplicate x: first occurrence (by ord) must win
    rows.append((92, order, 5.0, 10.0, 1.0)); order += 1
    rows.append((92, order, 5.0, 99.0, 2.0)); order += 1
    rows.append((92, order, 8.0, 20.0, 3.0)); order += 1
    return spark.createDataFrame(
        rows, "g long, ord long, x double, v double, w double"
    )


def _collect(df):
    out = {}
    for r in df.collect():
        out[(r["g"], r["x_target"])] = (r["v"], r["w"])
    return out


def test_jvm_matches_mapinpandas(sample_df):
    jvm = _collect(
        regrid_interp(sample_df, ["g"], "x", ["v", "w"], LADDER, impl="jvm", order_col="ord")
    )
    py = _collect(
        regrid_interp(sample_df, ["g"], "x", ["v", "w"], LADDER, impl="partitions")
    )
    assert set(jvm) == set(py)
    for k in jvm:
        for a, b in zip(jvm[k], py[k]):
            if a is None or (isinstance(a, float) and math.isnan(a)):
                assert b is None or (isinstance(b, float) and math.isnan(b)), k
            else:
                assert b == pytest.approx(a, rel=1e-9, abs=1e-12), k


def test_jvm_dedup_first_occurrence(sample_df):
    out = regrid_interp(
        sample_df.filter(F.col("g") == 92),
        ["g"], "x", ["v", "w"], [5.0, 6.5, 8.0], impl="jvm", order_col="ord",
    ).orderBy("x_target").collect()
    assert [r["v"] for r in out] == [10.0, pytest.approx(15.0), 20.0]


def test_jvm_null_outside_hull(sample_df):
    out = regrid_interp(
        sample_df.filter(F.col("g") == 90),
        ["g"], "x", ["v"], [0.0, 4.0, 10.0], impl="jvm", order_col="ord",
    ).orderBy("x_target").collect()
    assert out[0]["v"] is None  # below hull
    assert out[1]["v"] == 1.5   # exact hit on the single sample
    assert out[2]["v"] is None  # above hull
