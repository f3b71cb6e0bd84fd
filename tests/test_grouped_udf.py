"""GROUPED_AGG pandas-UDF surface (functions/grouped.py): trimmed mean vs
scipy-free python replay, null handling, and the trim=0 degenerate case."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from seaexplorertools_spark.functions.grouped import (
    group_trimmed_means,
    trimmed_mean_udf,
)


def _replay(vals, trim):
    s = sorted(v for v in vals if v is not None)
    if not s:
        return None
    k = int(len(s) * trim)
    kept = s[k : len(s) - k]
    return sum(kept) / len(kept)


def test_trimmed_mean_matches_replay(spark):
    rows = []
    vals = {
        "a": [10.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 1000.0, -500.0],
        "b": [5.0, None, 7.0],
        "c": [None, None],
        "d": [42.0],
    }
    i = 0
    for g, vs in vals.items():
        for v in vs:
            rows.append((i, g, v))
            i += 1
    df = spark.createDataFrame(rows, "rid bigint, grp string, v double")
    got = {
        r["grp"]: r["trimmed_mean"]
        for r in group_trimmed_means(df, ["grp"], "v", trim=0.1).collect()
    }
    for g, vs in vals.items():
        want = _replay(vs, 0.1)
        if want is None:
            assert got[g] is None or math.isnan(got[g])
        else:
            assert got[g] == pytest.approx(want, rel=1e-12)
    # the outliers must actually be trimmed for group a
    assert got["a"] == pytest.approx(5.5)


def test_trim_zero_equals_avg(spark, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("value").isNotNull())
    )
    got = {
        r["event_type"]: r["trimmed_mean"]
        for r in group_trimmed_means(ev, ["event_type"], "value", trim=0.0).collect()
    }
    want = {
        r["event_type"]: r["m"]
        for r in ev.groupBy("event_type").agg(F.avg("value").alias("m")).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_bad_trim_rejected():
    with pytest.raises(ValueError):
        trimmed_mean_udf(0.5)
    with pytest.raises(ValueError):
        trimmed_mean_udf(-0.1)
