"""interp_join / asof_join vs numpy/scipy ground truth (reference semantics:
process_adcp.py:144-146 interp1d NaN-fill; :1503-1507 argmin-|dt| nearest).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from seaexplorertools_spark.operators.joins import asof_join, interp_join


def _ref_interp(x, y, xi):
    gg = np.isfinite(x + y)
    xg, yg = x[gg], y[gg]
    out = np.interp(xi, xg, yg, left=np.nan, right=np.nan)
    # np.interp clamps at the right edge; reference interp1d returns NaN
    # strictly outside the hull but the exact right-edge point is inside.
    out[xi > xg.max()] = np.nan
    out[xi < xg.min()] = np.nan
    return out


@pytest.fixture(scope="module")
def series(spark):
    rng = np.random.default_rng(7)
    t_s = np.sort(rng.uniform(0, 1000, 300))
    v = np.sin(t_s / 50.0) * 10
    v[rng.integers(0, 300, 30)] = np.nan  # null holes → finite-pair skipping
    t_p = np.sort(rng.uniform(-50, 1100, 200))
    samples = spark.createDataFrame(
        [(float(a), None if np.isnan(b) else float(b)) for a, b in zip(t_s, v)],
        "t double, v double",
    )
    probes = spark.createDataFrame([(int(i), float(a)) for i, a in enumerate(t_p)], "pid long, t double")
    return t_s, v, t_p, samples, probes


def test_interp_join_matches_numpy(series):
    t_s, v, t_p, samples, probes = series
    got = {
        r["pid"]: r["vi"]
        for r in interp_join(samples, probes, on="t", values=["v"], suffix="i")
        .select("pid", "vi")
        .collect()
    }
    want = _ref_interp(t_s, v, t_p)
    got_arr = np.array([np.nan if got[i] is None else got[i] for i in range(len(t_p))])
    assert np.allclose(got_arr, want, equal_nan=True, rtol=1e-9, atol=1e-12)


def test_interp_join_bucketed_matches_global(series):
    t_s, v, t_p, samples, probes = series
    glob = interp_join(samples, probes, on="t", values=["v"], suffix="i")
    buck = interp_join(samples, probes, on="t", values=["v"], bucket=100.0, suffix="i")
    g = {r["pid"]: r["vi"] for r in glob.select("pid", "vi").collect()}
    b = {r["pid"]: r["vi"] for r in buck.select("pid", "vi").collect()}
    assert set(g) == set(b)
    for k in g:
        if g[k] is None:
            assert b[k] is None
        else:
            assert b[k] == pytest.approx(g[k], rel=1e-12)


def test_interp_join_exact_hit(spark):
    samples = spark.createDataFrame([(0.0, 1.0), (10.0, 3.0)], "t double, v double")
    probes = spark.createDataFrame([(10.0,), (0.0,), (5.0,), (11.0,)], "t double")
    rows = {r["t"]: r["v"] for r in interp_join(samples, probes, "t", ["v"]).collect()}
    assert rows[0.0] == 1.0 and rows[10.0] == 3.0 and rows[5.0] == 2.0 and rows[11.0] is None


def test_asof_nearest_matches_argmin(series):
    t_s, v, t_p, samples, probes = series
    got = {
        r["pid"]: r["tm"]
        for r in asof_join(
            samples.select("t", samples.t.alias("tv")), probes, on="t", values=["tv"], suffix="m"
        )
        .withColumnRenamed("tvm", "tm")
        .collect()
    }
    for i, tp in enumerate(t_p):
        idx = int(np.argmin(np.abs(tp - t_s)))
        assert got[i] == pytest.approx(t_s[idx], rel=1e-12), i


def test_asof_backward_and_tolerance(spark):
    samples = spark.createDataFrame([(0.0, 1.0), (10.0, 3.0)], "t double, v double")
    probes = spark.createDataFrame([(-1.0,), (4.0,), (9.0,), (100.0,)], "t double")
    back = {r["t"]: r["v"] for r in asof_join(samples, probes, "t", ["v"], direction="backward").collect()}
    assert back[-1.0] is None and back[4.0] == 1.0 and back[9.0] == 1.0 and back[100.0] == 3.0
    tol = {r["t"]: r["v"] for r in asof_join(samples, probes, "t", ["v"], tolerance=5.0).collect()}
    assert tol[-1.0] == 1.0 and tol[4.0] == 1.0 and tol[9.0] == 3.0 and tol[100.0] is None


def test_asof_nearest_takes_nearest_rows_value_even_if_null(spark):
    """Reference argmin (:1503-1507) picks the nearest PING's value even
    when that value is NaN — not the nearest non-null value."""
    samples = spark.createDataFrame(
        [(0.0, 1.0), (10.0, None), (20.0, 3.0)], "t double, v double"
    )
    probes = spark.createDataFrame([(9.0,), (11.0,), (19.0,)], "t double")
    got = {r["t"]: r["v"] for r in asof_join(samples, probes, "t", ["v"]).collect()}
    assert got[9.0] is None  # nearest sample t=10 has NULL value
    assert got[11.0] is None
    assert got[19.0] == 3.0


def test_interval_join_matches_naive(spark):
    """Bucketed 3-probe interval join == naive key-join + range filter,
    including exact-tolerance boundaries and cross-bucket pairs."""
    import numpy as np

    from seaexplorertools_spark.operators.joins import interval_join

    rng = np.random.default_rng(5)
    rows = [
        (int(i), int(rng.integers(0, 6)), float(rng.integers(0, 2000)))
        for i in range(300)
    ]
    # force exact-boundary and bucket-edge cases
    rows += [(1000, 9, 100.0), (1001, 9, 200.0), (1002, 9, 300.5), (1003, 9, 99.5)]
    df = spark.createDataFrame(rows, "id long, k long, t double")
    left = df.select(F.col("id").alias("lid"), "k", "t")
    right = df.select(F.col("id").alias("rid"), "k", "t")
    tol = 100.0

    got = {
        (r["lid"], r["rid"])
        for r in interval_join(left, right, on=["k"], time_col="t", tol=tol).collect()
    }
    naive = {
        (r["lid"], r["rid"])
        for r in left.join(right.withColumnRenamed("t", "t2"), "k")
        .filter(F.abs(F.col("t") - F.col("t2")) <= tol)
        .collect()
    }
    assert got == naive
    assert (1000, 1001) in got  # exactly tol apart
    assert (1001, 1002) not in got  # 100.5 apart


def test_asof_backward_string_values_native(spark):
    """cast_values=False carries non-numeric value columns (here a STRING
    attribute) through the as-of record transport — the point-in-time
    SCD2 join path (contract q_pit_join). Semantics must equal the
    interval-containment formulation."""
    from seaexplorertools_spark.operators.joins import asof_join

    dim = spark.createDataFrame(
        [(1, 0.0, "bronze"), (1, 10.0, "silver"), (1, 20.0, "gold"), (2, 5.0, "x")],
        "k long, t double, attr string",
    )
    facts = spark.createDataFrame(
        [(100, 1, 0.0), (101, 1, 9.9), (102, 1, 10.0), (103, 1, 25.0), (104, 2, 7.0)],
        "fid long, k long, t double",
    )
    out = asof_join(
        dim, facts, on="t", values=["attr"], partition_by=["k"],
        direction="backward", cast_values=False,
    )
    got = {r["fid"]: r["attr"] for r in out.collect()}
    assert got == {100: "bronze", 101: "bronze", 102: "silver", 103: "gold", 104: "x"}
    # dtype survives: attr is still a string column, not a double
    assert dict(out.dtypes)["attr"] == "string"


def test_positional_join_alignment_and_collision(spark):
    """positional_join grafts the i-th right row (under right_order)
    onto the i-th left row (under left_order) — verified against a
    pandas-style zip of the two sorted frames — across partition counts
    (global_rank is layout-independent); shared column names raise."""
    import pytest as _pytest

    from seaexplorertools_spark.operators.joins import positional_join

    left_rows = [(k, f"L{k}") for k in (5, 1, 9, 3, 7, 2, 8)]
    right_rows = [(40, "a"), (10, "b"), (30, "c"), (20, "d"),
                  (70, "e"), (60, "f"), (50, "g")]
    left = spark.createDataFrame(left_rows, "k long, lval string")
    right = spark.createDataFrame(right_rows, "w long, rval string")

    expect = list(zip(
        sorted(left_rows), sorted(right_rows)
    ))  # i-th by k with i-th by w
    for parts in (1, 4, 32):
        out = positional_join(
            left.repartition(parts), right.repartition(parts), ["k"], ["w"]
        ).orderBy("pos").collect()
        got = [((r["k"], r["lval"]), (r["w"], r["rval"])) for r in out]
        assert got == expect, parts
        assert [r["pos"] for r in out] == list(range(1, 8))

    with _pytest.raises(ValueError, match="collision"):
        positional_join(left, left, ["k"], ["k"])
