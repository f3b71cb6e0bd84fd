"""Approximate aggregates — the 100 TB scale path for distinct counts and
quantiles (exact distinct = full shuffle of every key; HLL/KLL sketches are
map-side mergeable, O(1) state per partition). Not oracle-checkable (the
sketch estimates differ per engine), so accuracy is pinned here against the
exact answers at test scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from seaexplorertools_spark.contract import events, table


def test_approx_count_distinct_within_5pct(spark, sf_dir):
    ev = events(spark, sf_dir)
    exact = ev.select(F.count_distinct("user_id")).collect()[0][0]
    approx = ev.select(F.approx_count_distinct("user_id", rsd=0.02)).collect()[0][0]
    assert abs(approx - exact) <= 0.05 * exact, (approx, exact)


def test_approx_percentile_brackets_exact(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    exact_med = d.select(F.percentile("n_chars", F.lit(0.5))).collect()[0][0]
    approx_med = d.select(
        F.percentile_approx("n_chars", F.lit(0.5), F.lit(10000))
    ).collect()[0][0]
    lo, hi = d.select(F.min("n_chars"), F.max("n_chars")).collect()[0]
    # high-accuracy sketch on integer data: within 2% of the exact median
    assert abs(approx_med - exact_med) <= max(2, 0.02 * (hi - lo)), (
        approx_med,
        exact_med,
    )
