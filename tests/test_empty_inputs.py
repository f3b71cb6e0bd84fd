"""Empty-input behavior of the round-4 distributed-prefix operators —
degenerate inputs must yield empty (or well-defined NULL) results, never
errors: a 100 TB pipeline's per-partition slices routinely include empty
frames after filters."""

from __future__ import annotations

from pyspark.sql import functions as F


def _empty(spark, schema):
    return spark.createDataFrame([], schema)


def test_global_rank_cumsum_ntile_empty(spark):
    from seaexplorertools_spark.operators.rank import (
        global_cumsum,
        global_ntile,
        global_rank,
        global_running_max,
    )

    df = _empty(spark, "i long, v long")
    assert global_rank(df, ["i"], "r").count() == 0
    assert global_cumsum(df, ["i"], "v", "cs").count() == 0
    assert global_ntile(df, ["i"], 4).count() == 0
    assert global_running_max(df, ["i"], "v", "mx").count() == 0


def test_concurrency_profile_empty(spark):
    from seaexplorertools_spark.operators.intervals import concurrency_profile

    df = _empty(spark, "s long, e long")
    assert concurrency_profile(df, "s", "e").count() == 0


def test_jaccard_prefix_join_empty_and_all_empty_docs(spark):
    from seaexplorertools_spark.operators.dedup import jaccard_prefix_join

    assert jaccard_prefix_join(_empty(spark, "doc_id long, text string"), 0.8).count() == 0
    blank = spark.createDataFrame([(1, ""), (2, "")], "doc_id long, text string")
    assert jaccard_prefix_join(blank, 0.8).count() == 0


def test_auc_empty_input_single_null_row(spark):
    from seaexplorertools_spark.operators.stats import auc_mann_whitney

    df = _empty(spark, "score double, pos boolean")
    rows = auc_mann_whitney(df, "score", "pos").collect()
    assert len(rows) == 1
    r = rows[0]
    # empty input: zero of each class, undefined AUC -> NULL, not a crash
    assert (r["n_pos"] or 0) == 0 and (r["n_neg"] or 0) == 0 and r["auc"] is None


def test_best_split_single_value(spark):
    from seaexplorertools_spark.operators.stats import best_split

    one = spark.createDataFrame([(1.0, True)], "x double, y boolean")
    # a single distinct value has no valid "feature <= t" split with a
    # non-empty right side -> empty result, not a crash
    assert best_split(one, "x", F.col("y")).count() == 0
