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


def test_session_new_operators_empty(spark):
    """Round-4 session operators on empty / degenerate inputs: no errors,
    well-defined empty (or pass-through) results."""
    from seaexplorertools_spark.operators.dedup import (
        cut_spans,
        duplicate_substring_spans,
    )
    from seaexplorertools_spark.operators.sampling import top_k_per_group
    from seaexplorertools_spark.operators.similarity import hard_negatives

    docs = _empty(spark, "doc_id bigint, text string")
    assert duplicate_substring_spans(docs, k=8).count() == 0

    # all docs shorter than k: no grams, no spans, cut passes through
    short = spark.createDataFrame([(1, "abc"), (2, "xyz")], "doc_id bigint, text string")
    spans = duplicate_substring_spans(short, k=8)
    assert spans.count() == 0
    out = {r["doc_id"]: (r["cleaned"], r["n_removed"]) for r in cut_spans(short, spans).collect()}
    assert out == {1: ("abc", 0), 2: ("xyz", 0)}

    grp = _empty(spark, "rid bigint, g string, s long")
    assert (
        top_k_per_group(grp, ["g"], [F.col("s").desc(), F.col("rid")], k=3).count()
        == 0
    )

    emb = _empty(spark, "vec_id bigint, embedding array<double>, label int")
    qs = emb.select(F.col("vec_id").alias("query_id"), "embedding", "label")
    assert hard_negatives(emb, qs, k=3).count() == 0


def test_grouped_udaf_empty(spark):
    from seaexplorertools_spark.functions.grouped import group_trimmed_means

    df = _empty(spark, "g string, v double")
    assert group_trimmed_means(df, ["g"], "v").count() == 0
