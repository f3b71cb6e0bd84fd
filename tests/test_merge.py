"""MERGE/CDC apply (operators/merge.py): all four actions, payload
source selection, tombstone semantics, and the single-join plan."""

from __future__ import annotations

from seaexplorertools_spark.operators.merge import merge_upsert


def _frames(spark):
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "k long, val string, score long",
    )
    changes = spark.createDataFrame(
        [
            (2, "B", 25, False),   # update
            (3, None, None, True), # delete
            (4, "d", 40, False),   # insert
        ],
        "k long, val string, score long, is_delete boolean",
    )
    return base, changes


def test_actions(spark):
    base, changes = _frames(spark)
    out = {
        r["k"]: r
        for r in merge_upsert(base, changes, "k", ["val", "score"]).collect()
    }
    assert out[1]["action"] == "keep" and out[1]["val"] == "a"
    assert out[2]["action"] == "update" and (out[2]["val"], out[2]["score"]) == ("B", 25)
    assert out[3]["action"] == "delete" and out[3]["val"] is None
    assert out[4]["action"] == "insert" and out[4]["val"] == "d"
    assert len(out) == 4


def test_snapshot_filter(spark):
    base, changes = _frames(spark)
    snap = (
        merge_upsert(base, changes, "k", ["val", "score"])
        .filter("action != 'delete'")
    )
    assert sorted(r["k"] for r in snap.collect()) == [1, 2, 4]


def test_delete_of_missing_key_is_still_audited(spark):
    base = spark.createDataFrame([(1, "a")], "k long, val string")
    changes = spark.createDataFrame(
        [(9, None, True)], "k long, val string, is_delete boolean"
    )
    out = {r["k"]: r for r in merge_upsert(base, changes, "k", ["val"]).collect()}
    assert out[9]["action"] == "delete"


def test_single_join_plan(spark):
    base, changes = _frames(spark)
    plan = (
        merge_upsert(base, changes, "k", ["val", "score"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Join") == 1 and "Python" not in plan
