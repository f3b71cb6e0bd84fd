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


def test_merge_upsert_order_col_compacts_duplicate_change_keys(spark):
    """With ``order_col`` a change batch holding several rows per key
    compacts to the LAST change (max order) before the join — one
    post-merge row per key, matching the SCD-1 contract (round-9
    ADVICE: without it, duplicate keys fan out)."""
    from seaexplorertools_spark.operators.merge import merge_upsert

    base = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, val string"
    )
    changes = spark.createDataFrame(
        [
            (1, "first", False, 10),
            (1, "last", False, 20),      # wins on k=1
            (2, None, True, 5),
            (2, "resurrected", False, 6),  # wins on k=2 (later seq)
            (3, "ins-old", False, 1),
            (3, "ins-new", False, 2),    # wins on k=3
        ],
        "k long, val string, is_delete boolean, seq long",
    )
    out = merge_upsert(base, changes, key="k", payload=["val"], order_col="seq")
    rows = {r["k"]: r for r in out.collect()}
    assert len(rows) == 3  # exactly one row per key
    assert rows[1]["val"] == "last" and rows[1]["action"] == "update"
    assert rows[2]["val"] == "resurrected" and rows[2]["action"] == "update"
    assert rows[3]["val"] == "ins-new" and rows[3]["action"] == "insert"


class TestSnapshotDiff:
    def test_classification_and_null_safety(self, spark):
        from seaexplorertools_spark.operators.merge import snapshot_diff

        old = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, None, 30), (4, "d", 40)],
            "k long, txt string, v long",
        )
        new = spark.createDataFrame(
            [(1, "a", 10), (2, "B", 20), (3, "", 30), (5, "e", 50)],
            "k long, txt string, v long",
        )
        got = {
            r["k"]: r["status"]
            for r in snapshot_diff(old, new, key_cols="k").collect()
        }
        # NULL -> '' must read as changed, not unchanged
        assert got == {
            1: "unchanged", 2: "changed", 3: "changed",
            4: "removed", 5: "added",
        }

    def test_length_prefix_prevents_concat_collision(self, spark):
        from seaexplorertools_spark.operators.merge import snapshot_diff

        # ('ab','c') vs ('a','bc') concatenate identically without the
        # length prefixes — must be 'changed'
        old = spark.createDataFrame([(1, "ab", "c")], "k long, x string, y string")
        new = spark.createDataFrame([(1, "a", "bc")], "k long, x string, y string")
        [row] = snapshot_diff(old, new, key_cols="k").collect()
        assert row["status"] == "changed"

    def test_compare_cols_subset_and_validation(self, spark):
        import pytest

        from seaexplorertools_spark.operators.merge import snapshot_diff

        old = spark.createDataFrame([(1, "a", 1)], "k long, x string, v long")
        new = spark.createDataFrame([(1, "a", 2)], "k long, x string, v long")
        [row] = snapshot_diff(old, new, key_cols="k", compare_cols=["x"]).collect()
        assert row["status"] == "unchanged"  # v ignored
        with pytest.raises(ValueError, match="no columns"):
            snapshot_diff(
                old.select("k"), new.select("k"), key_cols="k"
            )
