"""k-anonymity ladder semantics on a hand-built table with known class
sizes, plus the risk profile."""

from pyspark.sql import functions as F

from seaexplorertools_spark.operators.privacy import (
    k_anonymity_levels,
    qi_risk_profile,
)


def _fixture(spark):
    rows = []
    rid = 0
    # (region, seg) classes: (A,x)=5, (A,y)=2, (B,x)=1 -> region A=7, B=1
    for seg, n in (("x", 5), ("y", 2)):
        for _ in range(n):
            rows.append((rid, "A", seg))
            rid += 1
    rows.append((rid, "B", "x"))
    return spark.createDataFrame(rows, ["id", "region", "seg"])


def test_risk_profile_sizes_and_uniques(spark):
    prof = {
        (r["region"], r["seg"]): (r["class_size"], r["unique_row"])
        for r in qi_risk_profile(_fixture(spark), ["region", "seg"]).collect()
    }
    assert prof == {("A", "x"): (5, 0), ("A", "y"): (2, 0), ("B", "x"): (1, 1)}


def test_ladder_assigns_first_safe_level(spark):
    df = _fixture(spark)
    out = {
        r["id"]: r["anon_level"]
        for r in k_anonymity_levels(df, [["region", "seg"], ["region"]], k=4).collect()
    }
    # (A,x) size 5 >= 4 -> level 0; (A,y) fails but region A=7 -> level 1;
    # (B,x) fails both ladder levels -> 2 (only safe fully generalized)
    assert [out[i] for i in range(8)] == [0] * 5 + [1, 1, 2]
    # k larger than any region class: everything needs full generalization
    out8 = k_anonymity_levels(df, [["region", "seg"], ["region"]], k=8)
    assert {r["anon_level"] for r in out8.collect()} == {2}
