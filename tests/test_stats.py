"""Distribution-audit operators vs hand-computed values."""

import math

from seaexplorertools_spark.operators.stats import contingency_chi2, kl_from_global


def test_chi2_matches_hand_computation(spark):
    # 2x2 table: a:(x=30,y=10), b:(x=10,y=30)
    rows = (
        [("a", "x")] * 30 + [("a", "y")] * 10 + [("b", "x")] * 10 + [("b", "y")] * 30
    )
    df = spark.createDataFrame(rows, ["g", "c"])
    out = {
        (r["g"], r["c"]): (r["obs"], r["expected"], r["contrib"])
        for r in contingency_chi2(df, "g", "c").collect()
    }
    # margins 40/40, 40/40, N=80 -> every expected = 20, contrib = 100/20 = 5
    for cell, (obs, exp, contrib) in out.items():
        assert exp == 20.0 and contrib == 5.0
    assert out[("a", "x")][0] == 30 and out[("b", "x")][0] == 10
    assert sum(v[2] for v in out.values()) == 20.0  # chi2 statistic


def test_kl_zero_for_matching_mix_and_positive_for_drift(spark):
    # group g1 mirrors the global mix exactly only if all groups do;
    # here g1=(x:20,y:20), g2=(x:20,y:20) -> global uniform -> KL=0 both
    rows = [("g1", "x")] * 20 + [("g1", "y")] * 20 + [("g2", "x")] * 20 + [("g2", "y")] * 20
    df = spark.createDataFrame(rows, ["g", "c"])
    out = {r["g"]: r["kl"] for r in kl_from_global(df, "g", "c").collect()}
    assert all(abs(v) < 1e-12 for v in out.values())

    rows2 = [("g1", "x")] * 30 + [("g1", "y")] * 10 + [("g2", "x")] * 10 + [("g2", "y")] * 30
    out2 = {
        r["g"]: r["kl"]
        for r in kl_from_global(spark.createDataFrame(rows2, ["g", "c"]), "g", "c").collect()
    }
    # hand: p=(.75,.25) vs q=(.5,.5) -> KL = .75 ln1.5 + .25 ln .5
    want = 0.75 * math.log(1.5) + 0.25 * math.log(0.5)
    assert abs(out2["g1"] - want) < 1e-12 and abs(out2["g2"] - want) < 1e-12
