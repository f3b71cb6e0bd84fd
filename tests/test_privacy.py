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


def test_l_diversity_flags_homogeneous_class(spark):
    from seaexplorertools_spark.operators.privacy import l_diversity_audit
    import math

    rows = (
        [("q1", "flu")] * 4                     # homogeneous: l=1
        + [("q2", "flu")] * 2 + [("q2", "hiv")] * 2  # balanced: l=2, H=ln2
    )
    df = spark.createDataFrame(rows, ["qi", "dx"])
    out = {r["qi"]: r for r in l_diversity_audit(df, ["qi"], "dx").collect()}
    assert out["q1"]["l_distinct"] == 1
    assert out["q1"]["majority_share"] == 1.0
    assert abs(out["q1"]["sens_entropy"]) < 1e-15
    assert out["q2"]["l_distinct"] == 2
    assert out["q2"]["majority_share"] == 0.5
    assert abs(out["q2"]["sens_entropy"] - math.log(2)) < 1e-15


def test_dp_noise_scale_tracks_epsilon(spark):
    from seaexplorertools_spark.operators.privacy import dp_noisy_counts

    df = spark.createDataFrame([(f"g{i}", 1) for i in range(200)], ["g", "x"])
    tight = dp_noisy_counts(df, ["g"], epsilon=10.0, clamp_nonneg=False).collect()
    loose = dp_noisy_counts(df, ["g"], epsilon=0.1, clamp_nonneg=False).collect()
    err_t = sum(abs(r["noisy_n"] - r["true_n"]) for r in tight) / len(tight)
    err_l = sum(abs(r["noisy_n"] - r["true_n"]) for r in loose) / len(loose)
    # Laplace(1/eps): mean |noise| = 1/eps -> 100x epsilon gap => ~100x error gap
    assert 30 * err_t < err_l
    assert 0.05 < err_t < 0.3  # 1/eps = 0.1 ballpark
    # determinism: same salt reproduces identical noise
    again = dp_noisy_counts(df, ["g"], epsilon=10.0, clamp_nonneg=False).collect()
    assert {r["g"]: r["noisy_n"] for r in again} == {r["g"]: r["noisy_n"] for r in tight}
    # clamping never yields negatives
    clamped = dp_noisy_counts(df, ["g"], epsilon=0.01).collect()
    assert all(r["noisy_n"] >= 0.0 for r in clamped)
