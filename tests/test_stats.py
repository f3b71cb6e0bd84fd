"""Distribution-audit operators vs hand-computed values."""

import math

from seaexplorertools_spark.operators.stats import (
    contingency_chi2,
    cusum_max_excursion,
    gini_by_rank,
    kl_from_global,
    lag_autocorr,
    mutual_info,
    welch_one_vs_rest,
)


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


def test_welch_matches_scipy_formula(spark):
    # two groups; compare the one-vs-rest t for "a" against a numpy replay
    import numpy as np

    a = [1.0, 2.0, 3.0, 4.0, 10.0]
    b = [2.0, 2.5, 3.0, 3.5, 4.0, 4.5, 30.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r["g"]: r for r in welch_one_vs_rest(df, "g", "v").collect()}

    def welch(x, y):
        x, y = np.asarray(x), np.asarray(y)
        v1, v2 = x.var(ddof=1), y.var(ddof=1)
        se1, se2 = v1 / len(x), v2 / len(y)
        t = (x.mean() - y.mean()) / math.sqrt(se1 + se2)
        df_ = (se1 + se2) ** 2 / (se1**2 / (len(x) - 1) + se2**2 / (len(y) - 1))
        return t, df_

    t, dof = welch(a, b)
    assert abs(out["a"]["t_stat"] - t) < 1e-9
    assert abs(out["a"]["welch_df"] - dof) < 1e-9
    assert out["a"]["n_group"] == 5
    # symmetry: b-vs-rest is a-vs-rest negated (two groups only)
    assert abs(out["b"]["t_stat"] + t) < 1e-9


def test_welch_small_group_is_null(spark):
    df = spark.createDataFrame([("a", 1.0), ("b", 2.0), ("b", 3.0), ("b", 4.0)], ["g", "v"])
    out = {r["g"]: r for r in welch_one_vs_rest(df, "g", "v").collect()}
    assert out["a"]["t_stat"] is None and out["a"]["welch_df"] is None


def test_lag_autocorr_matches_numpy(spark):
    import numpy as np

    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0]
    rows = [("u", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["g", "t", "v"])
    out = lag_autocorr(df, "g", ["t"], "v", lag=1).collect()[0]
    x, y = np.array(vals[:-1]), np.array(vals[1:])
    want = np.corrcoef(x, y)[0, 1]
    assert out["n_pairs"] == 9
    assert abs(out["acf"] - want) < 1e-12


def test_lag_autocorr_constant_series_null(spark):
    df = spark.createDataFrame([("u", i, 7.0) for i in range(5)], ["g", "t", "v"])
    assert lag_autocorr(df, "g", ["t"], "v").collect()[0]["acf"] is None


def test_mutual_info_independent_and_identical(spark):
    # independent 2x2 uniform -> MI = 0
    rows = [("x", "p")] * 10 + [("x", "q")] * 10 + [("y", "p")] * 10 + [("y", "q")] * 10
    df = spark.createDataFrame(rows, ["a", "b"])
    r = mutual_info(df, "a", "b").collect()[0]
    assert abs(r["mi"]) < 1e-12 and abs(r["nmi"]) < 1e-12
    assert abs(r["h_a"] - math.log(2)) < 1e-12

    # perfectly dependent -> MI = H = ln 2, NMI = 1
    rows2 = [("x", "p")] * 10 + [("y", "q")] * 10
    r2 = mutual_info(spark.createDataFrame(rows2, ["a", "b"]), "a", "b").collect()[0]
    assert abs(r2["mi"] - math.log(2)) < 1e-12
    assert abs(r2["nmi"] - 1.0) < 1e-12


def test_gini_extremes_and_known_value(spark):
    # perfectly equal -> 0
    eq = spark.createDataFrame([("g", i, 10) for i in range(4)], ["g", "id", "x"])
    assert gini_by_rank(eq, "g", "x", "id").collect()[0]["gini"] == 0.0
    # one holder of everything, n=4: rank formula gives (n-1)/n = 0.75
    one = spark.createDataFrame(
        [("g", 0, 0), ("g", 1, 0), ("g", 2, 0), ("g", 3, 100)], ["g", "id", "x"]
    )
    assert abs(gini_by_rank(one, "g", "x", "id").collect()[0]["gini"] - 0.75) < 1e-12
    # hand value: x = [1,2,3,4]: G = (2*(1+4+9+16) - 5*10)/(4*10) = 10/40
    h = spark.createDataFrame([("g", i, i + 1) for i in range(4)], ["g", "id", "x"])
    assert abs(gini_by_rank(h, "g", "x", "id").collect()[0]["gini"] - 0.25) < 1e-12


def test_cusum_matches_sequential_recursion(spark):
    vals = [1.0, 5.0, 5.0, 5.0, -3.0, -9.0, 2.0, 8.0, 8.0, -1.0]
    target = 1.0
    rows = [("u", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["g", "t", "v"])
    out = cusum_max_excursion(df, "g", ["t"], "v", target=target).collect()[0]
    # sequential reference: S_t = max(0, S_{t-1} + (x - target))
    s, best, best_t = 0.0, 0.0, 0
    for i, v in enumerate(vals):
        s = max(0.0, s + (v - target))
        if s > best:
            best, best_t = s, i
    assert abs(out["max_cusum"] - best) < 1e-9
    assert out["peak_at"] == best_t


def test_association_rules_hand_values(spark):
    from seaexplorertools_spark.operators.itemsets import association_rules

    # baskets: {A,B}, {A,B}, {A,C}, {B} -> pair (A,B) support 2 of 4 baskets
    rows = [
        (1, "A"), (1, "B"),
        (2, "A"), (2, "B"),
        (3, "A"), (3, "C"),
        (4, "B"),
        (2, "A"),  # duplicate line in a basket must not inflate counts
    ]
    df = spark.createDataFrame(rows, ["basket", "item"])
    out = {(r["item_a"], r["item_b"]): r for r in association_rules(df, "basket", "item").collect()}
    assert set(out) == {("A", "B")}  # (A,C) has support 1, pruned
    r = out[("A", "B")]
    assert r["pair_n"] == 2 and r["n_a"] == 3 and r["n_b"] == 3
    assert abs(r["conf_a_b"] - 2 / 3) < 1e-15
    assert abs(r["lift"] - (2 * 4) / (3 * 3)) < 1e-15


def test_winsorize_clips_into_band(spark):
    from seaexplorertools_spark.operators.stats import winsorize

    vals = list(range(1, 101))  # 1..100 -> p05 ~ 5.95, p95 ~ 95.05
    df = spark.createDataFrame([("g", i, v) for i, v in enumerate(vals)], ["g", "id", "x"])
    out = winsorize(df, "g", "x", 0.05, 0.95).collect()
    lo = 1 + 0.05 * 99  # numpy-style linear interpolation on sorted values
    hi = 1 + 0.95 * 99
    for r in out:
        assert abs(r["p_lo"] - lo) < 1e-12 and abs(r["p_hi"] - hi) < 1e-12
        assert r["clipped"] == min(max(float(r["x"]), lo), hi)


def test_markov_transitions_hand_chain(spark):
    from seaexplorertools_spark.operators.stats import markov_transitions

    # u1: A B A B ; u2: A B B  -> from A: {B:3}; from B: {A:1, B:1}
    rows = [("u1", 0, "A"), ("u1", 1, "B"), ("u1", 2, "A"), ("u1", 3, "B"),
            ("u2", 0, "A"), ("u2", 1, "B"), ("u2", 2, "B")]
    df = spark.createDataFrame(rows, ["u", "t", "s"])
    out = {(r["from_state"], r["to_state"]): r for r in
           markov_transitions(df, "u", ["t"], "s").collect()}
    assert out[("A", "B")]["n"] == 3 and out[("A", "B")]["p"] == 1.0
    assert out[("B", "A")]["n"] == 1 and abs(out[("B", "A")]["p"] - 0.5) < 1e-15
    assert out[("B", "B")]["n"] == 1 and abs(out[("B", "B")]["p"] - 0.5) < 1e-15
    assert ("B", "A") in out and len(out) == 3  # no cross-user transition


def test_benford_detects_fabricated_uniform(spark):
    import math as m

    from seaexplorertools_spark.operators.quality import benford_audit

    # Benford-ish data: powers spread multiplicatively
    nat = [1.0 * (1.35 ** i) for i in range(80)]
    df = spark.createDataFrame([(v,) for v in nat], ["x"])
    chi_nat = sum(r["chi2_contrib"] for r in benford_audit(df, "x").collect())
    # fabricated: uniform 100..999 -> every first digit equally likely
    fab = [float(100 + 900 * i / 200) for i in range(200)]
    chi_fab = sum(
        r["chi2_contrib"]
        for r in benford_audit(spark.createDataFrame([(v,) for v in fab], ["x"]), "x").collect()
    )
    assert chi_fab > 5 * max(chi_nat, 1e-9)  # uniform flagged, natural not
    # expected shares are exactly log10(1+1/d)
    out = {r["digit"]: r["benford_p"] for r in benford_audit(df, "x").collect()}
    for dgt, p in out.items():
        assert abs(p - m.log10(1 + 1 / dgt)) < 1e-15


def test_benford_sub_one_rows_excluded(spark):
    from seaexplorertools_spark.operators.quality import benford_audit

    df = spark.createDataFrame([(0.5,), (0.9,), (2.0,), (25.0,)], ["x"])
    out = {r["digit"]: r["obs"] for r in benford_audit(df, "x").collect()}
    assert out == {2: 2}  # 0.5/0.9 excluded; 2.0 and 25.0 both lead with 2


def test_quantile_sketch_merge_law_and_accuracy(spark):
    import numpy as np

    from seaexplorertools_spark.operators.sketches import quantile_sketch

    rng = np.random.RandomState(7)
    vals = rng.lognormal(5, 1, 4000)
    rows = [("g", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["g", "id", "x"])

    direct = quantile_sketch(df, "id", "x", ["g"], k=256, qs=(0.5, 0.9)).collect()[0]
    assert direct["sample_n"] == 256

    # merge law: bottom-k of the union == bottom-k over concatenated
    # per-shard bottom-k survivors (KMV property)
    from pyspark.sql import functions as F
    from seaexplorertools_spark.operators.sketches import uniform_hash48
    from pyspark.sql.window import Window as W

    shard = df.withColumn("shard", F.col("id") % 4)
    h = uniform_hash48(F.col("id"))
    w = W.partitionBy("g", "shard").orderBy("h", "id")
    survivors = (
        shard.select("g", "id", "x", h.alias("h"), "shard")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 256)
        .select("g", "id", "x")
    )
    merged = quantile_sketch(survivors, "id", "x", ["g"], k=256, qs=(0.5, 0.9)).collect()[0]
    assert merged["q_50"] == direct["q_50"] and merged["q_90"] == direct["q_90"]

    # accuracy: within ~3/sqrt(k) quantile distance of the exact value
    exact_rank_lo = np.quantile(vals, 0.5 - 3 / 16)
    exact_rank_hi = np.quantile(vals, 0.5 + 3 / 16)
    assert exact_rank_lo <= direct["q_50"] <= exact_rank_hi


def test_target_encode_loo_hand_values(spark):
    from seaexplorertools_spark.operators.stats import target_encode_loo

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0), ("b", 20.0), ("c", 7.0)]
    df = spark.createDataFrame(rows, ["g", "y"])
    # unsmoothed: each row's encoding = mean of its group WITHOUT itself
    out = {(r["g"], r["y"]): r["te_loo"] for r in target_encode_loo(df, "g", "y").collect()}
    assert abs(out[("a", 1.0)] - 2.5) < 1e-15  # (2+3)/2
    assert abs(out[("b", 10.0)] - 20.0) < 1e-15
    assert out[("c", 7.0)] is None  # singleton, no prior

    # smoothed m=2: (sum_g - y + 2*mu)/(n_g - 1 + 2); mu = 43/6
    mu = 43.0 / 6.0
    sm = {(r["g"], r["y"]): r["te_loo"]
          for r in target_encode_loo(df, "g", "y", smoothing=2.0).collect()}
    assert abs(sm[("a", 1.0)] - (5.0 + 2 * mu) / 4.0) < 1e-12
    assert abs(sm[("c", 7.0)] - (0.0 + 2 * mu) / 2.0) < 1e-12  # prior-dominated


def test_target_encode_no_leak(spark):
    from seaexplorertools_spark.operators.stats import target_encode_loo

    # one extreme outlier: its own encoding must NOT include itself
    rows = [("a", 0.0)] * 5 + [("a", 1000.0)]
    df = spark.createDataFrame(rows, ["g", "y"])
    out = target_encode_loo(df, "g", "y").collect()
    enc_outlier = [r["te_loo"] for r in out if r["y"] == 1000.0][0]
    enc_normal = [r["te_loo"] for r in out if r["y"] == 0.0][0]
    assert enc_outlier == 0.0           # sees only the five zeros
    assert abs(enc_normal - 200.0) < 1e-12  # (1000+4*0)/5 — sees the outlier


def test_approx_percentile_within_declared_accuracy(spark):
    """winsorize() declares approx_percentile(…, accuracy) as the 100 TB
    swap-in; pin the bound: with accuracy A, rank error ≤ n/A."""
    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.RandomState(11)
    vals = np.sort(rng.lognormal(3, 1, 5000))
    df = spark.createDataFrame([(float(v),) for v in vals], ["x"])
    acc = 1000  # rank error <= 5000/1000 = 5 ranks
    row = df.agg(
        F.expr(f"approx_percentile(x, array(0.05, 0.5, 0.95), {acc})").alias("ap"),
        F.expr("percentile(x, array(0.05, 0.5, 0.95))").alias("ex"),
    ).collect()[0]
    for q, (a, e) in zip((0.05, 0.5, 0.95), zip(row["ap"], row["ex"])):
        # convert the approx value back to a rank and compare
        rank_a = np.searchsorted(vals, a)
        rank_e = q * (len(vals) - 1)
        assert abs(rank_a - rank_e) <= 5 + 1, (q, rank_a, rank_e)


def test_weighted_quantiles_hand_values(spark):
    from pyspark.sql import functions as F

    from seaexplorertools_spark.operators.stats import weighted_quantiles

    # values 1..4 with weights 1,1,1,7 (W=10): weighted median sits in the
    # heavy value 4 (cum: 1,2,3,10 -> first 2*cum>=10 is x=4); p25 -> x=3
    rows = [("g", 1.0, 1, 0), ("g", 2.0, 1, 1), ("g", 3.0, 1, 2), ("g", 4.0, 7, 3)]
    df = spark.createDataFrame(rows, ["g", "x", "w", "id"])
    r = weighted_quantiles(df, "g", "x", F.col("w"), "id").collect()[0]
    assert r["w_total"] == 10
    assert r["p25"] == 3.0 and r["p50"] == 4.0 and r["p90"] == 4.0
    # unweighted sanity: all weights 1 -> lower quantiles of 1..4
    u = spark.createDataFrame([("g", float(v), 1, v) for v in range(1, 5)],
                              ["g", "x", "w", "id"])
    r2 = weighted_quantiles(u, "g", "x", F.col("w"), "id").collect()[0]
    assert (r2["p25"], r2["p50"], r2["p90"]) == (1.0, 2.0, 4.0)


def test_best_split_finds_planted_threshold(spark):
    from pyspark.sql import functions as F

    from seaexplorertools_spark.operators.stats import best_split

    # label is TRUE exactly when x <= 42: the planted split is perfect
    rows = [(float(x), x <= 42) for x in range(1, 101)]
    df = spark.createDataFrame(rows, ["x", "y"])
    r = best_split(df, "x", F.col("y")).collect()[0]
    assert r["split_at"] == 42.0
    assert r["n_left"] == 42
    # perfect split: IG equals the parent entropy (both sides pure)
    assert abs(r["ig"] - r["parent_entropy"]) < 2e-6

    # pure label -> zero entropy, zero gain everywhere, earliest t wins
    pure = spark.createDataFrame([(float(x), True) for x in range(10)], ["x", "y"])
    r2 = best_split(pure, "x", F.col("y")).collect()[0]
    assert r2["ig"] == 0.0 and r2["parent_entropy"] == 0.0
    assert r2["split_at"] == 0.0


def test_auc_mann_whitney_matches_numpy_midrank(spark):
    """Exact tie-corrected AUC vs a from-scratch numpy midrank
    computation, on data with heavy ties; degenerate one-class input
    returns NULL auc."""
    import numpy as np
    from pyspark.sql import functions as F

    from seaexplorertools_spark.operators.stats import auc_mann_whitney

    rng = np.random.default_rng(11)
    # quantized scores -> many ties; positives shifted up
    neg = np.round(rng.normal(0.0, 1.0, 400), 1)
    pos = np.round(rng.normal(0.7, 1.0, 300), 1)
    scores = np.concatenate([neg, pos])
    labels = np.concatenate([np.zeros(400, bool), np.ones(300, bool)])

    # ground truth: average ranks over ties (scipy-free midranks)
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty(len(scores))
    sorted_scores = scores[order]
    i = 0
    while i < len(scores):
        j = i
        while j < len(scores) and sorted_scores[j] == sorted_scores[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0  # midrank of positions i+1..j
        i = j
    r_pos = ranks[labels].sum()
    n_pos, n_neg = labels.sum(), (~labels).sum()
    want = (r_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)

    df = spark.createDataFrame(
        [(float(s), bool(l)) for s, l in zip(scores, labels)], "score double, pos boolean"
    )
    got = auc_mann_whitney(df, "score", "pos").collect()[0]
    assert got["n_pos"] == n_pos and got["n_neg"] == n_neg
    assert abs(got["auc"] - want) < 1e-12
    assert 0.6 < got["auc"] < 0.8  # the +0.7 shift must be visible

    one_class = df.filter(F.col("pos"))
    r = auc_mann_whitney(one_class, "score", "pos").collect()[0]
    assert r["auc"] is None and r["n_neg"] == 0


def test_null_categories_are_kept_by_margin_joins(spark):
    # NULL is a real category: groupBy keeps it as a group and the former
    # window forms (PARTITION BY col) kept it as a partition, so the
    # windowless margin joins must be null-safe. Round-4 regression: the
    # plain equi-join form dropped NULL-keyed cells while totals still
    # counted them, so probabilities stopped summing to 1.
    rows = [("a", "x"), ("a", "y"), ("b", "x"), (None, "x"), ("a", None)]
    df = spark.createDataFrame(rows, ["g", "c"])

    chi = contingency_chi2(df, "g", "c").collect()
    assert len(chi) == 5  # all 5 cells survive, incl. the NULL-keyed ones
    assert math.isclose(sum(r["obs"] / 5.0 for r in chi), 1.0)
    # hand margins: row a=3, b=1, NULL=1; col x=3, y=1, NULL=1; n=5
    exp = {
        ("a", "x"): 9 / 5,
        ("a", "y"): 3 / 5,
        ("b", "x"): 3 / 5,
        (None, "x"): 3 / 5,
        ("a", None): 3 / 5,
    }
    for r in chi:
        assert math.isclose(r["expected"], exp[(r["g"], r["c"])], rel_tol=1e-12)

    mi = mutual_info(df, "g", "c").collect()[0]
    # identical-column MI on the same 5 rows must equal the entropy — a
    # NULL-dropping margin join breaks this identity
    same = mutual_info(
        spark.createDataFrame([("a",), ("a",), ("b",), (None,), ("a",)], ["g"])
        .selectExpr("g", "g AS c"),
        "g",
        "c",
    ).collect()[0]
    assert math.isclose(same["mi"], same["h_a"], rel_tol=1e-12)
    assert mi["mi"] is not None

    kl = {r["g"]: r["kl"] for r in kl_from_global(df, "g", "c").collect()}
    assert set(kl) == {"a", "b", None}  # NULL group kept, all finite
    assert all(v is not None and v >= -1e-12 for v in kl.values())


def test_auc_rank_sum_survives_decimal_promotion(spark):
    # the DECIMAL(38,0) promotion must not change small-N exactness
    from seaexplorertools_spark.operators.stats import auc_mann_whitney

    rows = [(0.1, 0), (0.4, 0), (0.35, 1), (0.8, 1)]
    df = spark.createDataFrame(rows, ["score", "label"])
    out = auc_mann_whitney(df, "score", "label").collect()[0]
    # sklearn roc_auc_score on this classic fixture = 0.75
    assert out["n_pos"] == 2 and out["n_neg"] == 2
    assert math.isclose(out["auc"], 0.75, rel_tol=1e-12)
