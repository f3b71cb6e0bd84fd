"""Data-quality operators (operators/quality.py): one-pass suite counts,
and observe()-attached metrics that ride along an existing job."""

from __future__ import annotations

from pyspark.sql import functions as F

from seaexplorertools_spark.operators.quality import (
    accepted_values,
    in_range,
    not_null,
    observed_checks,
    referential_check,
    run_checks,
    unique_check,
)


def test_run_checks_counts_each_violation_kind(spark):
    df = spark.createDataFrame(
        [(1, "O", 10.0), (2, "X", -5.0), (None, "F", 20.0), (3, None, 1e9)],
        "k long, st string, price double",
    )
    out = {
        r["check"]: r["n_violations"]
        for r in run_checks(
            df,
            [
                not_null("k"),
                accepted_values("st", ["O", "F", "P"]),
                in_range("price", 0, 1_000_000),
            ],
        ).collect()
    }
    assert out == {
        "not_null:k": 1,
        "accepted_values:st": 2,  # 'X' and NULL
        "in_range:price": 2,  # -5.0 and 1e9
    }


def test_unique_and_referential(spark):
    fact = spark.createDataFrame([(1, 7), (1, 7), (2, 8), (3, None)], "id long, fk long")
    dim = spark.createDataFrame([(7,)], "pk long")
    u = unique_check(fact, ["id"]).first()
    assert (u["check"], u["n_violations"]) == ("unique:id", 1)
    r = referential_check(fact, "fk", dim, "pk").first()
    assert (r["check"], r["n_violations"]) == ("referential:fk->pk", 1)  # fk=8; NULL skipped


def test_observed_checks_ride_existing_job(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    checks = [not_null("o_custkey"), in_range("o_totalprice", 0, 1_000_000)]
    df, obs = observed_checks(o, checks)
    # the "job" is an ordinary aggregate — metrics accumulate during it
    n = df.agg(F.count("*")).first()[0]
    got = obs.get
    direct = {
        name: o.filter(pred).count() for name, pred in checks
    }
    assert n == o.count()
    assert got == direct


def test_pmi_flags_collocation(spark):
    from seaexplorertools_spark.operators.text import pmi_bigrams
    import math
    from collections import Counter

    docs = [
        "new york a cat", "new york the cat", "new york a dog",
        "the dog sees new york", "a cat sees the dog", "the cat sees a dog",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], ["doc_id", "text"])
    out = {(r["w1"], r["w2"]): (r["n"], r["pmi"]) for r in
           pmi_bigrams(df, "text", min_count=2).collect()}

    # pure-python replay of the definition
    bigrams = []
    for t in docs:
        toks = t.split()
        bigrams += list(zip(toks, toks[1:]))
    c12 = Counter(bigrams)
    cl = Counter(w1 for w1, _ in bigrams)
    cr = Counter(w2 for _, w2 in bigrams)
    n = len(bigrams)
    want = {
        (a, b): (k, math.log(k * n / (cl[a] * cr[b])))
        for (a, b), k in c12.items()
        if k >= 2
    }
    assert set(out) == set(want)
    for pair, (k, p) in want.items():
        assert out[pair][0] == k
        assert abs(out[pair][1] - p) < 1e-12


def test_readability_hand_values(spark):
    from seaexplorertools_spark.operators.text import readability_features

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"), (2, "word")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in readability_features(df).collect()}
    r1 = out[1]
    assert r1["n_words"] == 6 and r1["n_sentences"] == 2
    # vowel runs: e,a,a,e,o,a -> 6
    assert r1["n_syllables"] == 6
    want = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    assert abs(r1["flesch"] - want) < 1e-9
    # fragment: sentences floored at 1
    assert out[2]["n_sentences"] == 1 and out[2]["n_words"] == 1


def test_embedding_dq_detects_planted_defects(spark):
    """Planted wrong-dim / NaN-component / zero vectors are each counted
    once, and the NaN row's bad component does not poison avg_norm."""
    import math

    from pyspark.sql import functions as F

    from seaexplorertools_spark.contract import QUERIES

    rows = [
        (0, [3.0, 4.0] + [0.0] * 62, 0),            # norm 5, fine
        (1, [float("nan")] + [2.0] + [0.0] * 62, 0),  # NaN component, norm 2
        (2, [0.0] * 64, 0),                           # zero norm
        (3, [1.0] * 16, 0),                           # wrong dim
        (4, None, 0),                                 # NULL vector: n_vecs only
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>, label int")
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(f"{tmp}/embeddings.parquet")
        got = QUERIES["q_embedding_dq"](spark, tmp).collect()[0]
    assert got["n_vecs"] == 5
    assert got["n_wrong_dim"] == 1
    assert got["n_with_nan"] == 1
    assert got["n_zero_norm"] == 1
    assert got["avg_norm"] == round((5.0 + 2.0 + 0.0 + 4.0) / 4, 6)
    assert not math.isnan(got["avg_norm"])


def test_script_profile_counts_and_dominant(spark):
    from seaexplorertools_spark.operators.text import script_profile

    rows = [
        (1, "hello world"),                      # latin
        (2, "привет мир hi"),                    # cyrillic-dominant, 2 latin
        (3, "你好世界"),                          # cjk
        (4, "γειά σου"),                          # greek
        (5, "مرحبا بالعالم"),                     # arabic
        (6, "12345 !!!"),                         # no script chars at all
        (7, "abcd абвг"),                         # 4-4 tie → fixed order: latin
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in script_profile(df).collect()}
    assert out[1]["dominant_script"] == "latin" and out[1]["n_latin"] == 10
    assert out[2]["dominant_script"] == "cyrillic"
    assert out[2]["n_cyrillic"] == 9 and out[2]["n_latin"] == 2
    assert out[3]["dominant_script"] == "cjk" and out[3]["n_cjk"] == 4
    assert out[4]["dominant_script"] == "greek"
    assert out[5]["dominant_script"] == "arabic" and out[5]["n_arabic"] > 0
    assert out[6]["dominant_script"] == "other"
    assert out[7]["dominant_script"] == "latin"  # deterministic tiebreak
