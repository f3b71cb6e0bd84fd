"""DSIR selection and the oracle-exact Bloom filter: hand-checkable
model math, selection-budget exactness, and Bloom's no-false-negative
guarantee vs a pure-python replica of the same hashes."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from seaexplorertools_spark.operators.selection import (
    bloom_build,
    bloom_probe,
    dsir_log_ratio_table,
    dsir_scores,
    dsir_select,
    hashed_ngram_features,
)


def _bucket(feature: str, m: int) -> int:
    return int(hashlib.md5(feature.encode()).hexdigest()[:8], 16) % m


def test_hashed_ngram_features_counts(spark):
    df = spark.createDataFrame([(1, "a b a")], ["doc_id", "text"])
    got = {
        r["bucket"]: r["c"]
        for r in hashed_ngram_features(df, n_buckets=64).collect()
    }
    # features: unigrams a, b, a + bigrams "a b", "b a"
    want: dict[int, int] = {}
    for f in ["a", "b", "a", "a b", "b a"]:
        b = _bucket(f, 64)
        want[b] = want.get(b, 0) + 1
    assert got == want
    # single-token doc: no bigrams, one unigram
    one = spark.createDataFrame([(2, "solo")], ["doc_id", "text"])
    assert [r["c"] for r in hashed_ngram_features(one, 64).collect()] == [1]


def test_dsir_log_ratio_and_scores_hand_example(spark):
    # raw pool: bucket counts via two tiny frames; n_buckets=4
    raw = spark.createDataFrame([(0, 6), (1, 2)], ["bucket", "c"])
    tgt = spark.createDataFrame([(0, 2)], ["bucket", "c"])
    lam = {
        r["bucket"]: r["lam_micro"]
        for r in dsir_log_ratio_table(raw, tgt, n_buckets=4).collect()
    }
    # nt=2, nr=8; λ0 = ln(3/6) − ln(7/12); λ1 = ln(1/6) − ln(3/12)
    want0 = math.floor((math.log(3 / 6) - math.log(7 / 12)) * 1e6 + 0.5)
    want1 = math.floor((math.log(1 / 6) - math.log(3 / 12)) * 1e6 + 0.5)
    assert lam == {0: want0, 1: want1}

    docs = spark.createDataFrame(
        [(10, 0, 3), (10, 1, 1), (11, 1, 2)], ["doc_id", "bucket", "c"]
    )
    scores = {
        r["doc_id"]: r["score_micro"]
        for r in dsir_scores(docs, dsir_log_ratio_table(raw, tgt, 4)).collect()
    }
    assert scores == {10: 3 * want0 + want1, 11: 2 * want1}


def test_dsir_select_budget_and_direction(spark):
    # 40 docs; 10 "target-like" (repeat the target vocabulary), 30 junk
    rows = [(i, "alpha beta gamma alpha beta") for i in range(10)]
    rows += [(i, f"junk{i} filler{i} noise{i}") for i in range(10, 40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dsir_select(
        df, F.col("doc_id") < 5, keep_fraction=0.25, n_buckets=256
    ).collect()
    assert len(out) == 40
    sel = {r["doc_id"] for r in out if r["selected"]}
    assert len(sel) == 10  # ceil(0.25 * 40)
    # the docs sharing the target vocabulary outscore the junk
    assert sel == set(range(10))
    scores = {r["doc_id"]: r["score_micro"] for r in out}
    assert min(scores[i] for i in range(10)) > max(
        scores[i] for i in range(10, 40)
    )


def _py_positions(value: str, m_bits: int, k: int) -> list[int]:
    return [
        int(hashlib.md5(f"{j}:{value}".encode()).hexdigest()[:12], 16) % m_bits
        for j in range(k)
    ]


def test_bloom_matches_python_replica_and_no_false_negatives(spark):
    members = [f"member-{i}" for i in range(200)]
    others = [f"other-{i}" for i in range(500)]
    m_bits, k = 4096, 3
    bl = bloom_build(
        spark.createDataFrame([(v,) for v in members], ["v"]), "v", m_bits, k
    )
    words = {r["word_idx"]: r["word"] for r in bl.collect()}
    # word table replica
    py_words: dict[int, int] = {}
    for v in members:
        for p in _py_positions(v, m_bits, k):
            py_words[p // 32] = py_words.get(p // 32, 0) | (1 << (p % 32))
    assert words == py_words

    probed = bloom_probe(
        spark.createDataFrame([(v,) for v in members + others], ["v"]),
        "v",
        bl,
        m_bits,
        k,
    )
    got = {r["v"]: r["maybe_member"] for r in probed.collect()}
    # no false negatives, ever
    assert all(got[v] for v in members)
    # false positives exist but are bounded: fpr ≈ (1-e^(-kn/m))^k ≈ 10%
    # at n=200, m=4096, k=3; assert well under 3x that
    fp = sum(1 for v in others if got[v])
    assert fp / len(others) < 0.3
    # and the verdict agrees with the python replica bit-for-bit
    for v in others[:50]:
        py_hit = all(
            py_words.get(p // 32, 0) & (1 << (p % 32)) for p in _py_positions(v, m_bits, k)
        )
        assert got[v] == py_hit


def test_bloom_empty_build_side(spark):
    bl = bloom_build(
        spark.createDataFrame([], "v string"), "v", m_bits=1024, k=3
    )
    assert bl.count() == 0
    probed = bloom_probe(
        spark.createDataFrame([("x",)], ["v"]), "v", bl, m_bits=1024, k=3
    )
    assert [r["maybe_member"] for r in probed.collect()] == [False]


def test_dsir_empty_target_and_layout_invariance(spark):
    rows = [(i, f"tok{i % 7} common word{i % 3}") for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # empty target: model falls back to uniform smoothing — still total,
    # deterministic, and budget-exact
    out = dsir_select(df, F.lit(False), keep_fraction=0.25, n_buckets=64).collect()
    assert len(out) == 40 and sum(r["selected"] for r in out) == 10

    # scores are invariant to the input's partition layout
    a = {
        r["doc_id"]: (r["score_micro"], r["selected"])
        for r in dsir_select(
            df, F.col("doc_id") < 5, 0.25, n_buckets=64
        ).collect()
    }
    b = {
        r["doc_id"]: (r["score_micro"], r["selected"])
        for r in dsir_select(
            df.repartition(13), F.col("doc_id") < 5, 0.25, n_buckets=64
        ).collect()
    }
    assert a == b
