"""Bigram-LM scoring semantics: repetitive text scores lower cross-entropy
than high-entropy text under a corpus-trained LM; the perplexity filter
keeps a strict, threshold-monotone subset; short docs carry no bigrams."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from seaexplorertools_spark.operators.lm import (
    doc_bigrams,
    perplexity_filter,
    score_cross_entropy,
    train_bigram_lm,
)


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetitive_text_scores_lower(spark):
    # doc 0 is one bigram repeated; doc 1 cycles through rare transitions.
    docs = _mkdocs(
        spark,
        [(0, "a b " * 20), (1, "a c b d c a d b a e e d b c")],
    )
    uni, big, v = train_bigram_lm(docs)
    got = {
        r["doc_id"]: r["xent"]
        for r in score_cross_entropy(docs, uni, big, v).collect()
    }
    assert got[0] < got[1]


def test_xent_matches_hand_computation(spark):
    # corpus "a b a b": bigrams (a,b)x2? no — single doc "a b a": pairs
    # (a,b),(b,a); c(a)=2, c(b)=1, V=2; p(b|a)=(1+1)/(2+2)=0.5,
    # p(a|b)=(1+1)/(1+2)=2/3 → xent = -(ln .5 + ln(2/3))/2
    docs = _mkdocs(spark, [(0, "a b a")])
    uni, big, v = train_bigram_lm(docs)
    assert v == 2
    [row] = score_cross_entropy(docs, uni, big, v).collect()
    want = -(math.log(0.5) + math.log(2.0 / 3.0)) / 2
    assert abs(row["xent"] - want) < 1e-12
    assert row["n_bigrams"] == 2


def test_short_docs_have_no_bigrams(spark):
    docs = _mkdocs(spark, [(0, "only"), (1, ""), (2, "two tokens")])
    assert {r["doc_id"] for r in doc_bigrams(docs).collect()} == {2}


def test_perplexity_filter_monotone(spark, sf_dir):
    from seaexplorertools_spark.contract import table

    docs = table(spark, sf_dir, "documents")
    n_all = docs.count()
    loose = perplexity_filter(docs, max_ppl=1e9).count()
    tight = perplexity_filter(docs, max_ppl=30.0).count()
    none = perplexity_filter(docs, max_ppl=1.0).count()
    # every scoreable doc passes an infinite ceiling; thresholds nest
    assert none == 0 < tight < loose <= n_all


def test_mixture_resample_hits_budget(spark, sf_dir):
    """The contract query keeps ≈budget docs in ≈target proportions."""
    from seaexplorertools_spark.contract import QUERIES, _MIX_BUDGET

    out = QUERIES["q_mixture_resample"](spark, sf_dir).collect()
    n = len(out)
    # hash-threshold sampling is binomial around the target; sf0.001 has
    # only ~50 docs over 20 sources so allow wide but bounded slack
    assert 0 < n <= 2 * _MIX_BUDGET
    assert {r["source"] for r in out} <= {"src0", "src1", "src2", "src3"}
