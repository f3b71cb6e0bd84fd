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


class TestKneserNey:
    """Interpolated KN bigram — verified against a hand-computed model
    on a 3-document toy corpus (counts small enough to do on paper)."""

    DOCS = [
        (1, "a b a b c"),
        (2, "a b c d"),
        (3, "b c a b"),
    ]
    # bigrams: d1: ab ba ab bc | d2: ab bc cd | d3: bc ca ab
    # bc table: ab:4 ba:1 bc:3 ca:1 cd:1  -> n_types=5, n1=3, n2=0
    # D = 3/(3+0) = 1.0
    # ctx: a:(c1=5? ab4+?)  a->b 4 ; so ctx a: c1=4, n_follow=1
    #      b: ba1+bc3 -> c1=4, n_follow=2
    #      c: ca1+cd1 -> c1=2, n_follow=2
    # cont: b<-{a}:1? preceded by a(ab) -> n_prec(b)=1
    #       a<-{b,c}: ba, ca -> 2 ; c<-{b}: 1 ; d<-{c}: 1

    def _expected(self):
        import math

        bc = {("a", "b"): 4, ("b", "a"): 1, ("b", "c"): 3,
              ("c", "a"): 1, ("c", "d"): 1}
        ctx = {"a": (4, 1), "b": (4, 2), "c": (2, 2)}
        cont = {"b": 1, "a": 2, "c": 1, "d": 1}
        n_types, d = 5, 1.0

        def p(w1, w2):
            c1, nf = ctx[w1]
            return max(bc[(w1, w2)] - d, 0.0) / c1 + d * nf / c1 * (
                cont[w2] / n_types
            )

        def xent(pairs):
            return sum(-math.log(p(a, b)) for a, b in pairs) / len(pairs)

        return {
            1: xent([("a", "b"), ("b", "a"), ("a", "b"), ("b", "c")]),
            2: xent([("a", "b"), ("b", "c"), ("c", "d")]),
            3: xent([("b", "c"), ("c", "a"), ("a", "b")]),
        }

    def test_model_tables_and_discount(self, spark):
        from seaexplorertools_spark.operators.lm import train_kn_bigram

        docs = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        bc, ctx, cont, scalars = train_kn_bigram(docs)
        s = scalars.collect()[0]
        assert (s["n_types"], s["n1"], s["n2"]) == (5, 3, 0)
        assert s["d"] == 1.0
        got_ctx = {r["w1"]: (r["c1"], r["n_follow"]) for r in ctx.collect()}
        assert got_ctx == {"a": (4, 1), "b": (4, 2), "c": (2, 2)}
        got_cont = {r["w2"]: r["n_prec"] for r in cont.collect()}
        assert got_cont == {"a": 2, "b": 1, "c": 1, "d": 1}

    def test_scores_match_hand_computation(self, spark):
        from seaexplorertools_spark.operators.lm import (
            score_cross_entropy_kn,
            train_kn_bigram,
        )

        docs = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        scored = score_cross_entropy_kn(docs, *train_kn_bigram(docs))
        got = {r["doc_id"]: r["xent"] for r in scored.collect()}
        want = self._expected()
        assert set(got) == set(want)
        for k in want:
            assert abs(got[k] - want[k]) < 1e-12, k
