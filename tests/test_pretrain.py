"""pretrain_prep stage attribution: each gate only shrinks the corpus,
the LM gate keeps the low-perplexity side, and the manifest accounts for
every token of the mixed set."""

from __future__ import annotations

from pyspark.sql import functions as F

from seaexplorertools_spark.contract import table
from seaexplorertools_spark.operators.dedup import tokens
from seaexplorertools_spark.operators.lm import score_cross_entropy, train_bigram_lm
from seaexplorertools_spark.operators.sampling import stratified_sample
from seaexplorertools_spark.pipeline.corpus import corpus_prep
from seaexplorertools_spark.pipeline.pretrain import (
    MIX_DEFAULT,
    MIX_FRACTIONS,
    pretrain_prep,
)


def test_pretrain_stages_shrink_and_manifest_balances(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    surv = corpus_prep(docs).select("doc_id")
    corpus = docs.join(surv, "doc_id")
    uni, big, vocab = train_bigram_lm(corpus)
    scored = score_cross_entropy(corpus, uni, big, vocab)
    kept_ids = scored.filter(F.round("xent", 6) <= 3.41).select("doc_id")
    kept = corpus.join(kept_ids, "doc_id")
    mixed = stratified_sample(
        kept, "source", "doc_id", MIX_FRACTIONS, default=MIX_DEFAULT, salt="pp"
    )

    n_docs, n_surv, n_kept, n_mixed = (
        docs.count(), corpus.count(), kept.count(), mixed.count()
    )
    assert n_docs > n_surv > n_kept > n_mixed > 0

    manifest = pretrain_prep(docs)
    got = manifest.agg(
        F.sum("n_docs").alias("d"), F.sum("n_tokens").alias("t")
    ).collect()[0]
    want_t = mixed.agg(
        F.sum(F.size(tokens(F.col("text"))).cast("long"))
    ).collect()[0][0]
    assert got["d"] == n_mixed
    assert got["t"] == want_t


def test_pretrain_lm_gate_keeps_low_xent_side(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    surv = corpus_prep(docs).select("doc_id")
    corpus = docs.join(surv, "doc_id")
    uni, big, vocab = train_bigram_lm(corpus)
    scored = score_cross_entropy(corpus, uni, big, vocab)
    kept_max = scored.filter(F.round("xent", 6) <= 3.41).agg(
        F.max("xent")
    ).collect()[0][0]
    dropped_min = scored.filter(F.round("xent", 6) > 3.41).agg(
        F.min("xent")
    ).collect()[0][0]
    assert kept_max <= dropped_min
