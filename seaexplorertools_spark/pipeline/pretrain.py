"""Pretraining data preparation, end to end — the second-stage composition
on top of ``corpus_prep``:

    corpus_prep survivors (langid → quality → dedup → decontamination)
      → bigram-LM perplexity gate (LM TRAINED ON THE SURVIVORS — the
        CCNet trick: the cleaned corpus defines "normal" text)
      → domain-mixture reweighting (per-source hash-threshold fractions)
      → sequence-packing manifest (hash-sharded, capacity-token windows)

Everything stays one lazy DAG: the survivor set and LM count tables are
corpus-derived smalls that broadcast back over the corpus; the mixture
stage is a map-side filter; packing shuffles once (by shard) for the
cumsum window plus once for the manifest aggregate. No stage materializes
the corpus to the driver.

The contract query ``pipe_pretrain_prep`` checks the whole chain against
one DuckDB statement composed from the same stages' oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.lm import score_cross_entropy, train_bigram_lm
from ..operators.packing import pack_manifest
from ..operators.sampling import stratified_sample
from .corpus import corpus_prep

MIX_FRACTIONS = {"src0": 0.9, "src1": 0.7, "src2": 0.5, "src3": 0.3}
MIX_DEFAULT = 0.25


def pretrain_prep(
    docs: DataFrame,
    xent_max: float = 3.41,
    capacity: int = 512,
    n_shards: int = 8,
) -> DataFrame:
    """Return the (shard, bin, n_docs, n_tokens) packing manifest of the
    fully prepared pretraining corpus. The perplexity cut compares the
    6-dp-ROUNDED cross-entropy so the kept set is engine-exact."""
    # the cleaned corpus is the pipeline's staging boundary: expensive to
    # derive (LSH + connected components) and consumed by four downstream
    # actions (LM training ×2, scoring, the kept join). keep_cols carries
    # text/source THROUGH corpus_prep's anti-joins (no corpus-sized
    # re-join); cache = the staging materialization a 100 TB run would
    # write to parquet between jobs.
    corpus = (
        corpus_prep(docs, keep_cols=["text", "source"])
        .select("doc_id", "text", "source")
        .cache()
    )

    uni, big, vocab = train_bigram_lm(corpus)
    scored = score_cross_entropy(corpus, uni, big, vocab)
    kept_ids = scored.filter(
        F.round(F.col("xent"), 6) <= F.lit(float(xent_max))
    ).select("doc_id")
    kept = corpus.join(kept_ids, "doc_id")

    mixed = stratified_sample(
        kept, "source", "doc_id", MIX_FRACTIONS, default=MIX_DEFAULT, salt="pp"
    )
    return pack_manifest(mixed, capacity=capacity, n_shards=n_shards)
