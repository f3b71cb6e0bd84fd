"""End-to-end training-corpus preparation — the composition a real
pre-training data pipeline runs, built entirely from this engine's
operators:

    language-ID filter → quality gate (tokens, type-token ratio) →
    eval-slice exclusion → exact dedup (prefix digest) →
    near-dup removal (MinHash-LSH → Jaccard → connected components) →
    benchmark decontamination (shared-shingle threshold vs the holdout)

Each drop-set is computed independently over the corpus and removed with
left-anti joins (not sequentially re-filtered), so the stages parallelize
and the whole plan stays one DAG: scan once, derive the small drop-sets,
anti-join them back. At 100 TB every drop-set here is tiny relative to the
corpus (dup losers, contaminated ids), so the anti-joins broadcast.

The contract query ``pipe_corpus_prep`` checks the full composition against
a single DuckDB SQL statement chaining the same stages' oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import text as T
from ..operators.dedup import doc_shingles, jaccard_on_pairs, lsh_candidate_pairs
from ..operators.graph import dup_clusters


def corpus_prep(
    docs: DataFrame,
    min_tokens: int = 25,
    min_ttr: float = 0.35,
    holdout_mod: int = 50,
    contamination_min_shingles: int = 3,
    jaccard_threshold: float = 0.8,
    exact_prefix: int = 40,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Return the surviving training documents with their language guess and
    quality features. ``doc_id % holdout_mod == 0`` marks the held-out eval
    slice (excluded outright, and the contamination reference)."""
    feats = T.langid(T.quality_features(docs))
    base = feats.filter(
        (F.col("lang_guess") != "und")
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("ttr") >= min_ttr)
        & (F.col("doc_id") % holdout_mod != 0)
    )

    # exact dedup on the prefix digest: later doc_ids in a digest group lose
    w = Window.partitionBy(F.md5(F.substring("text", 1, exact_prefix))).orderBy(
        "doc_id"
    )
    exact_losers = (
        docs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > 1)
        .select("doc_id")
    )

    # near-dup losers: LSH recall -> exact-Jaccard precision -> CC closure
    cand = lsh_candidate_pairs(docs, k=16, band_rows=4)
    jac = jaccard_on_pairs(docs, cand, use_shingles=True)
    nd_losers = (
        dup_clusters(jac.filter(F.col("jaccard") >= jaccard_threshold))
        .filter(~F.col("keep"))
        .select("doc_id")
    )

    # decontamination: train docs sharing >= K distinct shingles with eval
    sh = doc_shingles(docs, 3)
    hold = sh.filter(F.col("doc_id") % holdout_mod == 0).select("tok").distinct()
    contaminated = (
        sh.filter(F.col("doc_id") % holdout_mod != 0)
        .join(F.broadcast(hold), "tok")
        .groupBy("doc_id")
        .agg(F.count_distinct("tok").alias("__ns"))
        .filter(F.col("__ns") >= contamination_min_shingles)
        .select("doc_id")
    )

    # keep_cols lets downstream pipelines (pretrain_prep) carry the text/
    # source columns THROUGH the anti-joins instead of re-joining the
    # survivor ids back to the corpus — at scale the survivor set is most
    # of the corpus, so a re-join would be a second corpus-sized shuffle
    # (the drop-sets, by contrast, stay small and broadcast).
    return (
        base.join(exact_losers, "doc_id", "left_anti")
        .join(nd_losers, "doc_id", "left_anti")
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "lang_guess", "n_tokens", "ttr", *(keep_cols or []))
    )
