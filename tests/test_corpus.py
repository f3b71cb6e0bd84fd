"""corpus_prep composition tests: every stage must actually drop documents
on the fixture (no vacuous filters), survivors are a subset of the input,
and the keep-side features match the standalone operators. Oracle parity of
the full chain is the pipe_corpus_prep contract query."""

from __future__ import annotations

from pyspark.sql import functions as F

from seaexplorertools_spark.contract import table
from seaexplorertools_spark.pipeline.corpus import corpus_prep


def test_each_stage_drops_something(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    n = docs.count()
    out = corpus_prep(docs)
    survivors = out.count()
    assert 0 < survivors < n, (survivors, n)

    # stage attribution: loosening exactly one knob must strictly grow the
    # survivor set (proves the stage was binding, not vacuous)
    base = survivors
    assert corpus_prep(docs, min_tokens=0).count() > base
    assert corpus_prep(docs, min_ttr=0.0).count() > base
    assert corpus_prep(docs, contamination_min_shingles=10**9).count() > base
    assert corpus_prep(docs, jaccard_threshold=1.01).count() >= base
    # eval slice is always excluded, even with every other knob loose
    loose = corpus_prep(
        docs, min_tokens=0, min_ttr=0.0, contamination_min_shingles=10**9
    )
    assert loose.filter(F.col("doc_id") % 50 == 0).count() == 0


def test_survivor_ids_subset_and_unique(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    out = corpus_prep(docs)
    ids = [r["doc_id"] for r in out.select("doc_id").collect()]
    assert len(ids) == len(set(ids))
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert set(ids) <= all_ids


def test_zipf_fit_recovers_known_slope(spark, tmp_path):
    """A corpus built with counts c(r) = round(1000 / r^0.8) must fit
    slope ≈ -0.8 with high r²; the fixture-parquet query is oracle
    checked, this pins the semantics on controlled input."""
    import math

    from seaexplorertools_spark.contract import QUERIES

    words = []
    for r in range(1, 101):
        words += [f"w{r:03d}"] * max(1, round(1000 / r**0.8))
    # one doc per 50 words so the tokenizer path is exercised
    docs = [
        (i, " ".join(words[i * 50 : (i + 1) * 50]), "en", "src0", 1)
        for i in range((len(words) + 49) // 50)
    ]
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    row = QUERIES["q_zipf_fit"](spark, str(tmp_path)).collect()[0]
    assert row["n_terms"] == 100
    assert math.isclose(row["slope"], -0.8, abs_tol=0.05)
    assert row["r2"] > 0.98
