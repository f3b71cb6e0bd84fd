"""Streaming Bloom decontamination == its batch twin on the same files:
the probe is a stateless projection (zero exchanges), so an
availableNow catch-up run must reproduce the batch flags exactly."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from seaexplorertools_spark.operators.dedup import doc_shingles
from seaexplorertools_spark.operators.selection import bloom_build
from seaexplorertools_spark.streaming.decontam import (
    bitmap_from_words,
    decontaminate_flags,
    stream_decontaminate,
)


def _bitmap(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hold = (
        doc_shingles(docs.filter(F.col("doc_id") % 50 == 0), 3)
        .select("tok")
        .distinct()
    )
    return docs, bitmap_from_words(bloom_build(hold, "tok", 65536, 3), 65536)


def test_stream_matches_batch_and_is_stateless(spark, sf_dir):
    docs, bm = _bitmap(spark, sf_dir)
    train = docs.filter(F.col("doc_id") % 50 != 0)

    batch_df = decontaminate_flags(train, bm)
    plan = batch_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # streaming-safe: pure projection

    batch = {r["doc_id"]: (r["n_shingles"], r["n_flagged"]) for r in batch_df.collect()}
    assert any(f > 0 for _, f in batch.values())  # fixture has contamination

    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/docs"
        train.write.mode("overwrite").parquet(src)
        q = (
            stream_decontaminate(spark, src, bm)
            .writeStream.format("memory")
            .queryName("decontam")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r["doc_id"]: (r["n_shingles"], r["n_flagged"])
            for r in spark.sql("SELECT * FROM decontam").collect()
        }
    assert got == batch


def test_no_false_negatives_on_holdout_reinjection(spark, sf_dir):
    """A holdout document re-entering the stream (the exact leak the
    filter exists to catch) must flag every one of its shingles."""
    docs, bm = _bitmap(spark, sf_dir)
    hold_docs = docs.filter(F.col("doc_id") % 50 == 0)
    out = decontaminate_flags(hold_docs, bm).collect()
    assert len(out) > 0
    for r in out:
        assert r["n_flagged"] == r["n_shingles"] and r["is_contaminated"]
