"""Sequence-packing manifest semantics (all tokens accounted, bins start
at capacity boundaries, sharded parallelism) and chunking coverage
(every token appears, overlap = size - stride)."""

from __future__ import annotations

from pyspark.sql import functions as F

from seaexplorertools_spark.contract import QUERIES, table
from seaexplorertools_spark.operators.dedup import tokens


def test_packing_accounts_for_every_token(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    total = docs.select(
        F.sum(F.size(tokens(F.col("text"))).cast("long")).alias("t")
    ).collect()[0]["t"]
    bins = QUERIES["q_pack_sequences"](spark, sf_dir)
    got = bins.agg(
        F.sum("n_tokens").alias("t"), F.countDistinct("shard").alias("s")
    ).collect()[0]
    assert got["t"] == total  # packing moves tokens, never drops them
    assert got["s"] == 8  # all shards populated -> cumsum parallelizes


def test_packing_bins_are_contiguous_per_shard(spark, sf_dir):
    bins = QUERIES["q_pack_sequences"](spark, sf_dir).collect()
    by_shard = {}
    for r in bins:
        by_shard.setdefault(r["shard"], []).append(r["bin"])
    for shard, ids in by_shard.items():
        assert sorted(ids) == list(range(len(ids))), shard


def test_chunk_count_and_first_chunk_exact(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    chunks = QUERIES["txt_chunk"](spark, sf_dir)
    expect = docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("nt"),
        F.array_join(F.slice(tokens(F.col("text")), 1, 32), " ").alias("head"),
    ).filter(F.col("nt") > 0)
    got = chunks.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.min(F.when(F.col("chunk_id") == 0, F.col("chunk_text"))).alias("c0"),
    )
    j = expect.join(got, "doc_id")
    # n_chunks = #starts below nt at stride 24 = ceil(nt/24)
    bad = j.filter(
        (F.col("n_chunks") != F.ceil(F.col("nt") / F.lit(24.0)))
        | (F.col("c0") != F.col("head"))
    ).count()
    assert bad == 0
    assert j.count() == expect.count()


def test_chunk_overlap_is_stride_complement(spark, sf_dir):
    """For every full-length chunk k, chunk k+1's first 8 tokens equal
    chunk k's last 8 (size 32 - stride 24)."""
    chunks = QUERIES["txt_chunk"](spark, sf_dir)
    a = chunks.filter(F.col("chunk_len") == 32).select(
        "doc_id",
        F.col("chunk_id").alias("k"),
        F.array_join(F.slice(F.split("chunk_text", " "), 25, 8), " ").alias("tail8"),
    )
    b = chunks.select(
        "doc_id",
        (F.col("chunk_id") - 1).alias("k"),
        F.array_join(F.slice(F.split("chunk_text", " "), 1, 8), " ").alias("head8"),
    )
    j = a.join(b, ["doc_id", "k"], "inner")
    assert j.count() > 0
    assert j.filter(F.col("tail8") != F.col("head8")).count() == 0
