"""PageRank dataflow semantics (hand-computed tiny graph, mass
conservation) and SemDeDup bounding (pairs are a subset of the all-pairs
duplicate set, candidate count strictly bounded by clustering)."""

from __future__ import annotations

from pyspark.sql import functions as F

from seaexplorertools_spark.contract import table
from seaexplorertools_spark.operators.graph import pagerank
from seaexplorertools_spark.operators.similarity import cosine, semdedup_pairs


def test_pagerank_hand_computed(spark):
    # a<->b cycle plus c->a; no dangling nodes, outdeg all 1
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("c", "a")], "src string, dst string"
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges, n_iter=1).collect()}
    base = 0.15 / 3
    assert abs(got["a"] - (base + 0.85 * (2 / 3))) < 1e-12
    assert abs(got["b"] - (base + 0.85 * (1 / 3))) < 1e-12
    assert abs(got["c"] - base) < 1e-12


def test_pagerank_conserves_mass_without_dangling(spark):
    # every node has an out-edge -> total rank stays 1.0 each iteration
    edges = spark.createDataFrame(
        [(i, (i * 3 + 1) % 7) for i in range(7)], "src long, dst long"
    )
    ranks = pagerank(edges, n_iter=4)
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-9


def test_semdedup_pairs_subset_of_allpairs(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    c = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cv")
    )
    got = semdedup_pairs(e, c, threshold=0.2)

    a = e.select(F.col("vec_id").alias("id1"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("id2"), F.col("v").alias("vb"))
    allp = (
        a.join(b, F.col("id1") < F.col("id2"))
        .withColumn("sim", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("sim") >= 0.2)
        .select("id1", "id2", "sim")
    )
    # clustering only ever REMOVES candidates (precision tool, bounded
    # cost); every surviving pair must exist identically in the full set
    assert got.select("id1", "id2", "sim").exceptAll(allp).count() == 0
    assert 0 < got.count() <= allp.count()
