"""Rendezvous hashing: the consistency law — adding a shard never moves a
key between surviving shards, and steals ~1/(n+1) of them."""

from pyspark.sql import functions as F

from seaexplorertools_spark.operators.placement import rendezvous_shard


def test_growth_moves_only_stolen_keys(spark):
    df = spark.range(2000).select(F.col("id"))
    old = [f"s{i}" for i in range(8)]
    new = old + ["s8"]
    both = df.select(
        "id",
        rendezvous_shard(F.col("id"), old).alias("before"),
        rendezvous_shard(F.col("id"), new).alias("after"),
    ).collect()
    moved = [r for r in both if r["before"] != r["after"]]
    # every move lands on the NEW shard — never between survivors
    assert all(r["after"] == "s8" for r in moved)
    # steal fraction ~ 1/9 of 2000 ≈ 222
    assert 130 <= len(moved) <= 330
    # balance: every shard within 2.5x of fair share before growth
    sizes = {}
    for r in both:
        sizes[r["before"]] = sizes.get(r["before"], 0) + 1
    assert set(sizes) == set(old)
    assert max(sizes.values()) < 2.5 * (2000 / 8)
