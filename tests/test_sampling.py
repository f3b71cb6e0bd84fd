"""Hash-threshold sampling: determinism, nesting (monotone fractions give
supersets), stratified rates, and salt decorrelation."""

from __future__ import annotations

from pyspark.sql import functions as F

from seaexplorertools_spark.operators.sampling import (
    hash_uniform,
    sample_fraction,
    stratified_sample,
)


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_deterministic_and_nested(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s30a = _ids(sample_fraction(docs, "doc_id", 0.3))
    s30b = _ids(sample_fraction(docs, "doc_id", 0.3))
    s60 = _ids(sample_fraction(docs, "doc_id", 0.6))
    assert s30a == s30b  # same keys → same sample, every run
    assert s30a <= s60  # thresholds nest: smaller fraction is a subset
    n = docs.count()
    assert 0.15 * n < len(s30a) < 0.45 * n  # rate in the right ballpark


def test_repartition_invariance(spark, sf_dir):
    """The draw depends only on the key — physical layout must not matter
    (the property df.sample() does NOT have)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = _ids(sample_fraction(docs, "doc_id", 0.4))
    b = _ids(sample_fraction(docs.repartition(7, "lang"), "doc_id", 0.4))
    assert a == b


def test_stratified_rates(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = stratified_sample(docs, "lang", "doc_id", {"en": 0.1, "zh": 0.9}, default=0.5)
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    tot = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got.get("en", 0) / tot["en"] < 0.25
    assert got["zh"] / tot["zh"] > 0.7


def test_salt_decorrelates(spark, sf_dir):
    """Different salts give (near-)independent draws: train/val splits from
    the same key must not be the same subset."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = _ids(sample_fraction(docs, "doc_id", 0.5, salt="train"))
    b = _ids(sample_fraction(docs, "doc_id", 0.5, salt="val"))
    n = docs.count()
    overlap = len(a & b)
    # independent 0.5 draws overlap ~0.25·n; identical draws would be ~0.5·n
    assert overlap < 0.4 * n
    assert a != b


def test_uniform_range(spark):
    df = spark.range(1000).select(hash_uniform(F.col("id")).alias("u"))
    row = df.agg(F.min("u").alias("lo"), F.max("u").alias("hi"), F.avg("u").alias("m")).collect()[0]
    assert 0.0 <= row["lo"] and row["hi"] < 1.0
    assert 0.4 < row["m"] < 0.6


def test_reservoir_per_group_exact_and_prune_invariant(spark, sf_dir):
    """Exactly min(k, |group|) per group; the threshold-prune scale path
    (tight `over`, which forces the deficiency patch-up through the
    fallback branch) is bit-identical to the pure-window formulation
    (huge `over` => thr=1 => no prune); stable under repartitioning."""
    from pyspark.sql import functions as F

    from seaexplorertools_spark.operators.sampling import reservoir_per_group

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    k = 7
    base = reservoir_per_group(docs, ["lang"], "doc_id", k=k)
    sizes = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {r["lang"]: r["n"] for r in base.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got == {g: min(k, n) for g, n in sizes.items()}

    def key_set(df):
        return {(r["lang"], r["doc_id"], r["sample_rank"]) for r in df.collect()}

    ref = key_set(base)
    # deficiency fallback path: prune keeps (almost) nothing, patch-up restores
    assert key_set(reservoir_per_group(docs, ["lang"], "doc_id", k=k, over=1e-6)) == ref
    # no-prune path
    assert key_set(reservoir_per_group(docs, ["lang"], "doc_id", k=k, over=1e9)) == ref
    # partitioning-invariant
    assert key_set(reservoir_per_group(docs.repartition(17), ["lang"], "doc_id", k=k)) == ref


def test_weighted_sample_exact_partition_invariant_and_biased(spark, sf_dir):
    """Exactly min(k, |group|) rows per group; the partition-local top-k
    combine is invariant under physical repartitioning (so it equals the
    single-window formulation pinned by the oracle); heavier rows are
    sampled more often than lighter ones."""
    from pyspark.sql import functions as F

    from seaexplorertools_spark.operators.sampling import weighted_sample_per_group

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    k = 7
    base = weighted_sample_per_group(docs, ["lang"], "doc_id", "n_chars", k=k)
    sizes = {
        r["lang"]: r["n"]
        for r in docs.filter(F.col("n_chars") > 0)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    got = {r["lang"]: r["n"] for r in base.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got == {g: min(k, n) for g, n in sizes.items()}

    def key_set(df):
        return {(r["lang"], r["doc_id"], r["sample_rank"]) for r in df.collect()}

    ref = key_set(base)
    for nparts in (1, 17):
        assert (
            key_set(
                weighted_sample_per_group(
                    docs.repartition(nparts), ["lang"], "doc_id", "n_chars", k=k
                )
            )
            == ref
        )

    # weight bias: mean n_chars of the sample should exceed the population
    # mean (inclusion ∝ length) — aggregate over many salts to de-noise
    pop_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    samp_means = [
        weighted_sample_per_group(
            docs, ["lang"], "doc_id", "n_chars", k=k, salt=f"s{i}"
        )
        .agg(F.avg("n_chars"))
        .collect()[0][0]
        for i in range(3)
    ]
    assert sum(samp_means) / len(samp_means) > pop_mean


def test_upsample_by_repeats_exact_semantics(spark):
    from seaexplorertools_spark.operators.sampling import (
        hash_uniform,
        upsample_by_repeats,
    )

    rows = [(i, "a" if i < 40 else "b") for i in range(60)]
    df = spark.createDataFrame(rows, ["k", "s"])
    out = upsample_by_repeats(df, "s", "k", {"a": 2.5, "b": 0.5}, salt="t")
    got = out.groupBy("k", "s").agg(F.count("*").alias("n")).collect()
    draws = {
        r["k"]: r["u"]
        for r in df.select("k", hash_uniform(F.col("k"), "t").alias("u")).collect()
    }
    # per-key copies: floor(r) + (draw < frac(r)); copy_id densely 1..n
    for r in got:
        want = (2 if r["s"] == "a" else 0) + (1 if draws[r["k"]] < 0.5 else 0)
        assert r["n"] == want and want >= 1
    keys_out = {r["k"] for r in got}
    for k, s in rows:
        want = (2 if s == "a" else 0) + (1 if draws[k] < 0.5 else 0)
        assert (k in keys_out) == (want >= 1)
    cids = {
        (r["k"], r["copy_id"]) for r in out.select("k", "copy_id").collect()
    }
    for r in got:
        for c in range(1, r["n"] + 1):
            assert (r["k"], c) in cids
    # expectation: a contributes ~2.5*40=100, b ~0.5*20=10
    n_a = sum(r["n"] for r in got if r["s"] == "a")
    n_b = sum(r["n"] for r in got if r["s"] == "b")
    assert 85 <= n_a <= 115 and 4 <= n_b <= 16
    # pure map: no exchange in the plan
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
    # unlisted strata are dropped
    df2 = spark.createDataFrame([(1, "zz")], ["k", "s"])
    assert upsample_by_repeats(df2, "s", "k", {"a": 2.0}).count() == 0


def test_top_k_per_group_cap_semantics_and_partition_invariance(spark, sf_dir):
    """The domain cap keeps exactly min(k, |group|) rows per group, the
    kept set is the true per-group top-k (equals the single-window
    formulation), and the two-phase plan is invariant under physical
    repartitioning."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from seaexplorertools_spark.operators.sampling import top_k_per_group

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "n_chars"
    )
    k = 5
    order = [F.col("n_chars").desc(), F.col("doc_id").asc()]
    got = top_k_per_group(docs, ["source"], order, k=k)

    sizes = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    counts = {
        r["source"]: r["n"]
        for r in got.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {s: min(k, n) for s, n in sizes.items()}

    # equals the naive single-window formulation, bit for bit
    w = Window.partitionBy("source").orderBy(*order)
    naive = (
        docs.withColumn("cap_rank", F.row_number().over(w))
        .filter(F.col("cap_rank") <= k)
    )

    def key_set(df):
        return {
            (r["source"], r["doc_id"], r["cap_rank"])
            for r in df.select("source", "doc_id", "cap_rank").collect()
        }

    ref = key_set(naive)
    assert key_set(got) == ref
    for nparts in (1, 13):
        assert key_set(
            top_k_per_group(docs.repartition(nparts), ["source"], order, k=k)
        ) == ref
