"""mapInArrow surface (operators/arrowmap.py): batch-level normalize must
equal the pure-JVM expression result, including empty/zero vectors."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from seaexplorertools_spark.operators.arrowmap import l2_normalize_arrow


def test_arrow_normalize_matches_jvm(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = l2_normalize_arrow(e, "embedding").select("vec_id", "embedding")
    nrm = F.sqrt(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x))
    jvm = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x / F.nullif(nrm, F.lit(0.0))).alias("embedding"),
    )
    a = {r["vec_id"]: r["embedding"] for r in got.collect()}
    b = {r["vec_id"]: r["embedding"] for r in jvm.collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert all(math.isclose(x, y, rel_tol=1e-6, abs_tol=1e-9) for x, y in zip(a[k], b[k]))
        assert math.isclose(sum(x * x for x in a[k]), 1.0, rel_tol=1e-5)


def test_arrow_normalize_edge_rows(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [])],
        "id long, embedding array<float>",
    )
    rows = {r["id"]: r["embedding"] for r in l2_normalize_arrow(df).collect()}
    assert [round(v, 6) for v in rows[1]] == [0.6, 0.8]
    assert rows[2] == [0.0, 0.0]  # zero vector stays zero (guarded norm)
    assert rows[3] == []
