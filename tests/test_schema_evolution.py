"""Lake-schema concerns: mergeSchema reads across file generations, added
columns back-filled with nulls, and reader-schema projection of legacy
files — the drift behaviors a long-lived 100 TB table lives with."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_merge_schema_unions_generations(spark, tmp_path):
    out = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(f"{out}/gen=1")
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.parquet(f"{out}/gen=2")
    df = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(df.columns) == {"id", "v", "score", "gen"}
    rows = {r["id"]: (r["v"], r["score"]) for r in df.collect()}
    assert rows[1] == ("a", None)  # legacy rows null-fill the new column
    assert rows[2] == ("b", 9.5)


def test_explicit_reader_schema_projects_legacy_files(spark, tmp_path):
    out = str(tmp_path / "legacy")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(out)
    df = spark.read.schema("id long, v string, score double").parquet(out)
    got = df.select("id", "score").collect()
    assert got[0]["score"] is None
    # and the projection still prunes: only requested columns in the scan
    plan = df.select("id")._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "ReadSchema: struct<id:bigint>" in plan
