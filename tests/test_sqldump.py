"""SQL dump tuple extraction (operators/sqldump.py): multi-row VALUES,
escape folding, commas/parens inside strings, decoy tables, column
list form, and plan shape."""

from __future__ import annotations

from seaexplorertools_spark.operators.sqldump import (
    documents_as_sqldump,
    sqldump_rows,
)

DUMP = r"""-- MySQL dump 10.13
DROP TABLE IF EXISTS `page`;
CREATE TABLE `page` (id int, title text, score double, flags int);
INSERT INTO `other` VALUES (1,'skip',0,0);
INSERT INTO `page` VALUES (1,'Hello, (world)',0.5,7),(2,'it''s \'ok\'',1.5,NULL);
INSERT INTO `page` (id, title, score, flags) VALUES (3,'x',2.5,0);
"""


def _run(spark, dump):
    df = spark.createDataFrame([(1, dump)], "doc_id long, sql_text string")
    return sqldump_rows(df, "page", ["id", "title", "score", "flags"]).orderBy(
        "stmt_idx", "tuple_idx"
    ).collect()


def test_tuples(spark):
    rows = _run(spark, DUMP)
    assert len(rows) == 3  # decoy table skipped
    a, b, c = rows
    # commas and parens INSIDE a quoted string don't split the tuple
    assert (a["id"], a["title"], a["score"], a["flags"]) == (
        "1", "Hello, (world)", "0.5", "7",
    )
    # both escape styles fold; bare NULL → NULL
    assert b["title"] == "it's 'ok'" and b["flags"] is None
    # column-list INSERT form parses too
    assert (c["stmt_idx"], c["id"]) == (1, "3")


def test_no_statements(spark):
    assert _run(spark, "CREATE TABLE `page` (id int);") == []


def test_fixture_branches(spark, sf_dir):
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = sqldump_rows(
        documents_as_sqldump(docs), "page", ["id", "title", "score", "flags"]
    )
    agg = out.agg(
        F.sum(F.col("flags").isNull().cast("long")).alias("n_null"),
        F.sum(F.col("title").contains("'").cast("long")).alias("n_esc"),
        F.countDistinct("stmt_idx").alias("n_stmts"),
    ).collect()[0]
    assert agg["n_null"] > 0 and agg["n_esc"] > 0 and agg["n_stmts"] == 2


def test_stays_jvm_side(spark):
    df = spark.createDataFrame([(1, DUMP)], "doc_id long, sql_text string")
    plan = (
        sqldump_rows(df, "page", ["id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Arrow" not in plan
