"""Access-log parsing (operators/weblogs.py): combined-format fields,
timezone normalization, '-' conventions, bot classification, junk
degrade, and plan shape."""

from __future__ import annotations

from seaexplorertools_spark.operators.weblogs import (
    access_log_entries,
    documents_as_access_logs,
)

LINE = (
    '203.0.113.9 - alice [21/Jul/2026:10:12:01 -0330] '
    '"GET /index.html?a=1 HTTP/1.1" 200 5120 '
    '"https://ref.example.com/x" "Mozilla/5.0 Gecko"'
)

BOT_LINE = (
    '198.51.100.4 - - [01/Jan/2026:00:00:00 +0000] '
    '"HEAD /robots.txt HTTP/1.0" 404 - "-" "GoogleBot/2.1"'
)


def _run(spark, line):
    df = spark.createDataFrame([(1, line)], "doc_id long, log_line string")
    return access_log_entries(df).collect()[0]


def test_combined_line(spark):
    r = _run(spark, LINE)
    assert r["parsed"] is True
    assert (r["host"], r["method"], r["status"]) == ("203.0.113.9", "GET", 200)
    assert r["path"] == "/index.html?a=1" and r["bytes"] == 5120
    assert r["referer"] == "https://ref.example.com/x"
    assert r["bot"] is False
    # -0330 offset → UTC = local + 3h30
    assert str(r["ts_utc"]) == "2026-07-21 13:42:01"


def test_bot_and_dash_conventions(spark):
    r = _run(spark, BOT_LINE)
    assert r["bot"] is True and r["bytes"] == 0 and r["referer"] is None
    assert str(r["ts_utc"]) == "2026-01-01 00:00:00"


def test_junk_degrades(spark):
    r = _run(spark, "totally not a log line")
    assert r["parsed"] is False and r["host"] is None
    assert r["bot"] is False and r["ts_utc"] is None


def test_bad_month_yields_null_ts(spark):
    bad = LINE.replace("Jul", "Xxx")
    r = _run(spark, bad)
    assert r["parsed"] is True and r["ts_utc"] is None


def test_fixture_branches(spark, sf_dir):
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = access_log_entries(documents_as_access_logs(docs))
    agg = out.agg(
        F.sum((~F.col("parsed")).cast("long")).alias("n_junk"),
        F.sum(F.col("bot").cast("long")).alias("n_bot"),
        F.sum((F.col("bytes") == 0).cast("long")).alias("n_zero"),
        F.countDistinct("status").alias("n_status"),
    ).collect()[0]
    assert all(agg[k] > 0 for k in ["n_junk", "n_bot", "n_zero"])
    assert agg["n_status"] == 4


def test_stays_jvm_side(spark):
    df = spark.createDataFrame([(1, LINE)], "doc_id long, log_line string")
    plan = access_log_entries(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
