"""RSS feed explosion (operators/markup.py::rss_items): the xml_records
composition, RFC-822 pubDate forms, enclosure attrs, degrade."""

from __future__ import annotations

from seaexplorertools_spark.operators.markup import documents_as_rss, rss_items

FEED = (
    '<?xml version="1.0"?><rss version="2.0"><channel><title>T</title>'
    "<item><title>Ep 1</title><link>https://x/1</link>"
    "<guid>g1</guid><pubDate>Tue, 03 Jun 2026 09:39:21 GMT</pubDate>"
    '<enclosure url="https://cdn/x.mp3" length="123" type="audio/mpeg"/>'
    "</item>"
    "<item><title>Ep 2</title><link>https://x/2</link>"
    "<pubDate>03 Jun 2026 09:00:00 -0530</pubDate></item>"
    "<item><title>Bad date</title><pubDate>tomorrow-ish</pubDate></item>"
    "</channel></rss>"
)


def _run(spark, feed):
    df = spark.createDataFrame([(1, feed)], "doc_id long, xml_text string")
    return rss_items(df).orderBy("rec_idx").collect()


def test_items(spark):
    a, b, c = _run(spark, FEED)
    assert a["title"] == "Ep 1" and a["guid"] == "g1"
    assert a["enclosure_url"] == "https://cdn/x.mp3"
    assert a["enclosure_bytes"] == 123
    assert str(a["pub_ts"]) == "2026-06-03 09:39:21"
    # day-name-less form; -0530 → UTC = +5h30
    assert str(b["pub_ts"]) == "2026-06-03 14:30:00"
    assert b["enclosure_url"] is None and b["enclosure_bytes"] is None
    # junk pubDate degrades to NULL, item still emitted
    assert c["pub_ts"] is None and c["title"] == "Bad date"


def test_not_a_feed(spark):
    assert _run(spark, "<html>nope</html>") == []


def test_fixture_branches(spark, sf_dir):
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = rss_items(documents_as_rss(docs))
    agg = out.agg(
        F.sum(F.col("enclosure_url").isNull().cast("long")).alias("n_noenc"),
        F.sum(F.col("title").contains("&").cast("long")).alias("n_amp"),
        F.sum(F.col("pub_ts").isNull().cast("long")).alias("n_badts"),
    ).collect()[0]
    assert agg["n_noenc"] > 0 and agg["n_amp"] > 0 and agg["n_badts"] == 0
