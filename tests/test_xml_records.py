"""Generic XML record explosion (operators/markup.py::xml_records):
field path forms, entities, attribute-bearing record tags, missing
fields, and plan shape."""

from __future__ import annotations

from seaexplorertools_spark.operators.markup import (
    documents_as_xml,
    xml_records,
)

XML = (
    '<?xml version="1.0"?><catalog>'
    '<item id="1" cat="a"><name>First &amp; Co</name>'
    '<price currency="usd">10.5</price><desc>d&quot;1</desc></item>'
    '<item id="2"><name>Second</name>'
    "<price>3</price></item>"
    "</catalog>"
)

FIELDS = [
    ("id", "@id"),
    ("cat", "@cat"),
    ("name", "name"),
    ("price", "price"),
    ("currency", "price@currency"),
    ("desc", "desc"),
]


def _run(spark, text, tag="item", fields=FIELDS):
    df = spark.createDataFrame([(1, text)], "doc_id long, xml_text string")
    return xml_records(df, tag, fields).orderBy("rec_idx").collect()


def test_records(spark):
    a, b = _run(spark, XML)
    assert (a["id"], a["cat"]) == ("1", "a")
    assert a["name"] == "First & Co"  # entity
    assert (a["price"], a["currency"]) == ("10.5", "usd")
    assert a["desc"] == 'd"1'
    # missing attribute / element → NULL
    assert (b["id"], b["cat"], b["desc"], b["currency"]) == ("2", None, None, None)
    assert b["price"] == "3"


def test_no_records(spark):
    assert _run(spark, "<catalog></catalog>") == []
    assert _run(spark, "not xml at all") == []


def test_nested_same_tag_scope(spark):
    # a record tag inside another element still explodes independently
    t = "<root><item><name>x</name></item><other/><item><name>y</name></item></root>"
    rows = _run(spark, t, fields=[("name", "name")])
    assert [r["name"] for r in rows] == ["x", "y"]


def test_fixture_branches(spark, sf_dir):
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = xml_records(
        documents_as_xml(docs), "item",
        [("id", "@id"), ("name", "name"), ("desc", "desc")],
    )
    agg = out.agg(
        F.sum(F.col("desc").isNull().cast("long")).alias("n_nodesc"),
        F.sum(F.col("name").contains("&").cast("long")).alias("n_amp"),
    ).collect()[0]
    assert agg["n_nodesc"] > 0 and agg["n_amp"] > 0


def test_stays_jvm_side(spark):
    df = spark.createDataFrame([(1, XML)], "doc_id long, xml_text string")
    plan = (
        xml_records(df, "item", FIELDS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Arrow" not in plan
