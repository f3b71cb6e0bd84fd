"""vCard explosion (operators/markup.py::vcard_contacts): unfolding,
structured N with escaped semicolons, repeated EMAIL, absent fields,
and plan shape."""

from __future__ import annotations

from seaexplorertools_spark.operators.markup import (
    documents_as_vcf,
    vcard_contacts,
)

VCF = (
    "BEGIN:VCARD\r\n"
    "VERSION:4.0\r\n"
    "FN:Gre\r\n gor Samsa\r\n"
    "N:Samsa\\; Jr;Gregor;;;\r\n"
    "ORG:Acme\\, Inc\r\n"
    "EMAIL;TYPE=work:g@work.example\r\n"
    "EMAIL:g@home.example\r\n"
    "TEL;TYPE=cell:+43-1-234\r\n"
    "END:VCARD\r\n"
    "BEGIN:VCARD\r\n"
    "VERSION:4.0\r\n"
    "FN:No Details\r\n"
    "END:VCARD\r\n"
)


def _run(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, vcf_text string")
    return vcard_contacts(df).orderBy("card_idx").collect()


def test_cards(spark):
    a, b = _run(spark, VCF)
    assert a["fn"] == "Gregor Samsa"  # folded line reassembled
    assert a["family"] == "Samsa; Jr"  # escaped ';' not a separator
    assert a["given"] == "Gregor"
    assert a["org"] == "Acme, Inc"
    assert a["n_emails"] == 2 and a["first_email"] == "g@work.example"
    assert a["tel"] == "+43-1-234"
    # minimal card: everything else NULL / zero
    assert b["fn"] == "No Details" and b["family"] is None
    assert b["n_emails"] == 0 and b["first_email"] is None
    assert b["tel"] is None and b["org"] is None


def test_empty_payload(spark):
    assert _run(spark, "just text") == []


def test_fixture_branches(spark, sf_dir):
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = vcard_contacts(documents_as_vcf(docs))
    agg = out.agg(
        F.sum(F.col("org").isNull().cast("long")).alias("n_noorg"),
        F.sum(F.col("tel").isNull().cast("long")).alias("n_notel"),
        F.countDistinct("n_emails").alias("n_mailcounts"),
    ).collect()[0]
    assert agg["n_noorg"] > 0 and agg["n_notel"] > 0
    assert agg["n_mailcounts"] == 2


def test_stays_jvm_side(spark):
    df = spark.createDataFrame([(1, VCF)], "doc_id long, vcf_text string")
    plan = vcard_contacts(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
