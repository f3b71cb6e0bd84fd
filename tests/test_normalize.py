"""normalize_text semantics on explicitly messy strings, and the
injection round-trip holds corpus-wide (every doc restores exactly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from seaexplorertools_spark.contract import QUERIES
from seaexplorertools_spark.operators.text import normalize_text


def test_normalize_messy_strings(spark):
    rows = [
        (0, "  Hello\t\tWORLD  "),
        (1, "a\x00b\x1fc\x7fd"),
        (2, "one\n\ntwo\r\nthree"),
        (3, "already clean"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        r["id"]: r["n"]
        for r in df.select("id", normalize_text(F.col("s")).alias("n")).collect()
    }
    assert got[0] == "hello world"
    assert got[1] == "a b c d"
    assert got[2] == "one two three"
    assert got[3] == "already clean"
    assert got[4] == ""


def test_normalize_roundtrips_entire_corpus(spark, sf_dir):
    out = QUERIES["txt_normalize"](spark, sf_dir)
    assert out.filter(F.col("roundtrips") != 1).count() == 0
