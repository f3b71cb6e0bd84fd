"""RTF extraction (operators/rtf.py): walker rules case-by-case,
destination nesting, escapes, uc fallback handling, hostile degrade,
and the Spark lane."""

from __future__ import annotations

import pytest

from seaexplorertools_spark.operators.rtf import (
    documents_as_rtf,
    rtf_extract,
    rtf_to_text,
)


@pytest.mark.parametrize(
    "src,want",
    [
        (r"{\rtf1 plain text}", "plain text"),
        # control word eats exactly ONE delimiter space
        (r"{\rtf1\b  two}", " two"),
        # \par → newline; raw newlines ignored
        ("{\\rtf1 a\\par\nb}", "a\nb"),
        (r"{\rtf1 a\tab b}", "a\tb"),
        # destination groups dropped, nested sub-groups included
        (r"{\rtf1{\fonttbl{\f0 Arial{\x Y}}}visible}", "visible"),
        (r"{\rtf1{\*\weird {\deep junk}}kept}", "kept"),
        # escapes
        (r"{\rtf1 \'e9\'c0}", "éÀ"),
        ("{\\rtf1 \\u8364 ?eur}", "\u20aceur"),
        # \uc2 skips TWO fallback chars
        ("{\\rtf1\\uc2 \\u8364 ??eur}", "\u20aceur"),
        # negative \u values wrap (16-bit signed form)
        (r"{\rtf1 \u-3400 ?}", chr(-3400 + 65536)),
        (r"{\rtf1 a\{b\}c\\d}", "a{b}c\\d"),
        # parameterized control words strip cleanly
        (r"{\rtf1\fs-24 x\cf2 y}", "xy"),
    ],
)
def test_walker(src, want):
    assert rtf_to_text(src) == want


@pytest.mark.parametrize(
    "bad",
    ["", "no rtf", "{\\rtf1 open", "{\\rtf1 }}", "{\\rtf1 \\", "{\\rtf1 \\'e"],
)
def test_hostile(bad):
    with pytest.raises(ValueError):
        rtf_to_text(bad)


def test_uc_scoping():
    # \uc set inside a group must not leak outside it
    src = r"{\rtf1{\uc2 \u65 ??}\u66 ?}"
    assert rtf_to_text(src) == "AB"


def test_spark_lane(spark):
    docs = spark.createDataFrame(
        [(7, "hello words"), (8, None)], "doc_id long, text string"
    )
    rows = rtf_extract(documents_as_rtf(docs)).orderBy("doc_id").collect()
    assert rows[0]["text"] == "hello words\nCafé — row 7 \n"
    assert rows[0]["n_chars"] == len(rows[0]["text"])
    assert rows[1]["text"] == "\nCafé — row 8 \n"  # NULL text → ''


def test_spark_lane_degrades(spark):
    df = spark.createDataFrame(
        [(1, "not rtf"), (2, None)], "doc_id long, rtf_text string"
    )
    rows = rtf_extract(df).collect()
    assert all(r["text"] is None and r["n_chars"] is None for r in rows)
