"""Span corruption (operators/denoise.py): sentinel placement, ragged
tail spans, round-trip property (input+target rebuild the text), and
plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seaexplorertools_spark.operators.denoise import span_corrupt


def _run(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return span_corrupt(df, **kw).collect()[0]


def test_basic_shape(spark):
    # 9 tokens, every=7, span=2: spans at 0-1 and 7-8 (ragged full)
    r = _run(spark, "t0 t1 t2 t3 t4 t5 t6 t7 t8")
    assert r["n_tokens"] == 9 and r["n_masked"] == 4
    assert r["input"] == "<extra_id_0> t2 t3 t4 t5 t6 <extra_id_1>"
    assert r["target"] == "<extra_id_0> t0 t1 <extra_id_1> t7 t8"


def test_ragged_single_token_tail(spark):
    # 8 tokens: second span has only t7
    r = _run(spark, "a b c d e f g h")
    assert r["n_masked"] == 3
    assert r["target"].endswith("<extra_id_1> h")


def test_short_doc_fully_masked_span(spark):
    r = _run(spark, "only two")
    assert r["input"] == "<extra_id_0>"
    assert r["target"] == "<extra_id_0> only two"


def test_empty_and_null(spark):
    df = spark.createDataFrame([(1, ""), (2, None)], "doc_id long, text string")
    rows = span_corrupt(df).collect()
    assert all(
        r["n_tokens"] == 0 and r["input"] == "" and r["target"] == ""
        for r in rows
    )


def test_invalid_params():
    with pytest.raises(ValueError):
        span_corrupt(None, every=3, span_len=3)


def test_reconstruction_property(spark, sf_dir):
    """input ∪ target carry every original token exactly once: merging
    them back by sentinel reproduces the document."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    rows = span_corrupt(docs).collect()
    for r in rows:
        toks = r["text"].split()
        kept = [t for t in r["input"].split() if not t.startswith("<extra_id_")]
        masked = [
            t for t in r["target"].split() if not t.startswith("<extra_id_")
        ]
        assert len(kept) + len(masked) == r["n_tokens"] == len(toks)
        assert sorted(kept + masked) == sorted(toks)
        # sentinel ids line up pairwise
        sin = [t for t in r["input"].split() if t.startswith("<extra_id_")]
        stg = [t for t in r["target"].split() if t.startswith("<extra_id_")]
        assert sin == stg


def test_stays_jvm_side(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = span_corrupt(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan


def test_fim_psm_and_spm(spark):
    from seaexplorertools_spark.operators.denoise import fim_transform

    df = spark.createDataFrame([(1, "abcdefghi")], "doc_id long, text string")
    psm = fim_transform(df, mode="psm").collect()[0]
    # 9 chars: cuts at 3 and 6
    assert (psm["n_prefix"], psm["n_middle"], psm["n_suffix"]) == (3, 3, 3)
    assert psm["fim"] == "<PRE>abc<SUF>ghi<MID>def"
    spm = fim_transform(df, mode="spm").collect()[0]
    assert spm["fim"] == "<SUF>ghi<PRE>abc<MID>def"


def test_fim_reconstruction_property(spark, sf_dir):
    from seaexplorertools_spark.operators.denoise import fim_transform

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    for r in fim_transform(docs, mode="psm").collect():
        import re

        m = re.match(r"<PRE>(.*)<SUF>(.*)<MID>(.*)$", r["fim"], re.S)
        pre, suf, mid = m.groups()
        assert pre + mid + suf == r["text"]
        assert (len(pre), len(mid), len(suf)) == (
            r["n_prefix"], r["n_middle"], r["n_suffix"],
        )


def test_fim_short_and_empty(spark):
    from seaexplorertools_spark.operators.denoise import fim_transform

    df = spark.createDataFrame(
        [(1, "ab"), (2, ""), (3, None)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in fim_transform(df).collect()}
    assert rows[1]["fim"] == "<PRE><SUF>b<MID>a"  # cuts at 0 and 1
    assert rows[2]["fim"] == "<PRE><SUF><MID>" and rows[3]["fim"] == "<PRE><SUF><MID>"


def test_fim_invalid_mode():
    from seaexplorertools_spark.operators.denoise import fim_transform

    import pytest as _pt

    with _pt.raises(ValueError):
        fim_transform(None, mode="pms")
