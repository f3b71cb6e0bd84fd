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
