"""WordPiece greedy encode (operators/wordpiece.py): greedy
longest-match semantics case-by-case, [UNK] wholesale degrade, the
JVM-aggregate vs Arrow-path result identity, and plan shape (the
default path has no Python workers)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seaexplorertools_spark.operators.wordpiece import (
    DEFAULT_VOCAB,
    wordpiece_encode,
    wordpiece_encode_arrow,
    wordpiece_pieces,
)


def _enc_one(spark, word, vocab=None):
    df = spark.createDataFrame([(word,)], "word string")
    return df.select(wordpiece_pieces(F.col("word"), vocab).alias("e")).collect()[0]["e"]


@pytest.mark.parametrize(
    "word,vocab,want",
    [
        # longest-match-first: 'unhappy' with {un, happy, ...} splits
        # at the longest prefixes, not char-by-char
        ("unhappy", ["un", "happy", "u", "n", "h", "a", "p", "y"], "un ##happy"),
        # greedy is NOT optimal: 'abc' with {ab, c, a, bc} takes ab+c
        ("abc", ["ab", "c", "a", "bc"], "ab ##c"),
        # single full-word match → one piece, no markers
        ("spark", DEFAULT_VOCAB, "spark"),
        # continuation marker on every non-initial piece
        ("keydata", DEFAULT_VOCAB, "key ##data"),
        # unmatchable char anywhere → whole word [UNK]
        ("abzc", DEFAULT_VOCAB, "[UNK]"),
        ("z0", DEFAULT_VOCAB, "[UNK]"),
        # a vocab piece longer than the remaining word must not match
        # a shortened substr ('tables' ends in 's'+nothing: 'table'+'s')
        ("tables", DEFAULT_VOCAB, "table ##s"),
    ],
)
def test_greedy_cases(spark, word, vocab, want):
    assert _enc_one(spark, word, vocab) == want


def test_word_extraction_and_indexing(spark):
    df = spark.createDataFrame([(7, "Big Data, 42 rows!")], "doc_id long, text string")
    rows = wordpiece_encode(df).orderBy("word_idx").collect()
    assert [(r["word_idx"], r["word"]) for r in rows] == [
        (1, "big"), (2, "data"), (3, "42"), (4, "rows"),
    ]
    # digits are out-of-vocab by construction
    assert rows[2]["encoded"] == "[UNK]"
    assert rows[1]["encoded"] == "data"


def test_null_text_yields_no_words(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    assert wordpiece_encode(df).count() == 0


def test_arrow_path_is_result_identical(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    a = wordpiece_encode(docs).orderBy("doc_id", "word_idx").collect()
    b = wordpiece_encode_arrow(docs).orderBy("doc_id", "word_idx").collect()
    assert a == b and len(a) > 0


def test_distinct_path_is_result_identical(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    a = wordpiece_encode(docs, via_distinct=True).orderBy(
        "doc_id", "word_idx"
    ).collect()
    b = wordpiece_encode(docs, via_distinct=False).orderBy(
        "doc_id", "word_idx"
    ).collect()
    assert a == b and len(a) > 0


def test_fertility_report(spark, sf_dir):
    from seaexplorertools_spark.contract import QUERIES

    rows = QUERIES["q_wordpiece_stats"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_unk"] >= 1  # the planted z0/z1 token
        assert r["n_words"] >= r["n_unk"]
        covered = r["n_words"] - r["n_unk"]
        if covered:
            assert r["fertility"] >= 1.0  # ≥1 piece per covered word
            assert r["n_pieces"] >= covered
        else:
            assert r["fertility"] is None and r["n_pieces"] == 0
        assert 0.0 < r["unk_rate"] <= 1.0


def test_default_path_stays_jvm_side(spark):
    df = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    plan = wordpiece_encode(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
