"""Python UDTF surface (functions/udtfs.py): LATERAL correlation,
sentence split semantics, empty/None handling."""

from __future__ import annotations

from seaexplorertools_spark.functions.udtfs import register_udtfs


def test_split_sentences_lateral(spark):
    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, "Hello world. Second one!  Third?"), (2, None), (3, "no terminator here")],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("__udtf_docs")
    out = spark.sql(
        "SELECT s.doc_id, s.sent_id, s.sentence "
        "FROM __udtf_docs, LATERAL split_sentences(doc_id, text) s"
    ).collect()
    got = {(r.doc_id, r.sent_id, r.sentence) for r in out}
    assert got == {
        (1, 0, "Hello world"),
        (1, 1, "Second one"),
        (1, 2, "Third?"),  # trailing punctuation with no following whitespace stays
        (3, 0, "no terminator here"),
    }
