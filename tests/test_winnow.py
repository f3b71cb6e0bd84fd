"""Winnowing fingerprints (operators/text.py::winnow_fingerprints): the
SIGMOD-2003 guarantee — two documents sharing a token run of length
>= k + window - 1 share at least one fingerprint — plus short-doc edge
cases (the sequence(1,0)-descends Spark trap)."""

from __future__ import annotations

from pyspark.sql import functions as F

from seaexplorertools_spark.operators.text import winnow_fingerprints

K, W = 4, 5
SHARED = "alpha beta gamma delta epsilon zeta eta theta"  # 8 = K + W - 1 tokens


def _fp(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return winnow_fingerprints(df, k=K, window=W)


def test_shared_run_guarantees_shared_fingerprint(spark):
    rows = [
        (1, f"one two three {SHARED} four five six"),
        (2, f"{SHARED} completely different trailing words here"),
    ]
    fp = _fp(spark, rows)
    both = (
        fp.groupBy("fp").agg(F.countDistinct("doc_id").alias("n")).where(F.col("n") == 2)
    )
    assert both.count() >= 1


def test_disjoint_texts_share_nothing(spark):
    rows = [
        (1, "aa bb cc dd ee ff gg hh ii jj"),
        (2, "kk ll mm nn oo pp qq rr ss tt"),
    ]
    fp = _fp(spark, rows)
    shared = fp.groupBy("fp").agg(F.countDistinct("doc_id").alias("n")).where(F.col("n") == 2)
    assert shared.count() == 0


def test_short_docs_yield_no_rows(spark):
    # < k tokens -> no shingles; k..k+w-2 tokens -> shingles but no full window
    fp = _fp(spark, [(1, "only three tokens"), (2, "exactly four tokens here"), (3, "")])
    assert fp.count() == 0


def test_fingerprints_subset_of_shingle_hashes(spark):
    rows = [(1, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12")]
    fp = _fp(spark, rows)
    n_grams = 12 - K + 1  # 9
    n_windows = n_grams - W + 1  # 5
    c = fp.count()
    assert 1 <= c <= n_windows


from hypothesis import given, settings, strategies as st

_tok = st.text(alphabet="abcdefgh", min_size=1, max_size=3)


@settings(max_examples=15, deadline=None)
@given(
    pre=st.lists(_tok, min_size=0, max_size=12),
    shared=st.lists(_tok, min_size=K + W - 1, max_size=K + W + 4),
    post=st.lists(_tok, min_size=0, max_size=12),
)
def test_winnow_guarantee_property(spark, pre, shared, post):
    """SIGMOD-2003 guarantee, property-tested: ANY shared run of
    >= k + window - 1 tokens forces a shared fingerprint, wherever it sits
    in either document."""
    rows = [
        (1, " ".join(pre + shared + ["zz"] * 6)),
        (2, " ".join(["qq"] * 6 + shared + post)),
    ]
    fp = _fp(spark, rows)
    both = fp.groupBy("fp").agg(F.countDistinct("doc_id").alias("n")).where(F.col("n") == 2)
    assert both.count() >= 1
