"""Property-based tests: duplicate_substring_spans vs a brute-force python
replay on random small-alphabet corpora (small alphabets force frequent
repeats, the adversarial case for interval merging), and top_k_per_group
vs a python sort."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


@st.composite
def corpus(draw):
    n_docs = draw(st.integers(min_value=1, max_value=6))
    docs = []
    for i in range(n_docs):
        length = draw(st.integers(min_value=0, max_value=30))
        docs.append((i, "".join(draw(st.sampled_from("abc")) for _ in range(length))))
    return docs


def _brute_spans(docs, k):
    grams: dict[str, int] = {}
    for _, t in docs:
        for p in range(len(t) - k + 1):
            g = t[p : p + k]
            grams[g] = grams.get(g, 0) + 1
    out = set()
    for doc_id, t in docs:
        dup = [p + 1 for p in range(len(t) - k + 1) if grams[t[p : p + k]] >= 2]
        spans = []
        for p in dup:
            if spans and p <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], p + k - 1)
            else:
                spans.append([p, p + k - 1])
        for s, e in spans:
            out.add((doc_id, s, e, e - s + 1))
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=corpus(), k=st.integers(min_value=2, max_value=5))
def test_substring_spans_property(spark, docs, k):
    from seaexplorertools_spark.operators.dedup import duplicate_substring_spans

    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {tuple(r) for r in duplicate_substring_spans(df, k=k).collect()}
    assert got == _brute_spans(docs, k)


@st.composite
def grouped_rows(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    return [
        (i, draw(st.sampled_from("xyz")), draw(st.integers(-9, 9)))
        for i in range(n)
    ]


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=grouped_rows(), k=st.integers(min_value=1, max_value=4))
def test_top_k_per_group_property(spark, rows, k):
    from seaexplorertools_spark.operators.sampling import top_k_per_group

    df = spark.createDataFrame(rows, "rid bigint, grp string, score bigint")
    got = {
        (r["grp"], r["rid"], r["cap_rank"])
        for r in top_k_per_group(
            df, ["grp"], [F.col("score").desc(), F.col("rid").asc()], k=k
        ).collect()
    }
    want = set()
    by_grp: dict[str, list[tuple[int, int]]] = {}
    for rid, grp, score in rows:
        by_grp.setdefault(grp, []).append((rid, score))
    for grp, members in by_grp.items():
        members.sort(key=lambda m: (-m[1], m[0]))
        for rank, (rid, _) in enumerate(members[:k], start=1):
            want.add((grp, rid, rank))
    assert got == want


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=corpus(), k=st.integers(min_value=2, max_value=5))
def test_cut_spans_property(spark, docs, k):
    """cut_spans equals the python replay of span removal on every random
    corpus: cleaned text, removed-char count, and pass-through docs."""
    from seaexplorertools_spark.operators.dedup import (
        cut_spans,
        duplicate_substring_spans,
    )

    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    spans = duplicate_substring_spans(df, k=k)
    got = {
        r["doc_id"]: (r["cleaned"], r["n_removed"])
        for r in cut_spans(df, spans).collect()
    }
    span_map: dict[int, list[tuple[int, int]]] = {}
    for d, s, e, _l in sorted(_brute_spans(docs, k)):
        span_map.setdefault(d, []).append((s, e))
    assert set(got) == {d for d, _ in docs}
    for doc_id, t in docs:
        expect = ""
        prev = 0
        for s, e in sorted(span_map.get(doc_id, [])):
            expect += t[prev : s - 1]
            prev = e
        expect += t[prev:]
        removed = sum(e - s + 1 for s, e in span_map.get(doc_id, []))
        assert got[doc_id] == (expect, removed)
