"""Unit tests for dedup operators — the LSH-bounded default path of
``ngram_jaccard_pairs`` and the exact-Jaccard verification stage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seaexplorertools_spark.operators.dedup import (
    jaccard_on_pairs,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
)

DOCS = [
    (1, "en", "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "en", "the quick brown fox jumps over the lazy dog near the river delta"),
    (3, "en", "completely different content about spark distributed aggregation"),
    (4, "de", "der schnelle braune fuchs springt ueber den faulen hund am fluss"),
    (5, "de", "der schnelle braune fuchs springt ueber den faulen hund am see"),
    (6, "en", "yet another unrelated document mentioning catalyst optimizer internals"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, lang string, text string")


def _true_jaccard(t1: str, t2: str) -> float:
    a, b = set(t1.split()), set(t2.split())
    return len(a & b) / len(a | b)


def test_lsh_default_finds_near_dups(docs):
    """Default (no block_col) routes candidates through MinHash-LSH; the
    near-identical pairs (1,2) and (4,5) must surface with their exact
    token-set Jaccard."""
    out = {(r["doc1"], r["doc2"]): r["jaccard"]
           for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert (1, 2) in out and (4, 5) in out
    texts = {d[0]: d[2] for d in DOCS}
    for (d1, d2), j in out.items():
        assert j == pytest.approx(_true_jaccard(texts[d1], texts[d2]), rel=1e-9)
        assert j >= 0.5


def test_lsh_default_pair_count_bounded(docs):
    """LSH-bounded pair generation never exceeds the band-collision set —
    unrelated docs do not pair up (the category-blocked variant would join
    every same-lang pair)."""
    cand = {(r["doc1"], r["doc2"]) for r in lsh_candidate_pairs(docs).collect()}
    out = {(r["doc1"], r["doc2"])
           for r in ngram_jaccard_pairs(docs, threshold=0.0).collect()}
    assert out <= cand
    assert (3, 6) not in out  # same lang, no shared shingles


def test_category_block_optin_matches_direct(docs):
    """block_col='lang' (opt-in) computes all same-block pairs over the
    threshold — exhaustive within block."""
    out = {(r["doc1"], r["doc2"]): r["jaccard"]
           for r in ngram_jaccard_pairs(docs, block_col="lang", threshold=0.5).collect()}
    texts = {d[0]: d[2] for d in DOCS}
    langs = {d[0]: d[1] for d in DOCS}
    want = {}
    ids = sorted(texts)
    for i in ids:
        for j in ids:
            if i < j and langs[i] == langs[j]:
                jac = _true_jaccard(texts[i], texts[j])
                if jac >= 0.5:
                    want[(i, j)] = jac
    assert set(out) == set(want)
    for k, v in want.items():
        assert out[k] == pytest.approx(v, rel=1e-9)


def test_jaccard_on_pairs_zero_overlap_kept(docs):
    """A supplied candidate pair with no shared tokens scores 0.0 (kept for
    the caller to threshold), not dropped."""
    pairs = docs.sparkSession.createDataFrame([(3, 6)], "doc1 long, doc2 long")
    rows = jaccard_on_pairs(docs, pairs).collect()
    assert len(rows) == 1
    assert rows[0]["jaccard"] == 0.0


def test_jaccard_prefix_join_equals_bruteforce(spark):
    """Prefix filtering must lose NOTHING: pairs and jaccard values equal
    the all-pairs python computation exactly (the AllPairs theorem)."""
    from seaexplorertools_spark.operators.dedup import jaccard_prefix_join

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "the quick brown fox leaps over the lazy dog"),
        (4, "completely different text about spark engines"),
        (5, "completely different text about spark planes"),
        (6, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (7, "one token"),
        (8, ""),  # empty: no tokens, must not appear
    ]
    t = 0.6
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id1"], r["id2"]): (r["inter"], r["uni"])
        for r in jaccard_prefix_join(df, threshold=t).collect()
    }
    sets = {i: set(s.split()) for i, s in docs if s.split()}
    want = {}
    ids = sorted(sets)
    for a in ids:
        for b in ids:
            if a < b:
                inter = len(sets[a] & sets[b])
                uni = len(sets[a] | sets[b])
                if inter >= t * uni:
                    want[(a, b)] = (inter, uni)
    assert got == want
    assert (1, 6) in got and got[(1, 6)][0] == got[(1, 6)][1]  # exact dup
    assert all(8 not in pair for pair in got)


def test_duplicate_substring_spans_planted(spark):
    """Planted repeats: a cross-doc duplicated sentence and a within-doc
    repeat are found with correct merged char ranges; short docs and
    unique text produce nothing."""
    from seaexplorertools_spark.operators.dedup import duplicate_substring_spans

    boiler = "this exact sentence is shared between two documents!"
    # boundary chars adjacent to the boiler DIFFER between the two docs,
    # so the maximal shared substring is exactly the boiler
    rows = [
        (1, "prefix_one." + boiler + ".suffix alpha"),
        (2, "other-intro," + boiler + ";different tail"),
        (3, "entirely singular content with no repetition whatsoever here"),
        (4, "tiny"),  # shorter than k -> excluded
        (5, "zq" + "repeat me twelve " * 2 + "yx"),  # within-doc repeat
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    k = 16
    got = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_len"])
        for r in duplicate_substring_spans(docs, k=k).collect()
    }
    assert 3 not in got and 4 not in got
    # brute-force ground truth: a position is covered iff its k-gram
    # occurs >= 2 times across the whole corpus (same doc or another)
    all_grams: dict[str, int] = {}
    for _, t in rows:
        for p in range(len(t) - k + 1):
            g = t[p : p + k]
            all_grams[g] = all_grams.get(g, 0) + 1
    for doc_id, t in rows:
        dup = [
            p + 1
            for p in range(len(t) - k + 1)
            if all_grams[t[p : p + k]] >= 2
        ]
        if not dup:
            assert doc_id not in got
            continue
        # merge the [p, p+k-1] intervals; the planted fixtures each
        # collapse to one span
        spans = []
        for p in dup:
            if spans and p <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], p + k - 1)
            else:
                spans.append([p, p + k - 1])
        assert len(spans) == 1
        assert got[doc_id] == (
            spans[0][0],
            spans[0][1],
            spans[0][1] - spans[0][0] + 1,
        )
    # the merged span covers the boiler in both docs that share it
    for doc_id in (1, 2):
        s = rows[doc_id - 1][1].index(boiler) + 1
        assert got[doc_id][0] <= s and got[doc_id][1] >= s + len(boiler) - 1


def test_duplicate_substring_spans_partition_invariance(spark, sf_dir):
    from seaexplorertools_spark.operators.dedup import duplicate_substring_spans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def key_set(df):
        return {tuple(r) for r in df.collect()}

    a = key_set(duplicate_substring_spans(docs, k=32))
    b = key_set(duplicate_substring_spans(docs.repartition(13), k=32))
    assert a and a == b


def test_cut_spans_roundtrip_and_passthrough(spark):
    """Cutting the reported spans removes exactly the duplicated ranges
    (python-replay ground truth); span-free and short docs pass through
    byte-identical with n_removed = 0."""
    from seaexplorertools_spark.operators.dedup import (
        cut_spans,
        duplicate_substring_spans,
    )

    boiler = "this exact sentence is shared between two documents!"
    rows = [
        (1, "prefix_one." + boiler + ".suffix alpha"),
        (2, "other-intro," + boiler + ";different tail"),
        (3, "entirely singular content with no repetition whatsoever here"),
        (4, "tiny"),
        (5, "zq" + "repeat me twelve " * 2 + "yx"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    k = 16
    spans = duplicate_substring_spans(docs, k=k)
    span_map: dict[int, list[tuple[int, int]]] = {}
    for r in spans.collect():
        span_map.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    got = {r["doc_id"]: (r["cleaned"], r["n_removed"]) for r in cut_spans(docs, spans).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    for doc_id, t in rows:
        cut = sorted(span_map.get(doc_id, []))
        expect = ""
        prev_end = 0
        for s, e in cut:
            expect += t[prev_end : s - 1]
            prev_end = e
        expect += t[prev_end:]
        removed = sum(e - s + 1 for s, e in cut)
        assert got[doc_id] == (expect, removed), doc_id
    assert got[3][1] == 0 and got[4][1] == 0
    assert boiler not in got[1][0] and boiler not in got[2][0]


def test_max_bucket_bounds_mega_bucket_pairs(spark):
    """Hot-bucket bound (round-7): a template-heavy corpus puts one
    (band, bsig) bucket into quadratic pair volume; max_bucket salts it
    into sub-buckets so volume is ~n·max_bucket/2, every emitted pair is
    a real band collision (subset of the unbounded set), and identical
    docs inside a sub-bucket are still found."""
    from seaexplorertools_spark.operators.dedup import lsh_cross_pairs

    template = "breaking news boilerplate header the site navigation footer terms"
    uniq = [
        (1000 + i, f"unique document number {i} with distinct words alpha{i} beta{i}")
        for i in range(10)
    ]
    docs = spark.createDataFrame(
        [(i, template) for i in range(300)] + uniq, "doc_id long, text string"
    )
    full = {(r["doc1"], r["doc2"]) for r in lsh_candidate_pairs(docs).collect()}
    assert len(full) >= 300 * 299 // 2  # the mega-bucket is quadratic today
    bounded = {
        (r["doc1"], r["doc2"])
        for r in lsh_candidate_pairs(docs, max_bucket=30).collect()
    }
    assert bounded <= full  # salting never invents collisions
    # nsub = ceil(300/30) = 10 -> ~10 sub-buckets of ~30 docs: C(30,2)*10
    # ≈ 4.4k pairs, an order of magnitude under C(300,2) = 44.8k
    assert 0 < len(bounded) < len(full) / 4
    # docs sharing a sub-bucket still pair up: every emitted pair of
    # template docs is a genuine duplicate candidate
    assert any(a < 300 and b < 300 for a, b in bounded)

    # cross variant: same bound, sub assignment agreed across sides
    new = spark.createDataFrame(
        [(10_000 + i, template) for i in range(60)], "doc_id long, text string"
    )
    cross_full = {
        (r["new_id"], r["corpus_id"]) for r in lsh_cross_pairs(new, docs).collect()
    }
    assert len(cross_full) >= 60 * 300
    cross_bounded = {
        (r["new_id"], r["corpus_id"])
        for r in lsh_cross_pairs(new, docs, max_bucket=30).collect()
    }
    assert cross_bounded <= cross_full
    assert 0 < len(cross_bounded) < len(cross_full) / 4


class TestBoilerplateLines:
    """frequent_lines / remove_boilerplate_lines (CCNet-style line-level
    boilerplate removal)."""

    def _docs(self, spark):
        rows = [
            (1, "alpha\nSubscribe now\nbody one"),
            (2, "  subscribe NOW \nbody two\n\ntail two"),
            (3, "SUBSCRIBE NOW\nbody three"),
            (4, "Subscribe now"),          # all-boilerplate doc
            (5, None),                      # NULL text survives as-is
            (6, "unique line\n\n"),         # blank lines exempt
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_frequent_lines_normalized_count(self, spark):
        from seaexplorertools_spark.operators.dedup import frequent_lines

        freq = {
            r["line_key"]: r["n_docs"]
            for r in frequent_lines(self._docs(spark), min_docs=3).collect()
        }
        # 'subscribe now' appears (normalized) in docs 1,2,3,4 — once ≥3
        assert freq == {"subscribe now": 4}

    def test_remove_preserves_order_and_originals(self, spark):
        from seaexplorertools_spark.operators.dedup import (
            remove_boilerplate_lines,
        )

        out = {
            r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
            for r in remove_boilerplate_lines(
                self._docs(spark), min_docs=3
            ).collect()
        }
        assert out[1] == ("alpha\nbody one", 2, 1)
        # blank line kept, original (un-normalized) lines preserved
        assert out[2] == ("body two\n\ntail two", 3, 1)
        assert out[3] == ("body three", 1, 1)
        # every line boilerplate → empty doc, still one output row
        assert out[4] == ("", 0, 1)
        # NULL text restored untouched
        assert out[5] == (None, 0, 0)
        # trailing blank lines exempt and kept
        assert out[6] == ("unique line\n\n", 3, 0)

    def test_precomputed_frequent_reuse(self, spark):
        from seaexplorertools_spark.operators.dedup import (
            frequent_lines,
            remove_boilerplate_lines,
        )

        corpus = self._docs(spark)
        freq = frequent_lines(corpus, min_docs=3)
        batch = spark.createDataFrame(
            [(99, "fresh content\nsubscribe now\nmore")],
            "doc_id long, text string",
        )
        out = remove_boilerplate_lines(batch, frequent=freq).collect()[0]
        assert out["clean_text"] == "fresh content\nmore"
        assert (out["n_kept"], out["n_removed"]) == (2, 1)
