"""Distributed BPE merge learning vs an in-memory reference implementation.

The trainer's claim is exact classic-BPE semantics at merges_per_round=1
(same pair priority, same greedy leftmost merge), so the test is an exact
merge-sequence match against a ~30-line pure-python Sennrich BPE. Batched
rounds and both encode paths are pinned by equivalence/monotonicity
properties.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from seaexplorertools_spark.operators.bpe import (
    END_MARK,
    bpe_encode,
    merge_table,
    train_bpe,
    word_counts,
)

CORPUS = [
    "the lowest low lower newer newest",
    "wide wider widest the low lower",
    "new newer newest news the the",
    "low low low lowest wider wide",
    "the newest newer new lowest news",
]


def _ref_word_counts(texts: list[str]) -> dict[str, int]:
    c: Counter = Counter()
    for t in texts:
        for w in re.split(r"\s+", t):
            if w:
                c[w] += 1
    return dict(c)


def _ref_train(wc: dict[str, int], n_merges: int, min_count: int = 2):
    """Pure-python classic BPE: priority (count desc, pair lexicographic),
    greedy leftmost non-overlapping merge."""
    vocab = {w: list(w) + [END_MARK] for w in wc}
    merges = []
    for step in range(n_merges):
        pc: Counter = Counter()
        for w, c in wc.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        cand = [(p, c) for p, c in pc.items() if c >= min_count]
        if not cand:
            break
        (a, b), c = sorted(cand, key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((step, a, b, c))
        for w in vocab:
            syms, out = vocab[w], []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            vocab[w] = out
    return merges, vocab


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_train_matches_reference_exactly(spark):
    got = train_bpe(_docs(spark), n_merges=12, merges_per_round=1)
    want, _ = _ref_train(_ref_word_counts(CORPUS), 12)
    assert got == want


def test_word_counts_match_reference(spark):
    got = {r["word"]: r["wcount"] for r in word_counts(_docs(spark)).collect()}
    assert got == _ref_word_counts(CORPUS)


def test_batched_rounds_first_rule_and_monotone_compression(spark):
    docs = _docs(spark)
    seq = train_bpe(docs, n_merges=6, merges_per_round=1)
    bat = train_bpe(docs, n_merges=6, merges_per_round=3)
    # highest-priority rule is round-size-invariant
    assert bat[0][1:] == seq[0][1:]
    # more merges never inflate the token count
    n0 = bpe_encode(docs, seq[:2]).agg(F.sum("n_tokens")).first()[0]
    n1 = bpe_encode(docs, seq).agg(F.sum("n_tokens")).first()[0]
    assert n1 <= n0


def test_encode_expr_and_pandas_paths_identical(spark):
    docs = _docs(spark)
    merges = train_bpe(docs, n_merges=10)
    a = bpe_encode(docs, merges, expr_max_rules=64).orderBy("doc_id").collect()
    b = bpe_encode(docs, merges, expr_max_rules=0).orderBy("doc_id").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_encode_matches_reference_vocab(spark):
    docs = _docs(spark)
    merges = train_bpe(docs, n_merges=12)
    _, vocab = _ref_train(_ref_word_counts(CORPUS), 12)
    enc = {r["doc_id"]: r["tokens"] for r in bpe_encode(docs, merges).collect()}
    for i, text in enumerate(CORPUS):
        want = [s for w in re.split(r"\s+", text) if w for s in vocab[w]]
        assert enc[i] == want


def test_merge_table_roundtrip(spark):
    merges = train_bpe(_docs(spark), n_merges=5)
    mt = merge_table(spark, merges).orderBy("step").collect()
    assert [(r["step"], r["left"], r["right"], r["pair_count"]) for r in mt] == merges
    assert all(r["merged"] == r["left"] + r["right"] for r in mt)
