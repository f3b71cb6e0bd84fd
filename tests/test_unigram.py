"""Unigram-LM Viterbi encode (operators/unigram.py).

Tie-break equivalence argument (referenced from the module docstring):
the DP at position i picks, among candidates maximizing
``score(p) + best[i+|p|]``, the longest p (``array_max`` over
``struct(score, k)``). Any score-maximal segmentation must start with
such a candidate (otherwise its total is sub-maximal), and candidates
at one position are pairwise distinct lengths, so "longest first piece,
then recurse" totally orders the score-maximal set; induction over
suffixes gives that the DP's reconstruction equals the lexicographic
maximum of the piece-length sequence among score-maximal segmentations
— exactly the oracle's ``ORDER BY score DESC, lenkey ASC`` with
longer-first collation."""

import itertools

from pyspark.sql import functions as F

from seaexplorertools_spark.operators.unigram import (
    DEFAULT_VOCAB,
    UNK,
    _viterbi_py,
    unigram_encode,
    unigram_encode_arrow,
    viterbi_pieces,
)

MAXLEN = max(len(p) for p in DEFAULT_VOCAB)


def brute_best(word, vocab):
    """Enumerate ALL segmentations; pick max (score, length-seq) with
    longer-first preference — the contract, independently restated."""
    n = len(word)
    best = None
    # compositions of n via cut-point subsets (words here are short)
    for bits in itertools.product([0, 1], repeat=n - 1):
        cuts = [0] + [i + 1 for i, b in enumerate(bits) if b] + [n]
        pieces = [word[a:b] for a, b in zip(cuts, cuts[1:])]
        if any(p not in vocab for p in pieces):
            continue
        score = sum(vocab[p] for p in pieces)
        key = (score, tuple(len(p) for p in pieces))  # longer-first =
        # lexicographically larger length tuple at equal score
        if best is None or key > best[0]:
            best = (key, " ".join(pieces))
    return UNK if best is None else best[1]


def test_python_dp_matches_bruteforce():
    words = [
        "table", "spark", "sparkle", "batch", "data", "order",
        "scanning", "thekey", "a", "z", "42", "parka", "tableau",
    ]
    for w in words:
        assert _viterbi_py(w, DEFAULT_VOCAB, MAXLEN) == brute_best(
            w, DEFAULT_VOCAB
        ), w


def test_planted_tie_prefers_longer_first_piece():
    # 'ta'+'ble' and 'tab'+'le' tie at -5_100_000 exactly
    v = DEFAULT_VOCAB
    assert v["ta"] + v["ble"] == v["tab"] + v["le"]
    assert _viterbi_py("table", v, MAXLEN) == "tab le"


def test_unk_wholesale_with_crippled_vocab():
    v = {"a": -1, "b": -2}  # no 'c'
    assert _viterbi_py("abc", v, 1) == UNK
    assert _viterbi_py("aba", v, 1) == "a b a"


def test_jvm_matches_python_twin(spark):
    words = [
        "table", "spark", "sparkle", "batch", "data", "order", "scanning",
        "thekey", "parka", "tableau", "windowing", "merge", "filter",
        "0filter9", "aaaa", "zzzz",
    ]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: r["enc"]
        for r in df.select(
            "word", viterbi_pieces(F.col("word")).alias("enc")
        ).collect()
    }
    for w in words:
        assert got[w] == _viterbi_py(w, DEFAULT_VOCAB, MAXLEN), w


def test_jvm_unk_branch(spark):
    v = {"a": -1, "b": -2}
    df = spark.createDataFrame([("abc",), ("aba",)], "word string")
    got = {
        r["word"]: r["enc"]
        for r in df.select(
            "word", viterbi_pieces(F.col("word"), v).alias("enc")
        ).collect()
    }
    assert got == {"abc": UNK, "aba": "a b a"}


def test_encode_paths_identical(spark):
    docs = spark.createDataFrame(
        [(1, "the spark table batch"), (2, "data order 77 scanning"), (3, None)],
        "doc_id long, text string",
    )
    a = unigram_encode(docs, via_distinct=True)
    b = unigram_encode(docs, via_distinct=False)
    c = unigram_encode_arrow(docs)
    key = ["doc_id", "word_idx"]
    ra = sorted(tuple(r) for r in a.select(*key, "word", "encoded").collect())
    rb = sorted(tuple(r) for r in b.select(*key, "word", "encoded").collect())
    rc = sorted(tuple(r) for r in c.select(*key, "word", "encoded").collect())
    assert ra == rb == rc
    assert len(ra) == 8  # NULL-text doc contributes no words
