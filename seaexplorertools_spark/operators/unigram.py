"""Unigram-LM tokenization — Viterbi best-segmentation subword encode.

Completes the tokenizer triad (BPE trainer/encoder in
``operators/bpe.py``, WordPiece greedy encode in
``operators/wordpiece.py``): SentencePiece-style pipelines (T5, LLaMA,
Gemma) encode with a FIXED vocab of scored pieces by picking the
segmentation that MAXIMIZES the sum of piece scores (Kudo 2018,
"Subword Regularization", §3 — inference is the Viterbi path). Scores
here are integer micro-nats so both execution paths and the DuckDB
oracle do exact integer arithmetic — no float DP divergence.

Tie-break (deterministic, part of the operator contract): among
score-maximal segmentations, prefer the LONGEST first piece, then
recursively for the remainder. At any word position all matching vocab
pieces are distinct lengths (a span is one string), so ``(score, k)``
max per DP cell is total-ordered and the backward Viterbi pass below
realizes exactly this rule; the oracle realizes it as
``ORDER BY score DESC, lenkey ASC`` over enumerated segmentations,
where ``lenkey`` encodes the piece-length sequence with longer-first
collation (the exchange argument for the equivalence is in
tests/test_unigram.py's docstring).

Execution paths (both result-identical, test-pinned):

- :func:`viterbi_pieces` — pure JVM. Backward DP over the word as ONE
  ``F.aggregate`` whose state is the DP array (immutable rebuild per
  step — words are short, the array is ≤ |word|+1 cells), then a
  forward reconstruction ``aggregate``. Candidate max per cell is
  ``array_max`` over ``struct(score, k)`` — Spark's struct ordering IS
  the tie-break. No Python, no UDF, no shuffle.
- :func:`unigram_encode_arrow` — Arrow-batched ``mapInPandas`` dict DP,
  the 30k-entry-vocab scale path (vocab rides the closure, not the
  expression tree).

A word with some position matching NO piece encodes as ``[UNK]``
wholesale (WordPiece-contract parity; cannot happen with the default
vocab, which covers every ``[a-z0-9]`` char — pinned in pytest with a
crippled vocab instead).

Reference parity: no tokenizer exists in the reference
(`/root/reference/seaexplorertools/process_adcp.py`); part of the
LLM-training surface the brief adds. Public algorithm: Kudo 2018;
Kudo & Richardson 2018 (SentencePiece).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .wordpiece import words_with_index

UNK = "[UNK]"

# Default contract vocab (piece -> integer micro-nat score, all < 0).
# Singles cover [a-z0-9] completely so every pre-tokenized word
# segments; multi-char pieces are testdata-frequent subwords scored so
# one piece always beats its spelled-out singles. 'ta'+'ble' and
# 'tab'+'le' tie EXACTLY at -5_100_000 on the corpus word 'table' — the
# planted tie-break branch (longest first piece wins: 'tab le').
_SINGLES: dict[str, int] = {
    c: -(2_000_000 + 1_000 * i)
    for i, c in enumerate("abcdefghijklmnopqrstuvwxyz0123456789")
}
_MULTI: dict[str, int] = {
    "spark": -2_450_000,
    "sp": -2_510_000,
    "par": -2_520_000,
    "ark": -2_530_000,
    "ta": -2_500_000,
    "ble": -2_600_000,
    "tab": -2_550_000,
    "le": -2_550_000,
    "the": -2_430_000,
    "scan": -2_460_000,
    "join": -2_470_000,
    "data": -2_440_000,
    "batch": -2_455_000,
    "at": -2_540_000,
    "ch": -2_560_000,
    "er": -2_570_000,
    "row": -2_480_000,
    "key": -2_490_000,
    "ord": -2_575_000,
    "ing": -2_465_000,
}
DEFAULT_VOCAB: dict[str, int] = {**_SINGLES, **_MULTI}


def viterbi_pieces(word: Column, vocab: dict[str, int] | None = None) -> Column:
    """Viterbi encode of one word → space-joined piece string (or
    ``[UNK]``), entirely in Column expressions (see module docstring).

    Backward DP: ``best[i]`` = (max suffix score from 1-based char
    position ``i+1``, chosen piece length). Cell ``L`` seeds at
    ``(0, 0)``; unreachable cells stay NULL-scored and null-propagate
    through the candidate sums."""
    vocab = DEFAULT_VOCAB if vocab is None else vocab
    if not vocab:
        return F.lit(UNK)
    score_map = F.create_map(
        *[F.lit(x) for kv in vocab.items() for x in (kv[0], kv[1])]
    )
    max_len = max(len(p) for p in vocab)
    L = F.length(word)

    # state[j] (1-based j = position j-1): struct(score bigint, k int)
    init = F.transform(
        F.sequence(F.lit(0), L),
        lambda pos: F.when(
            pos == L,
            F.struct(
                F.lit(0).cast("bigint").alias("score"), F.lit(0).alias("k")
            ),
        ).otherwise(
            F.struct(
                F.lit(None).cast("bigint").alias("score"), F.lit(0).alias("k")
            )
        ),
    )

    def dp_step(state: Column, i: Column) -> Column:
        # candidates k = 1..max_len at 0-based position i
        cands = F.array(
            *[
                F.struct(
                    (
                        F.when(
                            i + k <= L,
                            F.try_element_at(
                                score_map, word.substr(i + 1, F.lit(k))
                            )
                            + F.element_at(state, i + k + 1)["score"],
                        )
                    )
                    .cast("bigint")
                    .alias("score"),
                    F.lit(k).alias("k"),
                )
                for k in range(1, max_len + 1)
            ]
        )
        live = F.filter(cands, lambda c: c["score"].isNotNull())
        best = F.array_max(live)  # struct order = (score, k) = tie-break
        return F.transform(
            state,
            lambda s, j: F.when(
                (j == i) & best.isNotNull(), best
            ).otherwise(s),
        )

    dp = F.aggregate(F.sequence(L - 1, F.lit(0), F.lit(-1)), init, dp_step)

    # forward reconstruction: follow the chosen k from position 0
    def walk(acc: Column, _i: Column) -> Column:
        pos = acc["pos"]
        k = F.element_at(dp, pos + 1)["k"]
        piece = word.substr(pos + 1, k)
        return F.when(
            pos >= L,
            acc,
        ).otherwise(
            F.struct(
                (pos + k).alias("pos"),
                F.concat(
                    acc["enc"],
                    F.when(pos == 0, F.lit("")).otherwise(F.lit(" ")),
                    piece,
                ).alias("enc"),
            )
        )

    init_walk = F.struct(F.lit(0).alias("pos"), F.lit("").alias("enc"))
    out = F.aggregate(
        F.sequence(F.lit(1), F.greatest(L, F.lit(1))),
        init_walk,
        walk,
        lambda acc: acc["enc"],
    )
    return F.when(
        F.element_at(dp, F.lit(1))["score"].isNull(), F.lit(UNK)
    ).otherwise(out)


def unigram_encode(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: dict[str, int] | None = None,
    via_distinct: bool = True,
) -> DataFrame:
    """Document table → (doc_id, word_idx, word, encoded), fully
    JVM-side. ``via_distinct=True`` dictionary-encodes exactly like
    ``wordpiece_encode``: the Viterbi DP runs once per DISTINCT word
    (Zipfian text ⇒ distinct ≪ total) and one AQE-broadcastable
    equi-join fans results back; ``False`` is the zero-shuffle direct
    form for near-unique-word inputs."""
    w = words_with_index(df, text_col=text_col, id_col=id_col)
    if not via_distinct:
        return w.withColumn("encoded", viterbi_pieces(F.col("word"), vocab))
    uniq = (
        w.select("word")
        .distinct()
        .withColumn("encoded", viterbi_pieces(F.col("word"), vocab))
    )
    return w.join(uniq, "word").select(id_col, "word_idx", "word", "encoded")


def _viterbi_py(word: str, vocab: dict[str, int], max_len: int) -> str:
    """Dict-backed Viterbi — the Arrow twin's inner DP (and the
    cross-check used by tests)."""
    n = len(word)
    best: list[tuple[int, int] | None] = [None] * (n + 1)
    best[n] = (0, 0)
    for i in range(n - 1, -1, -1):
        top: tuple[int, int] | None = None
        for k in range(1, min(max_len, n - i) + 1):
            sc = vocab.get(word[i : i + k])
            nxt = best[i + k]
            if sc is None or nxt is None:
                continue
            cand = (sc + nxt[0], k)
            if top is None or cand > top:
                top = cand
        if top is not None:
            best[i] = top
    if best[0] is None:
        return UNK
    pos, out = 0, []
    while pos < n:
        k = best[pos][1]
        out.append(word[pos : pos + k])
        pos += k
    return " ".join(out)


def unigram_encode_arrow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: dict[str, int] | None = None,
) -> DataFrame:
    """Scale path: same semantics via Arrow-batched ``mapInPandas``
    (vocab in the task closure once). Result-identical to
    :func:`unigram_encode` (pinned by tests/test_unigram.py)."""
    vocab = DEFAULT_VOCAB if vocab is None else vocab
    max_len = max((len(p) for p in vocab), default=0)
    from pyspark.sql.types import StringType, StructField, StructType

    w = words_with_index(df, text_col=text_col, id_col=id_col)
    schema = StructType(
        list(w.schema.fields) + [StructField("encoded", StringType())]
    )

    def run(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["encoded"] = [
                _viterbi_py(w_, vocab, max_len) for w_ in pdf["word"]
            ]
            yield pdf

    return w.mapInPandas(run, schema)
