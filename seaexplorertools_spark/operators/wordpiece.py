"""WordPiece tokenization — greedy longest-match-first subword encode.

The third tokenizer surface (after the BPE trainer/encoder in
``operators/bpe.py`` and the regex token counters in
``operators/text.py``): BERT-family pipelines encode with a FIXED vocab
by repeatedly taking the LONGEST vocab piece that prefixes the
remaining word; continuation pieces are rendered with the ``##``
marker; a word with no match at some position becomes ``[UNK]``
wholesale (the standard WordPiece contract).

Two result-identical execution paths:

- :func:`wordpiece_encode` — pure JVM. The greedy scan is one
  ``F.aggregate`` over ``sequence(1, length(word))`` (each step consumes
  ≥1 char, so length(word) iterations always suffice); the
  longest-match probe is a bounded ``when`` chain over piece lengths
  ``max_len..1`` against a literal vocab array, so the whole encode
  stays inside whole-stage codegen — no Python, no shuffle, no UDF.
  Right when the vocab is contract-sized (the literal array is
  replicated into the plan).
- :func:`wordpiece_encode_arrow` — Arrow-batched ``mapInPandas`` with a
  dict-backed longest-match walk. The 30k-entry-vocab scale path: the
  vocab rides the closure as one broadcast-sized dict instead of a
  giant literal expression tree.

Reference parity: no tokenizer exists in the reference
(`/root/reference/seaexplorertools/process_adcp.py`); part of the
LLM-training surface the brief adds. Public algorithm: Wu et al. 2016
(GNMT), Devlin et al. 2018 (BERT).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.litarrays import string_array

# Default contract vocab: single chars a–y (no 'z', no digits — the
# planted-UNK classes) plus frequent multi-char pieces from the
# testdata's vocabulary. Shared verbatim by the DuckDB oracle.
DEFAULT_VOCAB: list[str] = list("abcdefghijklmnopqrstuvwxy") + [
    "spark", "table", "data", "key", "agg", "row",
    "ing", "er", "an", "in", "on", "at", "val", "ue", "ow",
]

UNK = "[UNK]"

_WORD_RE = "[a-z0-9]+"


def words_with_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Pre-tokenize: lowercase word extraction (``regexp_extract_all``,
    codegen) + ``posexplode`` → one row per (doc, word_idx, word),
    1-based word_idx."""
    words = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))), F.lit(_WORD_RE), 0
    )
    return df.select(
        F.col(id_col),
        F.posexplode(words).alias("pos0", "word"),
    ).select(
        id_col,
        (F.col("pos0") + 1).cast("long").alias("word_idx"),
        "word",
    )


def _longest_match_len(word: Column, pos: Column, vocab: list[str]) -> Column:
    """Length of the longest vocab piece matching ``word`` at 1-based
    ``pos`` (0 when none) — a when-chain over lengths max..1. The
    bounds guard matters: ``substr`` past the end silently shortens, so
    a k-probe must also require k chars to remain."""
    varr = string_array(vocab)
    remaining = F.length(word) - pos + 1
    out = F.lit(0)
    for k in sorted({len(p) for p in vocab}):
        probe = (remaining >= k) & F.array_contains(
            varr, word.substr(pos, F.lit(k))
        )
        out = F.when(probe, F.lit(k)).otherwise(out)
    return out


def wordpiece_pieces(word: Column, vocab: list[str] | None = None) -> Column:
    """Greedy WordPiece encode of one word → space-joined piece string
    with ``##`` continuation markers, or ``[UNK]``. Pure JVM: one
    ``aggregate`` scan, state = struct(pos, enc, failed)."""
    vocab = DEFAULT_VOCAB if vocab is None else vocab

    init = F.struct(
        F.lit(1).alias("pos"),
        F.lit("").alias("enc"),
        F.lit(False).alias("failed"),
    )

    def step(acc: Column, _i: Column) -> Column:
        pos = acc["pos"]
        active = ~acc["failed"] & (pos <= F.length(word))
        mlen = _longest_match_len(word, pos, vocab)
        piece = word.substr(pos, mlen)
        matched = F.struct(
            (pos + mlen).alias("pos"),
            F.concat(
                acc["enc"],
                F.when(pos == 1, F.lit("")).otherwise(F.lit(" ##")),
                piece,
            ).alias("enc"),
            F.lit(False).alias("failed"),
        )
        dead = F.struct(
            pos.alias("pos"), acc["enc"].alias("enc"),
            F.lit(True).alias("failed"),
        )
        return F.when(~active, acc).otherwise(
            F.when(mlen == 0, dead).otherwise(matched)
        )

    seq = F.sequence(F.lit(1), F.greatest(F.length(word), F.lit(1)))
    return F.aggregate(
        seq,
        init,
        step,
        lambda acc: F.when(acc["failed"], F.lit(UNK)).otherwise(acc["enc"]),
    )


def wordpiece_encode(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: list[str] | None = None,
    via_distinct: bool = True,
) -> DataFrame:
    """Document table → (doc_id, word_idx, word, encoded), fully
    JVM-side (see module docstring).

    ``via_distinct=True`` (default) DICTIONARY-ENCODES: the greedy scan
    runs once per DISTINCT word, then one equi-join fans the result
    back out. Natural text is Zipfian, so distinct words ≪ total words
    (testdata sf0.1: 33 distinct / 275k total — measured 8×+ faster;
    real corpora still see orders of magnitude) and AQE turns the join
    into a broadcast whenever the dictionary is small. Exactly
    result-identical to the direct path (pinned by tests).

    ``via_distinct=False`` is the zero-shuffle direct form — right when
    words are near-unique (ids, hashes) and the dedup would only add a
    shuffle."""
    w = words_with_index(df, text_col=text_col, id_col=id_col)
    if not via_distinct:
        return w.withColumn("encoded", wordpiece_pieces(F.col("word"), vocab))
    uniq = (
        w.select("word")
        .distinct()
        .withColumn("encoded", wordpiece_pieces(F.col("word"), vocab))
    )
    return w.join(uniq, "word").select(id_col, "word_idx", "word", "encoded")


def wordpiece_encode_arrow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: list[str] | None = None,
) -> DataFrame:
    """Scale path: same semantics, dict-backed greedy walk in an
    Arrow-batched ``mapInPandas`` (vocab in the task closure once, not
    per-expression). Result-identical to :func:`wordpiece_encode`
    (pinned by tests/test_wordpiece.py)."""
    vocab = DEFAULT_VOCAB if vocab is None else vocab
    vset = frozenset(vocab)
    max_len = max(len(p) for p in vset) if vset else 0
    from pyspark.sql.types import StringType, StructField, StructType

    w = words_with_index(df, text_col=text_col, id_col=id_col)
    # build a COPY — StructType.add mutates in place, corrupting w's
    # cached schema (its plan has no 'encoded' yet)
    schema = StructType(
        list(w.schema.fields) + [StructField("encoded", StringType())]
    )

    def enc(word: str) -> str:
        pos, out = 0, []
        n = len(word)
        while pos < n:
            k = min(max_len, n - pos)
            while k > 0 and word[pos : pos + k] not in vset:
                k -= 1
            if k == 0:
                return UNK
            out.append(word[pos : pos + k] if pos == 0 else "##" + word[pos : pos + k])
            pos += k
        return " ".join(out)

    def run(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["encoded"] = [enc(w_) for w_ in pdf["word"]]
            yield pdf

    return w.mapInPandas(run, schema)
