"""Denoising-objective data prep — T5/UL2-style span corruption.

Encoder-decoder pretraining (Raffel et al. 2020, "Exploring the Limits
of Transfer Learning"; Tay et al. 2022 UL2) turns raw text into
(input, target) pairs by masking token SPANS with sentinels::

    tokens:  t0 t1 t2 t3 t4 t5 t6 t7 t8 ...
    input:   <extra_id_0> t2 t3 t4 t5 t6 <extra_id_1> t9 ...
    target:  <extra_id_0> t0 t1 <extra_id_1> t7 t8 ...

This implements the DETERMINISTIC-stride variant (a span of
``span_len`` tokens every ``every`` tokens): production pipelines
seed-randomize span starts, but the map is the same — and the
deterministic rule is what makes the lane exactly oracle-able, the
same trade the sampling lanes made (A-ES/reservoir use seeded hashes
for the identical reason).

Everything is JVM higher-order functions on the token array —
``transform`` with index builds the per-token rendering for both
sides, ``array_join`` (NULL-skipping) reassembles — zero shuffle, no
Python, no explode (the doc count, not the token count, is the row
count).

Reference parity: none (LLM-pretraining surface the brief adds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def span_corrupt(
    df: DataFrame,
    text_col: str = "text",
    every: int = 7,
    span_len: int = 2,
) -> DataFrame:
    """Add (n_tokens, n_masked, input, target) span-corruption columns.
    Tokens are whitespace runs; token index i is masked when
    ``i % every < span_len``; sentinel k covers the span starting at
    ``i = k * every``. Requires span_len < every."""
    if not 0 < span_len < every:
        raise ValueError("span_corrupt: need 0 < span_len < every")
    toks = F.regexp_extract_all(
        F.coalesce(F.col(text_col), F.lit("")), F.lit(r"\S+"), 0
    )
    sentinel = lambda i: F.concat(  # noqa: E731
        F.lit("<extra_id_"), (i / every).cast("int").cast("string"), F.lit(">")
    )
    inp = F.array_join(
        F.transform(
            toks,
            lambda t, i: F.when(i % every == 0, sentinel(i))
            .when(i % every < span_len, F.lit(None))
            .otherwise(t),
        ),
        " ",
    )
    tgt = F.array_join(
        F.transform(
            toks,
            lambda t, i: F.when(
                i % every == 0, F.concat(sentinel(i), F.lit(" "), t)
            )
            .when(i % every < span_len, t)
            .otherwise(F.lit(None)),
        ),
        " ",
    )
    n = F.size(toks)
    # full spans plus a possible ragged tail span
    n_masked = F.aggregate(
        F.transform(
            toks,
            lambda _t, i: F.when(i % every < span_len, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return df.select(
        "*",
        n.cast("long").alias("n_tokens"),
        n_masked.cast("long").alias("n_masked"),
        inp.alias("input"),
        tgt.alias("target"),
    )


def fim_transform(
    df: DataFrame,
    text_col: str = "text",
    mode: str = "psm",
    lo: float = 1 / 3,
    hi: float = 2 / 3,
) -> DataFrame:
    """Fill-in-the-middle transform (Bavarian et al. 2022, "Efficient
    Training of Language Models to Fill in the Middle") — the code-
    pretraining objective: split the document at two cut points into
    (prefix, middle, suffix) and rejoin with sentinels in PSM
    (``<PRE> p <SUF> s <MID> m``) or SPM (``<SUF> s <PRE> p <MID> m``)
    order. Deterministic character-fraction cuts (production randomizes
    them; the fraction rule keeps the lane exactly oracle-able — the
    span_corrupt trade). Pure codegen ``substring`` arithmetic, zero
    shuffle; adds (n_prefix, n_middle, n_suffix, fim)."""
    if mode not in ("psm", "spm"):
        raise ValueError("fim_transform: mode must be 'psm' or 'spm'")
    t = F.coalesce(F.col(text_col), F.lit(""))
    n = F.length(t)
    c1 = F.floor(n * F.lit(lo)).cast("int")
    c2 = F.floor(n * F.lit(hi)).cast("int")
    prefix = t.substr(F.lit(1), c1)
    middle = t.substr(c1 + 1, c2 - c1)
    suffix = t.substr(c2 + 1, n - c2)
    psm = F.concat(
        F.lit("<PRE>"), prefix, F.lit("<SUF>"), suffix, F.lit("<MID>"), middle
    )
    spm = F.concat(
        F.lit("<SUF>"), suffix, F.lit("<PRE>"), prefix, F.lit("<MID>"), middle
    )
    return df.select(
        "*",
        c1.cast("long").alias("n_prefix"),
        (c2 - c1).cast("long").alias("n_middle"),
        (n - c2).cast("long").alias("n_suffix"),
        (psm if mode == "psm" else spm).alias("fim"),
    )
