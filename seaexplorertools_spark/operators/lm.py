"""N-gram language-model scoring — CCNet-style perplexity filtering for
training corpora (engine addition; the reference has no text ops).

The classic corpus-quality gate: train a small n-gram LM on (a sample of)
the corpus, score every document by cross-entropy under that LM, and drop
the tails (gibberish scores high, boilerplate scores low). Here both the
training counts and the scoring pass are single Spark aggregates:

- token/bigram extraction stays JVM-side (``transform`` over the split
  array — no Python, no explode-then-self-join for adjacency);
- the model IS two count tables (unigram, bigram) + add-one smoothing:
  p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V);
- scoring joins each document's bigrams to the count tables. Model tables
  are vocabulary-sized — tiny next to the corpus — so both joins
  broadcast: the scoring pass is map-side, one shuffle for the final
  per-doc average.

100 TB posture: training counts are two map-side-combined aggregates
(shuffle = |vocab| and |bigram vocab| rows, not corpus rows). At real
vocabulary sizes the bigram table may exceed broadcast limits — then the
join degrades gracefully to a shuffled hash join on ``w1, w2``; the
per-doc average still shuffles only one row per document. In production
the LM is trained once on a fixed sample and reused as a static dim
table; the end-to-end query here retrains per call only so the oracle can
reproduce it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import tokens


def doc_bigrams(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per in-document adjacent token pair (w1, w2), order
    preserved, built JVM-side: slice + transform over the token array,
    then a single explode. Documents with < 2 tokens emit nothing."""
    toks = tokens(F.col(text_col))
    pairs = F.expr(
        "transform(slice(__toks, 1, greatest(size(__toks) - 1, 0)), "
        "(t, i) -> struct(t AS w1, __toks[i + 1] AS w2))"
    )
    return (
        docs.withColumn("__toks", toks)
        .select(id_col, F.explode(pairs).alias("__bg"))
        .select(id_col, F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))
    )


def train_bigram_lm(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """Corpus bigram LM as two count tables plus the vocabulary size.

    Returns (unigram_counts[w1, c1], bigram_counts[w1, w2, c12], V).
    Both aggregates are map-side combined; V is a driver-side scalar
    (one number — the J5 scalar-broadcast pattern)."""
    tok_rows = docs.select(
        F.explode(tokens(F.col(text_col))).alias("w1")
    )
    uni = tok_rows.groupBy("w1").agg(F.count("*").alias("c1"))
    big = (
        doc_bigrams(docs, id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
    )
    vocab_size = uni.count()
    return uni, big, vocab_size


def neg_log_prob(c12: Column, c1: Column, vocab_size: int) -> Column:
    """-ln p(w2|w1) with add-one smoothing over a vocabulary of size V."""
    p = (c12 + F.lit(1.0)) / (c1 + F.lit(float(vocab_size)))
    return -F.log(p)


def score_cross_entropy(
    docs: DataFrame,
    uni: DataFrame,
    big: DataFrame,
    vocab_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document cross-entropy (mean -ln p(w2|w1)) under the bigram LM.

    Output: (id_col, n_bigrams, xent). Documents with < 2 tokens have no
    bigrams and are absent (they carry no LM evidence; filter them with a
    length gate upstream). Model tables broadcast — scoring is map-side."""
    bg = doc_bigrams(docs, id_col, text_col)
    joined = bg.join(F.broadcast(big), ["w1", "w2"], "inner").join(
        F.broadcast(uni), ["w1"], "inner"
    )
    return joined.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.avg(neg_log_prob(F.col("c12"), F.col("c1"), vocab_size)).alias("xent"),
    )


def perplexity_filter(
    docs: DataFrame,
    max_ppl: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """End-to-end corpus-quality gate: train on the corpus, score it, keep
    documents with perplexity exp(xent) <= ``max_ppl``. Composes the
    pieces above into one DAG (counts are computed once; Spark reuses the
    aggregated exchanges across the two broadcast joins)."""
    uni, big, vocab = train_bigram_lm(docs, id_col, text_col)
    scored = score_cross_entropy(docs, uni, big, vocab, id_col, text_col)
    keep = scored.filter(F.exp(F.col("xent")) <= F.lit(float(max_ppl)))
    return docs.join(keep.select(id_col), id_col, "inner")


def train_kn_bigram(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Interpolated Kneser–Ney bigram model (Kneser & Ney 1995; Chen &
    Goodman 1999 — the smoothing KenLM uses, i.e. what CCNet-style
    perplexity gates actually run) as four count tables:

    - ``bc  (w1, w2, c12)``      — bigram counts;
    - ``ctx (w1, c1, n_follow)`` — context totals Σ_w2 c12 and distinct
      continuation counts N1+(w1, ·);
    - ``cont(w2, n_prec)``       — distinct left-context counts
      N1+(·, w2) (the Kneser–Ney continuation numerator);
    - ``scalars`` (single row)   — ``n_types`` = N1+(··), ``n1``/``n2``
      = bigram types seen once/twice, and the absolute discount
      ``D = n1 / (n1 + 2·n2)`` (the Ney–Essen–Kneser estimate;
      falls back to 0.75 if the corpus has no singletons/doubletons).

    Everything is map-side-combined aggregates over the bigram table —
    shuffle volume is |bigram vocab| rows, never corpus rows — and the
    scalars row is one global aggregate (J5 scalar-broadcast shape)."""
    bg = doc_bigrams(docs, id_col, text_col)
    bc = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    ctx = bc.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count("*").alias("n_follow")
    )
    cont = bc.groupBy("w2").agg(F.count("*").alias("n_prec"))
    scalars = bc.agg(
        F.count("*").alias("n_types"),
        F.sum((F.col("c12") == 1).cast("long")).alias("n1"),
        F.sum((F.col("c12") == 2).cast("long")).alias("n2"),
    ).withColumn(
        "d",
        F.when(
            F.col("n1") + 2 * F.col("n2") > 0,
            F.col("n1").cast("double") / (F.col("n1") + 2 * F.col("n2")),
        ).otherwise(F.lit(0.75)),
    )
    return bc, ctx, cont, scalars


def score_cross_entropy_kn(
    docs: DataFrame,
    bc: DataFrame,
    ctx: DataFrame,
    cont: DataFrame,
    scalars: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document cross-entropy (mean -ln p) under interpolated
    Kneser–Ney:

        p(w2|w1) = max(c12 - D, 0)/c1  +  (D·N1+(w1,·)/c1) · pcont(w2)
        pcont(w2) = N1+(·,w2) / N1+(··)

    Output (id_col, n_bigrams, xent). Scoring the training corpus, so
    every bigram joins (c12 ≥ 1, c1 ≥ 1) and the interpolation weight
    keeps p > 0 — no OOV floor needed; for held-out scoring add a
    backoff-to-pcont join on the misses. Model tables are vocab-sized:
    all three joins broadcast, the scalars row cross-joins broadcast,
    and the only doc-keyed shuffle is the final per-doc average."""
    bg = doc_bigrams(docs, id_col, text_col)
    joined = (
        bg.join(F.broadcast(bc), ["w1", "w2"], "inner")
        .join(F.broadcast(ctx), ["w1"], "inner")
        .join(F.broadcast(cont), ["w2"], "inner")
        .crossJoin(F.broadcast(scalars))
    )
    d, c1 = F.col("d"), F.col("c1")
    p = F.greatest(F.col("c12") - d, F.lit(0.0)) / c1 + d * F.col(
        "n_follow"
    ) / c1 * (F.col("n_prec") / F.col("n_types"))
    return joined.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.avg(-F.log(p)).alias("xent"),
    )
