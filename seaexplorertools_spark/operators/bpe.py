"""Distributed BPE tokenizer training — learn merge rules from a corpus.

A training-data pipeline that counts tokens wants the tokenizer itself to
be trainable in-engine. This module implements byte-pair-encoding merge
learning (Sennrich et al. 2016, ACL — public algorithm) the Spark way:

- **Train on the weighted distinct-word table, not the corpus.** The
  classic trick: one pass collapses the corpus to ``(word, count)``
  (aggregate, map-side combined), and every subsequent iteration touches
  only |distinct words| rows. At 100 TB of text the vocabulary table is
  orders of magnitude smaller than the corpus and SKEW-FREE (a word is one
  row no matter how often it occurs — frequency is a weight column).
- **Pair counting is pure JVM expression work**: adjacent symbol pairs via
  ``arrays_zip(slice, slice)`` + explode, weighted sum — no Python in the
  loop.
- **Merging is an ``F.aggregate`` left-to-right scan** over each word's
  symbol array — the exact greedy leftmost-non-overlapping semantics of
  reference BPE implementations, in whole-stage codegen, no UDF.
- **Rounds are bounded**: per round the driver collects only the top pair
  candidates (tiny) and greedily selects up to ``merges_per_round``
  SYMBOL-DISJOINT pairs to merge in a single scan. Disjointness makes the
  batched round order-independent, so ``merges_per_round=1`` reproduces
  classic BPE exactly (pinned against a pure-python reference in
  ``tests/test_bpe.py``) while larger values amortize Spark jobs when
  learning thousands of merges — the standard distributed-BPE compromise.
- The per-round driver payload is the merge list (``merges_per_round``
  rows); lineage is truncated with ``localCheckpoint`` every few rounds so
  the iterated plan never deepens unboundedly (same discipline as
  ``operators/clustering.py``).

Determinism: pair priority is (count DESC, left ASC, right ASC) — a total
order, so training is reproducible across partitionings and engines.

Encoding with the learned rules (``bpe_encode``) replays the same
``F.aggregate`` scan once per merge rule; for long rule lists it switches
to an Arrow-batched ``mapInPandas`` replay (expression-tree depth is the
constraint, not semantics — both paths produce identical tokens and the
equivalence is tested).

Reference scope: the reference engine has no tokenizer training; this is
part of the LLM-pipeline surface (SURVEY §6) alongside token counting
(`operators/text.py::bpe_ish_token_count`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END_MARK = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → weighted vocabulary: ``(word, wcount)``. Uses the engine's
    shared token definition (lowercased alnum runs, operators/dedup.py) so
    learned merges compose with every other text operator."""
    from .dedup import tokens

    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wcount"))
    )


def _to_symbols(word: Column) -> Column:
    """word → initial symbol array: characters + end-of-word marker (the
    Sennrich convention; the marker lets merges learn word-final units)."""
    return F.concat(F.split(word, ""), F.array(F.lit(END_MARK)))


def _merge_scan(syms: Column, pairs: list[tuple[str, str]]) -> Column:
    """One greedy left-to-right pass replacing adjacent symbol pairs with
    their concatenation. ``pairs`` must be symbol-disjoint; the scan is a
    single JVM ``aggregate`` — no Python, no shuffle."""
    acc0 = F.array().cast("array<string>")

    def step(acc: Column, s: Column) -> Column:
        last = F.element_at(acc, -1)
        match = F.lit(False)
        for a, b in pairs:
            match = match | ((last == F.lit(a)) & (s == F.lit(b)))
        merged = F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(last, s)))
        return F.when((F.size(acc) > 0) & match, merged).otherwise(
            F.concat(acc, F.array(s))
        )

    return F.aggregate(syms, acc0, step)


def pair_counts(words: DataFrame, syms_col: str = "syms") -> DataFrame:
    """Weighted adjacent-pair counts over the symbolized vocabulary:
    ``(left, right, pair_count)``. slice+zip+explode keeps it in codegen;
    the groupBy shuffles at most |distinct pairs| rows after map-side
    combine."""
    s = F.col(syms_col)
    zipped = F.arrays_zip(
        F.slice(s, 1, F.size(s) - 1).alias("l"),
        F.slice(s, 2, F.size(s) - 1).alias("r"),
    )
    return (
        words.where(F.size(s) >= 2)
        .select(F.explode(zipped).alias("p"), "wcount")
        .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
        .agg(F.sum("wcount").alias("pair_count"))
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 32,
    text_col: str = "text",
    merges_per_round: int = 1,
    min_count: int = 2,
    checkpoint_every: int = 4,
) -> list[tuple[int, str, str, int]]:
    """Learn up to ``n_merges`` BPE merge rules; returns
    ``[(step, left, right, pair_count), ...]`` in application order.

    Per round: one distributed pair-count job, a driver collect of the top
    ``4 * merges_per_round`` candidates (bounded, tiny), greedy selection
    of symbol-disjoint winners, and one scan-merge transformation. Stops
    early when no pair reaches ``min_count``."""
    words = word_counts(docs, text_col).select(
        _to_symbols(F.col("word")).alias("syms"), "wcount"
    )
    words = words.localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    rounds_since_ckpt = 0
    while len(merges) < n_merges:
        want = min(merges_per_round, n_merges - len(merges))
        top = (
            pair_counts(words)
            .where(F.col("pair_count") >= min_count)
            .orderBy(F.col("pair_count").desc(), "left", "right")
            .limit(4 * want)
            .collect()
        )
        used: set[str] = set()
        chosen: list[tuple[str, str, int]] = []
        for r in top:
            a, b = r["left"], r["right"]
            # symbol-disjoint within the round -> batched scan == sequential
            if len(chosen) < want and not {a, b, a + b} & used:
                chosen.append((a, b, r["pair_count"]))
                used |= {a, b, a + b}
        if not chosen:
            break
        for a, b, c in chosen:
            merges.append((len(merges), a, b, c))
        words = words.withColumn(
            "syms", _merge_scan(F.col("syms"), [(a, b) for a, b, _ in chosen])
        )
        rounds_since_ckpt += 1
        if rounds_since_ckpt >= checkpoint_every:
            words = words.localCheckpoint(eager=True)
            rounds_since_ckpt = 0
    return merges


def merge_table(spark, merges: list[tuple[int, str, str, int]]) -> DataFrame:
    """Learned rules as a DataFrame ``(step, left, right, merged,
    pair_count)`` — the artifact a pipeline persists next to the corpus."""
    rows = [(s, a, b, a + b, c) for s, a, b, c in merges]
    return spark.createDataFrame(
        rows, "step int, left string, right string, merged string, pair_count bigint"
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    expr_max_rules: int = 24,
) -> DataFrame:
    """Tokenize with learned rules: ``(id_col, n_tokens, tokens)`` where
    tokens is the per-document BPE symbol array (word-major order).

    Two equivalent paths: up to ``expr_max_rules`` rules the merges replay
    as chained JVM scans (codegen); beyond that an Arrow-batched
    ``mapInPandas`` replays the same greedy scans in Python — expression
    trees deepen linearly per rule and long rule lists belong in a batch
    UDF. Path equivalence is pinned in tests/test_bpe.py."""
    from .dedup import tokens

    ordered = [(a, b) for _, a, b, _ in sorted(merges)]
    exploded = docs.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("pos", "word")
    )
    if len(ordered) <= expr_max_rules:
        syms = _to_symbols(F.col("word"))
        for a, b in ordered:
            syms = _merge_scan(syms, [(a, b)])
        encoded = exploded.withColumn("toks", syms)
    else:
        import pandas as pd

        out_schema = "doc_id long, pos int, toks array<string>"

        def replay(batches):
            rules = ordered

            def enc(word: str) -> list[str]:
                syms = list(word) + [END_MARK]
                for a, b in rules:
                    out: list[str] = []
                    for s in syms:
                        if out and out[-1] == a and s == b:
                            out[-1] = a + b
                        else:
                            out.append(s)
                    syms = out
                return syms

            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "doc_id": pdf[id_col],
                        "pos": pdf["pos"],
                        "toks": pdf["word"].map(enc),
                    }
                )

        encoded = exploded.mapInPandas(replay, out_schema)
    key = id_col if len(ordered) <= expr_max_rules else "doc_id"
    word_major = F.array_sort(F.collect_list(F.struct("pos", "toks"))).getField("toks")
    return (
        encoded.groupBy(F.col(key).alias(id_col))
        .agg(F.flatten(word_major).alias("tokens"))
        .withColumn("n_tokens", F.size("tokens"))
        .select(id_col, "n_tokens", "tokens")
    )
