"""DSIR-style data selection via hashed n-gram importance weights
(engine addition; the reference has no text ops — glider telemetry only,
see ``/root/reference/seaexplorertools/process_adcp.py``).

The published recipe (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling"): fit two bag-of-hashed-n-gram models —
p from a small *target* corpus (the distribution you want more of) and q
from the *raw* pool — then score every raw document by its importance
log-weight Σ_b c_b·(ln p_b − ln q_b) over hash buckets b, and keep the
top slice. The hashing collapses an unbounded vocabulary to a fixed
``n_buckets``-row model, which is what makes the method run at corpus
scale.

Spark shape, designed for the 100 TB pool:

- feature extraction (unigrams + bigrams → md5 bucket) is pure JVM
  expression work — no Python, no UDF;
- both models are ONE map-side-combined aggregate each; shuffle width is
  ≤ ``n_buckets`` rows (default 1024), never corpus rows;
- the per-bucket log-ratio table is ≤ ``n_buckets`` rows → broadcast;
  scoring is a map-side join + one per-doc aggregate (shuffle = \\|docs\\|);
- the top-slice flag uses ``rank.global_rank`` (range repartition +
  windowless prefix offsets), so no single-partition window appears at
  any scale.

Engine-portability: the log-ratio is quantized to integer micro-nats
(``floor(λ·1e6 + 0.5)`` as BIGINT) the moment it is computed, so every
per-doc score is an exact integer sum — summation order cannot move the
result, and the DuckDB oracle reproduces it bit-for-bit (the repo-wide
micro-unit trick, cf. the LTTB and weighted-quantile operators).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..caching import consistency_cache

from .dedup import tokens


def hashed_ngram_features(
    docs: DataFrame,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document hashed-n-gram bucket counts: one row per
    (``id_col``, bucket) with the in-doc occurrence count ``c``.

    Features are whitespace unigrams plus adjacent bigrams ("w1 w2"),
    bucketed by the first 8 hex chars of md5 mod ``n_buckets`` — the
    stable cross-engine draw used throughout the repo (DuckDB twin:
    ``('0x' || substr(md5(f), 1, 8))::BIGINT % n_buckets``). All array
    work (split, slice, transform, concat) is JVM-side; the only shuffle
    is the (doc, bucket) count aggregate, map-side combined."""
    toks = tokens(F.col(text_col))
    bigrams = F.expr(
        "transform(slice(__toks, 1, greatest(size(__toks) - 1, 0)), "
        "(t, i) -> concat(t, ' ', __toks[i + 1]))"
    )
    feats = F.concat(F.col("__toks"), bigrams)
    bucket = (
        F.conv(F.substring(F.md5(F.col("__f")), 1, 8), 16, 10).cast("bigint")
        % F.lit(n_buckets)
    )
    return (
        docs.withColumn("__toks", toks)
        .select(id_col, F.explode(feats).alias("__f"))
        .select(id_col, bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("c"))
    )


def dsir_log_ratio_table(
    raw_buckets: DataFrame,
    target_buckets: DataFrame,
    n_buckets: int = 1024,
) -> DataFrame:
    """The broadcastable DSIR model: per-bucket integer micro-nat
    log-ratio ``lam_micro = round₆(ln p̂_b − ln q̂_b)·10⁶`` with add-one
    smoothing over ``n_buckets`` buckets, p̂ from the target counts and
    q̂ from the raw counts.

    Input frames carry (bucket, c). Buckets absent from the raw pool
    never occur in any scored document, so the model table is keyed by
    the raw bucket set (≤ ``n_buckets`` rows); target counts left-join
    onto it with 0 fill. Totals are two 1-row aggregates crossed in —
    the J5 scalar-broadcast pattern, no driver collect."""
    raw = raw_buckets.groupBy("bucket").agg(F.sum("c").alias("cr"))
    tgt = target_buckets.groupBy("bucket").agg(F.sum("c").alias("ct"))
    nr = raw.agg(F.sum("cr").alias("nr")).withColumn("__k", F.lit(1))
    nt = tgt.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("nt")).withColumn(
        "__k", F.lit(1)
    )
    m = float(n_buckets)
    lam = (
        F.log((F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0)) / (F.col("nt") + F.lit(m)))
        - F.log((F.col("cr") + F.lit(1.0)) / (F.col("nr") + F.lit(m)))
    )
    return (
        raw.join(tgt, "bucket", "left")
        .withColumn("__k", F.lit(1))
        .join(F.broadcast(nr), "__k")
        .join(F.broadcast(nt), "__k")
        .select(
            "bucket",
            F.floor(lam * F.lit(1000000.0) + F.lit(0.5))
            .cast("bigint")
            .alias("lam_micro"),
        )
    )


def dsir_scores(
    doc_buckets: DataFrame,
    log_ratio: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document DSIR importance log-weight in exact integer
    micro-nats: Σ_b c_b · lam_micro_b. The model table broadcasts
    (≤ n_buckets rows); docs whose buckets all miss the raw model (can't
    happen when the raw pool scored itself, but keeps the operator total)
    score 0 via the left join's 0-fill. One per-doc aggregate — shuffle
    = |docs| rows."""
    j = doc_buckets.join(F.broadcast(log_ratio), "bucket", "left")
    return j.groupBy(id_col).agg(
        F.sum(F.col("c") * F.coalesce(F.col("lam_micro"), F.lit(0)))
        .cast("bigint")
        .alias("score_micro")
    )


def dsir_select(
    docs: DataFrame,
    target_pred: Column,
    keep_fraction: float = 0.25,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """End-to-end DSIR pass over a raw pool: fit target (rows matching
    ``target_pred``) vs raw hashed-n-gram models, score every document,
    and flag the top ``keep_fraction`` slice (ties broken by ``id_col``
    so the flag is deterministic).

    Returns (id_col, score_micro, selected). The selection boundary is
    computed from the exact windowless ``global_rank`` and the doc count
    — K = ceil(keep_fraction · n) — so no global window and no driver
    sort appear at any scale.

    The target model comes from a SECOND filtered scan rather than a
    semi-join of the raw feature stream against the target id set: the
    target slice is a few percent of a 100 TB pool, so its id set is not
    broadcastable, while ``target_pred`` pushes down into the scan and
    the re-extraction is pure map work over only the target bytes."""
    from .rank import global_rank

    feats = hashed_ngram_features(docs, n_buckets, id_col, text_col)
    # PERF: feats feeds two consumers (raw model, scoring); one cache
    # pins one computation of the explode-heavy extraction
    feats = consistency_cache(feats)
    tgt_buckets = hashed_ngram_features(
        docs.filter(target_pred), n_buckets, id_col, text_col
    )
    lam = dsir_log_ratio_table(feats, tgt_buckets, n_buckets)
    scores = dsir_scores(feats, lam, id_col)
    n = scores.agg(F.count("*").alias("n_docs")).withColumn("__k", F.lit(1))
    ranked = global_rank(
        scores, [F.col("score_micro").desc(), F.col(id_col)], "__r"
    )
    return (
        ranked.withColumn("__k", F.lit(1))
        .join(F.broadcast(n), "__k")
        .select(
            id_col,
            "score_micro",
            (
                F.col("__r")
                <= F.ceil(F.lit(float(keep_fraction)) * F.col("n_docs")).cast("long")
            ).alias("selected"),
        )
    )


def bloom_hash_positions(col: Column, m_bits: int, k: int) -> Column:
    """Array of ``k`` bit positions in [0, m_bits) for a value — the
    j-th draw is the first 12 md5 hex chars of ``j || ':' || value`` mod
    ``m_bits``. Deterministic, engine-portable (DuckDB twin:
    ``('0x' || substr(md5(j || ':' || x), 1, 12))::BIGINT % m``) — so a
    filter built here and a filter built by the oracle are bit-identical
    and membership verdicts can be compared exactly."""
    draws = [
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{j}:"), col.cast("string"))), 1, 12
                ),
                16,
                10,
            ).cast("bigint")
            % F.lit(m_bits)
        )
        for j in range(k)
    ]
    return F.array(*draws)


def bloom_build(
    df: DataFrame,
    value_col: str,
    m_bits: int = 65536,
    k: int = 3,
) -> DataFrame:
    """Distributed Bloom filter as a (word_idx, word) table: ``m_bits``
    bits packed 32-per-word (word_idx = pos div 32), each word the
    ``bit_or`` of every member value's hash bits. One explode (k rows
    per value) into one map-side-combined aggregate over ≤ m_bits/32
    groups — the whole filter is a ≤ 2 048-row table at the default
    64 Kbit size, built in a single pass with shuffle width bounded by
    the word count, never by |values|. 32-bit packing (not 64) keeps
    every mask in the positive BIGINT range: DuckDB raises an overflow
    on ``1::BIGINT << 63`` (sign bit), so the 64-bit form would not be
    oracle-reproducible; at 32 bits the words are engine-exact.

    This is the 100 TB decontamination posture: the eval/holdout n-gram
    set compresses to a fixed-size broadcastable bitset, and the probe
    over the full pool becomes a map-side lookup — no shuffle keyed on
    n-grams, which is what kills the exact-join formulation
    (cf. dedup-style joins) when the pool is large. False positives only
    (rate ≈ (1 − e^{−kn/m})^k); no false negatives.

    Relation to ``bloomjoin.build_bloom``: that operator collects the
    bitmap to the driver as literal longs for a zero-join codegen probe
    inside ONE Spark plan (xxhash64, fastest in-engine path). This one
    keeps the filter as a broadcastable (word_idx, word) DataFrame with
    md5 draws — the filter is itself a first-class, persistable dataset
    (build once from the eval suite, reuse across pipelines) and every
    bit is reproducible by any md5-capable engine, which is what lets
    the DuckDB oracle verify membership verdicts exactly."""
    pos = F.explode(bloom_hash_positions(F.col(value_col), m_bits, k)).alias(
        "__pos"
    )
    return (
        df.select(pos)
        .select(
            F.expr("__pos div 32").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos % 32 AS INT))").alias(
                "__m"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__m").alias("word"))
    )


def bloom_probe(
    df: DataFrame,
    value_col: str,
    bloom: DataFrame,
    m_bits: int = 65536,
    k: int = 3,
    out_col: str = "maybe_member",
) -> DataFrame:
    """Add boolean ``out_col``: True iff every one of the value's ``k``
    hash bits is set in the broadcast ``bloom`` word table (i.e. the
    value is *possibly* a member; False is definite non-membership).

    Plan: ``k`` broadcast LEFT joins (one per hash draw, each on its own
    word index) and a conjunction — all map-side, NO explode and NO
    aggregate, so input row identity and cardinality are preserved
    structurally. That also makes the operator retry-deterministic at
    cluster scale: an earlier formulation keyed a per-row verdict
    aggregate on ``monotonically_increasing_id`` over generic shuffle
    output, where a fetch-failure stage retry can reorder rows and
    reassign ids; joining on the hash positions themselves leaves
    nothing order-dependent anywhere in the plan."""
    out = df.withColumn("__ps", bloom_hash_positions(F.col(value_col), m_bits, k))
    hits = []
    for j in range(k):
        wj = bloom.select(
            F.col("word_idx").alias(f"__wi{j}"), F.col("word").alias(f"__wd{j}")
        )
        out = out.withColumn(f"__p{j}", F.expr(f"element_at(__ps, {j + 1})")).join(
            F.broadcast(wj),
            F.expr(f"__p{j} div 32") == F.col(f"__wi{j}"),
            "left",
        )
        hits.append(
            F.coalesce(F.col(f"__wd{j}"), F.lit(0)).bitwiseAND(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(__p{j} % 32 AS INT))")
            )
            != F.lit(0)
        )
    allhit = hits[0]
    for h in hits[1:]:
        allhit = allhit & h
    return out.select(*df.columns, allhit.alias(out_col))
