"""Deduplication operators for large-scale training-data pipelines.

Not part of the reference's surface — these are the LLM-data-pipeline
operators the engine adds (BASELINE.json north star). All are pure
DataFrame compositions designed for 100 TB:

- exact:    one groupBy on a hash — shuffle volume = |distinct digests|.
- minhash:  tokenize → per-(doc, seed) min-hash aggregate → band →
            band-bucket self-join. The self-join is on (band, signature)
            — a skew-safe equi-join because identical signatures are rare
            by construction; no O(n²) pair blowup.
- simhash:  per-(doc, bit) weighted vote → 32-bit fingerprint; near-dup
            pairs via bucket-on-prefix + hamming filter.
- ngram:    blocked pairwise Jaccard for verification of candidates.

Determinism: token hashing uses md5 hex strings (identical in Spark and
DuckDB) — the min of hex strings is a valid uniform min-hash and is
engine-portable, so every stage is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..caching import consistency_cache

TOKEN_SPLIT = r"\s+"


def tokens(text: Column) -> Column:
    """Whitespace tokens, empties removed (matches DuckDB
    regexp_split_to_array(text, '\\s+') with empty filter)."""
    return F.filter(F.split(text, TOKEN_SPLIT), lambda t: t != "")


def doc_tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per (doc, distinct token)."""
    return (
        docs.select(id_col, F.explode(tokens(F.col(text_col))).alias("tok"))
        .distinct()
    )


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """k-token shingles (word k-grams) from an ALREADY-MATERIALIZED token
    array column. Order-sensitive — two documents with the same vocabulary
    but different word order share few shingles, so shingle-minhash
    discriminates where unigram-minhash collapses. Documents shorter than k
    tokens yield their whole token-join as a single shingle.

    ``toks`` must be a plain column reference, not the tokenization
    expression itself: element_at inside the transform lambda re-evaluates
    its input expression per element, so an inline regex split would run
    O(shingles × k) times per row.
    """
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(0)))
    return F.when(
        n >= k,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + F.lit(j)) for j in range(k)]
            ),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def doc_shingles(
    docs: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per (doc, distinct k-shingle).

    Distinctness of (doc, shingle) is doc-LOCAL, so dedup happens in the
    array domain (``array_distinct`` before the explode) — no corpus-wide
    DISTINCT exchange. The old explode-then-``.distinct()`` form shuffled
    the full shingle stream just to drop within-doc repeats."""
    toks = docs.select(id_col, tokens(F.col(text_col)).alias("__toks"))
    return toks.select(
        id_col,
        F.explode(F.array_distinct(shingles_from_tokens(F.col("__toks"), k))).alias("tok"),
    )


def exact_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup by content digest: digest → (canonical_id, n_dups, ids).

    At scale: md5 is computed map-side; the groupBy shuffles only
    (digest, id) pairs; groups are tiny (dup cardinality).
    """
    return (
        docs.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_dups"),
            F.max(id_col).alias("max_id"),
        )
        .filter(F.col("n_dups") > 1)
    )


def minhash_signatures(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    token_df: DataFrame | None = None,
) -> DataFrame:
    """K min-hashes per doc over 3-token shingles:
    h_i(doc) = min over shingles of md5(i || ':' || shingle).

    One explode + one groupBy(doc, seed) with map-side partial min — shuffle
    volume is K rows per doc regardless of document length. Each shingle is
    md5-digested ONCE; the per-seed hashes re-hash the short 32-char digest
    (md5(seed || ':' || md5(shingle))) instead of the long shingle K times.

    ``token_df`` (one row per (doc, distinct shingle), columns
    ``id_col, tok``) skips the tokenize→shingle pass — pass it when the
    caller already materialized the shingle table for another stage so
    the corpus is shingled once, not once per consumer.
    """
    base = (
        token_df
        if token_df is not None
        else doc_shingles(docs, shingle_k, id_col, text_col)
    )
    toks = base.select(id_col, F.md5(F.col("tok")).alias("tok_h"))
    seeds = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("seed")
    return (
        toks.select(id_col, "tok_h", seeds)
        .groupBy(id_col, "seed")
        .agg(F.min(F.md5(F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("tok_h")))).alias("mh"))
    )


def band_table(
    docs: DataFrame,
    k: int = 8,
    band_rows: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_df: DataFrame | None = None,
) -> DataFrame:
    """(id, band, bsig) LSH band signatures — the joinable (and, in an
    incremental pipeline, PERSISTABLE) form of a corpus's MinHash state:
    store this table bucketed by (band, bsig) and each new ingest only
    computes its own batch's bands. n_bands = k/band_rows rows per doc.
    ``token_df`` forwards the pre-shingled input (see
    ``minhash_signatures``).

    Shape (round 9, guide §2.4): ONE groupBy(doc) with k min-aggregate
    COLUMNS instead of the seed-exploded groupBy(doc, seed) + a second
    groupBy(doc, band) with collect_list/array_sort — same md5 work and
    the same map-side partial mins, but one exchange instead of two and
    1 row per doc on the wire instead of k. Band signatures are then a
    stack() unpivot of concat_ws over the per-seed columns (seed order is
    the column order — no sort needed). Values are identical to the
    two-aggregate form; ``dd_minhash_lsh_pairs``'s oracle pins it."""
    base = (
        token_df
        if token_df is not None
        else doc_shingles(docs, 3, id_col, text_col)
    )
    toks = base.select(id_col, F.md5(F.col("tok")).alias("tok_h"))
    sig = toks.groupBy(id_col).agg(
        *[
            F.min(
                F.md5(F.concat(F.lit(f"{s}:"), F.col("tok_h")))
            ).alias(f"__mh{s}")
            for s in range(k)
        ]
    )
    n_bands = k // band_rows
    stack_expr = ", ".join(
        "CAST({b} AS BIGINT), concat_ws('|', {cols})".format(
            b=b,
            cols=", ".join(
                f"__mh{b * band_rows + r}" for r in range(band_rows)
            ),
        )
        for b in range(n_bands)
    )
    return sig.select(
        id_col, F.expr(f"stack({n_bands}, {stack_expr}) AS (band, bsig)")
    )


def _sub_bucket(bands: DataFrame, max_bucket: int, id_field: str) -> DataFrame:
    """Split over-full LSH buckets: buckets with n > ``max_bucket`` docs
    are salted into ceil(n / max_bucket) sub-buckets on a secondary hash
    of the doc id, so the bucket self/cross-join stays O(n · max_bucket)
    instead of O(n²). The sub assignment is a deterministic function of
    the doc id and the bucket's sub count, so both join sides agree.
    Recall: pairs landing in different sub-buckets of a mega-bucket are
    dropped — the standard production trade for template-heavy corpora,
    where one (band, bsig) bucket can hold millions of boilerplate docs
    and exact enumeration of its pairs is inherently quadratic. Adds a
    ``sub`` column (0 for normal buckets)."""
    nsub = F.expr(f"cast(ceil(count(1) over (partition by band, bsig) / {max_bucket}) as bigint)")
    return bands.withColumn(
        "sub",
        F.when(nsub <= 1, F.lit(0)).otherwise(
            F.pmod(F.xxhash64(F.col(id_field)), nsub)
        ),
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    k: int = 8,
    band_rows: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int | None = None,
) -> DataFrame:
    """MinHash-LSH candidate pairs: band the K signatures into K/band_rows
    bands, bucket-join docs sharing any band signature. Returns distinct
    (doc1, doc2), doc1 < doc2.

    ``max_bucket`` (default off, preserving exact semantics): bound the
    hot-bucket blowup — a template-heavy corpus can put millions of docs
    in one (band, bsig) bucket, making the self-join quadratic in that
    bucket. Over-full buckets are salted into ceil(n / max_bucket)
    sub-buckets (see ``_sub_bucket``); pair volume per bucket drops from
    C(n, 2) to ~n·max_bucket/2 at the cost of cross-sub-bucket recall
    inside mega-buckets only."""
    bands = band_table(docs, k, band_rows, id_col, text_col)
    # tiny table (n_bands rows per doc) self-joined below — cache so the
    # shingle→md5→signature lineage isn't recomputed for both join sides
    join_key = ["band", "bsig"]
    if max_bucket is not None:
        bands = _sub_bucket(bands, max_bucket, id_col)
        join_key = ["band", "bsig", "sub"]
    bands = consistency_cache(bands)
    a = bands.select(F.col(id_col).alias("doc1"), *join_key)
    b = bands.select(F.col(id_col).alias("doc2"), *join_key)
    return (
        a.join(b, join_key)
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2")
        .distinct()
    )


def simhash32(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """32-bit SimHash fingerprint per doc from distinct-token hashes.

    Token hash = first 8 hex chars of md5 (portable); per-bit ±1 vote,
    bit set where the vote sum is >= 0. Explodes tokens × 32 bits —
    expressed instead as a single aggregate over per-token hash ints with
    32 conditional sums, so the shuffle carries one row per (doc, token).
    """
    toks = doc_tokens(docs, id_col, text_col).withColumn(
        "h", F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(32)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    sim = None
    for b in range(32):
        bit = F.when(F.col(f"v{b}") >= 0, F.lit(2 ** b)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return agg.select(id_col, sim.cast("long").alias("simhash"))


def jaccard_on_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_shingles: bool = False,
    shingle_k: int = 3,
    token_df: DataFrame | None = None,
) -> DataFrame:
    """Exact token-set (or shingle-set) Jaccard restricted to candidate
    ``pairs`` (doc1, doc2). The precision stage of two-stage dedup: the
    expensive exact join is bounded by |pairs|, never all-pairs. Pairs with
    zero overlapping tokens get jaccard = 0 (kept — the caller thresholds).

    ``token_df`` (one row per (doc, distinct token/shingle), columns
    ``id_col, tok``) reuses a table the caller already built — no
    re-tokenization and no internal cache (the caller owns caching).
    """
    if token_df is not None:
        toks = token_df  # caller owns caching of a supplied token table
    else:
        toks = consistency_cache(  # internal build: joined twice below
            doc_shingles(docs, shingle_k, id_col, text_col)
            if use_shingles
            else doc_tokens(docs, id_col, text_col)
        )
    sizes = toks.groupBy(id_col).agg(F.count("*").alias("sz"))
    ta = toks.select(F.col(id_col).alias("doc1"), "tok")
    tb = toks.select(F.col(id_col).alias("doc2"), "tok")
    inter = (
        pairs.join(ta, "doc1")
        .join(tb, ["doc2", "tok"])
        .groupBy("doc1", "doc2")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc1"), F.col("sz").alias("sz1"))
    sb = sizes.select(F.col(id_col).alias("doc2"), F.col("sz").alias("sz2"))
    return (
        pairs.join(inter, ["doc1", "doc2"], "left")
        .join(sa, "doc1")
        .join(sb, "doc2")
        .withColumn("n_i", F.coalesce(F.col("n_inter"), F.lit(0)).cast("double"))
        .withColumn(
            "jaccard",
            F.col("n_i")
            / F.nullif(F.col("sz1") + F.col("sz2") - F.col("n_i"), F.lit(0.0)),
        )
        .select("doc1", "doc2", "jaccard")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    block_col: str | None = None,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    lsh_k: int = 8,
    lsh_band_rows: int = 2,
) -> DataFrame:
    """Pairwise token-set Jaccard with bounded pair generation.

    Default (``block_col=None``): candidates come from MinHash-LSH banding
    (``lsh_candidate_pairs``) and only those pairs get the exact join —
    pair count is bounded by band-bucket collisions, skew-safe at 100 TB
    (the same composition as the contract's ``dd_dedup_pipeline``).

    ``block_col='lang'`` (opt-in, small curated corpora only): all pairs
    within a category block. Pair count is O(Σ block²) — a popular category
    is an all-pairs bomb at scale, which is why this is no longer the
    default.
    """
    if block_col is None:
        cand = lsh_candidate_pairs(
            docs, k=lsh_k, band_rows=lsh_band_rows, id_col=id_col, text_col=text_col
        )
        jac = jaccard_on_pairs(docs, cand, id_col, text_col)
        return jac.filter(F.col("jaccard") >= threshold)

    toks = (
        docs.select(id_col, block_col, F.explode(tokens(F.col(text_col))).alias("tok")).distinct()
    )
    toks = consistency_cache(toks)  # self-joined below
    sizes = toks.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = toks.select(F.col(id_col).alias("doc1"), F.col(block_col).alias("blk"), "tok")
    b = toks.select(F.col(id_col).alias("doc2"), F.col(block_col).alias("blk"), "tok")
    inter = (
        a.join(b, ["blk", "tok"])
        .filter(F.col("doc1") < F.col("doc2"))
        .groupBy("doc1", "doc2")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc1"), F.col("sz").alias("sz1"))
    sb = sizes.select(F.col("doc_id").alias("doc2"), F.col("sz").alias("sz2"))
    jac = (
        inter.join(sa, "doc1")
        .join(sb, "doc2")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / F.nullif((F.col("sz1") + F.col("sz2") - F.col("n_inter")).cast("double"), F.lit(0.0)),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold).select("doc1", "doc2", "jaccard")


def jaccard_prefix_join(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_df: DataFrame | None = None,
) -> DataFrame:
    """EXACT token-Jaccard similarity self-join at ``jaccard >= threshold``
    via AllPairs/PPJoin prefix filtering (Bayardo et al. 2007; Xiao et al.
    2008 — public algorithms) — the deterministic complement to the
    probabilistic MinHash-LSH path: zero false negatives, zero false
    positives, no signature tuning.

    The pruning theorem: order every document's distinct tokens by
    ascending document frequency (rarest first, token as tiebreak); if
    J(A,B) ≥ t, the first ``n − ceil(t·n) + 1`` tokens of A and B must
    share at least one token — so candidate pairs come from an equi-join
    on PREFIX tokens only, never all tokens. The rare-first order makes
    prefixes meet on rare tokens, keeping per-token join fanout small; a
    length filter (t·max(n₁,n₂) ≤ min(n₁,n₂)) prunes further before the
    exact ``array_intersect`` verify.

    Scale shape: one token-keyed shuffle for document frequencies, one
    groupBy to the per-doc ordered array, a prefix-token equi-join whose
    volume is Σ_tok |prefix-docs(tok)|² (bounded by rare-first ordering —
    the quadratic term only exists for tokens rare enough to sit in
    prefixes), and a |candidates|-sized verify join. No all-pairs stage
    at any document count. Empty documents produce no tokens and drop
    out (Jaccard undefined). Returns (id1, id2, inter, uni, jaccard).

    ``token_df`` overrides the default whitespace tokenization with a
    pre-built (id_col, tok) table — pass the shingle stream to compute
    exact SHINGLE-set Jaccard on the same universe MinHash-LSH bands
    over (what a banding-recall evaluation needs)."""
    t = float(threshold)
    if token_df is None:
        tok = (
            docs.select(
                F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok")
            )
            .distinct()
        )
    else:
        tok = token_df.select(F.col(id_col).alias("id"), "tok").distinct()
    dfreq = tok.groupBy("tok").agg(F.count("*").alias("dfr"))
    ranked = tok.join(dfreq, "tok")
    lists = (
        ranked.groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("dfr", "tok"))).alias("__ord"))
        .select(
            "id",
            F.transform("__ord", lambda s: s["tok"]).alias("ord"),
        )
        .withColumn("n", F.size("ord"))
        .withColumn(
            "plen", (F.col("n") - F.ceil(F.lit(t) * F.col("n")) + F.lit(1)).cast("int")
        )
    )
    pref = lists.select(
        "id", "n", F.explode(F.slice(F.col("ord"), F.lit(1), F.col("plen"))).alias("tok")
    )
    cand = (
        pref.alias("a")
        .join(
            pref.alias("b"),
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.id") < F.col("b.id"))
            & (
                F.least(F.col("a.n"), F.col("b.n")).cast("double")
                >= F.lit(t) * F.greatest(F.col("a.n"), F.col("b.n")).cast("double")
            ),
        )
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .distinct()
        # the verify below is CPU-dense (one array_intersect per pair),
        # not byte-dense: AQE's size-based coalescing would pack millions
        # of candidate pairs into 1-2 tasks and serialize the work, so fan
        # the (id1, id2) keys out to the full parallelism explicitly —
        # the extra shuffle moves only id pairs, negligible next to the
        # per-pair intersect cost it parallelizes
        .repartition(docs.sparkSession.sparkContext.defaultParallelism, "id1", "id2")
    )
    sets = lists.select("id", "ord", "n")
    inter = F.size(F.array_intersect(F.col("m1.ord"), F.col("m2.ord")))
    out = (
        cand.join(sets.alias("m1"), F.col("id1") == F.col("m1.id"))
        .join(sets.alias("m2"), F.col("id2") == F.col("m2.id"))
        .select(
            "id1",
            "id2",
            inter.alias("inter"),
            (F.col("m1.n") + F.col("m2.n") - inter).alias("uni"),
        )
    )
    return out.filter(
        F.col("inter").cast("double") >= F.lit(t) * F.col("uni").cast("double")
    ).withColumn(
        "jaccard",
        F.floor(F.col("inter").cast("double") / F.col("uni") * F.lit(1e6) + F.lit(0.5))
        / F.lit(1e6),
    )


def lsh_cross_pairs(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    k: int = 8,
    band_rows: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    new_token_df: DataFrame | None = None,
    corpus_token_df: DataFrame | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Incremental-dedup candidates: band-bucket join of a NEW batch
    against the EXISTING corpus (distinct (new_id, corpus_id) sharing
    any band signature) — the nightly-ingest shape, where the corpus
    side's ``band_table`` is computed once and persisted (bucketed by
    (band, bsig)) and each ingest pays only for its own batch: batch
    bands are a map-side pass over new bytes, the join is an equi-join
    on the bucket key, and candidate volume is bounded by band
    collisions, never ``|batch| x |corpus|``. Recomputed per call here
    so the oracle can replay it. ``new_token_df``/``corpus_token_df``
    forward to ``band_table`` so an already-shingled split is not
    re-shingled per side.

    ``max_bucket`` (default off): bound the hot-bucket cross-volume
    |new∩bucket| × |corpus∩bucket|. Both sides are salted into the SAME
    ceil(max(n_new, n_corpus) / max_bucket) sub-buckets per (band, bsig)
    — nsub comes from one shared size table so the deterministic
    sub assignment agrees across sides; volume per bucket drops by ~nsub
    at the cost of cross-sub recall inside mega-buckets only."""
    nb = band_table(
        new_docs, k, band_rows, id_col, text_col, token_df=new_token_df
    ).select(F.col(id_col).alias("new_id"), "band", "bsig")
    cb = band_table(
        corpus_docs, k, band_rows, id_col, text_col, token_df=corpus_token_df
    ).select(F.col(id_col).alias("corpus_id"), "band", "bsig")
    join_key = ["band", "bsig"]
    if max_bucket is not None:
        nsz = nb.groupBy("band", "bsig").agg(F.count("*").alias("_nn"))
        csz = cb.groupBy("band", "bsig").agg(F.count("*").alias("_nc"))
        nsub_t = (
            nsz.join(csz, ["band", "bsig"], "full_outer")
            .select(
                "band",
                "bsig",
                F.ceil(
                    F.greatest(
                        F.coalesce(F.col("_nn"), F.lit(0)),
                        F.coalesce(F.col("_nc"), F.lit(0)),
                    )
                    / F.lit(max_bucket)
                ).alias("_nsub"),
            )
        )
        sub = lambda c: F.when(  # noqa: E731
            F.col("_nsub") <= 1, F.lit(0)
        ).otherwise(F.pmod(F.xxhash64(F.col(c)), F.col("_nsub")))
        nb = nb.join(nsub_t, ["band", "bsig"]).withColumn("sub", sub("new_id"))
        cb = cb.join(nsub_t, ["band", "bsig"]).withColumn("sub", sub("corpus_id"))
        join_key = ["band", "bsig", "sub"]
    return nb.join(cb, join_key).select("new_id", "corpus_id").distinct()


def duplicate_substring_spans(
    docs: DataFrame,
    k: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact duplicated-substring spans, the character-level dedup of
    "Deduplicating Training Data Makes Language Models Better" (Lee et
    al. 2022): every maximal span covered by length-``k`` substrings
    that occur ≥ 2 times in the corpus (across documents OR repeated
    inside one), as merged inclusive 1-based [span_start, span_end]
    char ranges per document — the ranges a substring-level dedup pass
    would cut.

    Shape: posexplode each doc into its n_chars−k+1 length-k grams
    (one JVM projection, no Python), ONE groupBy on the gram string to
    find grams with ≥ 2 occurrences, then per-doc interval merge of the
    surviving [pos, pos+k−1] windows via gaps-and-islands (running max
    of span ends; windows partitioned by doc). The reference
    implementation builds a suffix array precisely to avoid this k×
    byte amplification; here the gram shuffle IS the documented cost —
    |corpus bytes|·k — and ``winnow_fingerprints``/containment is the
    bounded-fingerprint scale path when that is too much. Grouping on
    the gram string (not a hash) keeps the result exact: no collision
    can mark a unique span duplicated."""
    n = F.length(F.col(text_col))
    grams = (
        docs.filter(n >= k)
        .select(
            id_col,
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, length({text_col}) - {k} + 1), "
                    f"p -> substring({text_col}, p, {k}))"
                )
            ).alias("__i", "gram"),
        )
        .select(id_col, (F.col("__i") + 1).alias("pos"), "gram")
    )
    # grams with ≥ 2 occurrences via groupBy (map-side partial combine:
    # a boilerplate gram repeated 10^6× collapses to one row per map task
    # before the shuffle) + left-semi join back.  A count(*) window
    # partitioned by gram would route EVERY occurrence of a hot gram to
    # a single un-splittable window task; the semi-join shape keeps the
    # reduce side one row per distinct gram, and the probe-side join is
    # AQE-skew-splittable if a gram is still degenerate after combine.
    dup_grams = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("__n_occ"))
        .filter(F.col("__n_occ") >= 2)
        .select("gram")
    )
    dup_pos = grams.join(dup_grams, "gram", "left_semi").select(id_col, "pos")
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    spans = (
        dup_pos.withColumn("end", F.col("pos") + F.lit(k - 1))
        .withColumn("__prev_max_end", F.max("end").over(w))
        .withColumn(
            "__new_island",
            F.when(
                F.col("__prev_max_end").isNull()
                | (F.col("pos") > F.col("__prev_max_end") + 1),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "__island",
            F.sum("__new_island").over(
                Window.partitionBy(id_col)
                .orderBy("pos")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return spans.groupBy(id_col, "__island").agg(
        F.min("pos").alias("span_start"),
        F.max("end").alias("span_end"),
        (F.max("end") - F.min("pos") + 1).alias("span_len"),
    ).drop("__island")


def cut_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a span report (``duplicate_substring_spans`` output: id,
    span_start, span_end — inclusive, 1-based, non-overlapping) to the
    corpus: cut every span out of the text. Returns
    (id, cleaned, n_removed) for EVERY document — span-free docs pass
    through with n_removed = 0.

    Shape: per doc, the kept segments are the gaps between consecutive
    spans (lag window over the doc's few span rows — never over corpus
    rows) plus the tail after the last span; segments join back to the
    text and concatenate with in-aggregate deterministic ordering
    (sort_array(collect_list(struct))), so there is no ordered-window
    re-shuffle of the corpus. Cost: one |spans| window + one join +
    one groupBy on the doc id.

    The ``spans`` input feeds FOUR plan branches here (gap segments,
    tail segments, the removed-chars join, the untouched anti-join),
    each with different column pruning — so runtime exchange reuse
    never dedups them and the span-producer's corpus-wide gram shuffle
    would execute four times. One consistency cache of the tiny span
    table (a few rows per affected doc) pins a single computation
    (round 9, guide §5 caching: reused AND expensive to recompute;
    measured 2.9 → 1.9 s at sf0.1 for dd_substring_dedup_apply)."""
    spans = consistency_cache(spans)
    w = Window.partitionBy(id_col).orderBy("span_start")
    segs = (
        spans.withColumn(
            "seg_start",
            F.coalesce(F.lag("span_end").over(w) + 1, F.lit(1)),
        )
        .withColumn("seg_end", F.col("span_start") - 1)
        .select(id_col, "seg_start", "seg_end")
    )
    # tail segment after the last span (may be empty; length clamps it)
    tails = spans.groupBy(id_col).agg(
        (F.max("span_end") + 1).alias("seg_start"),
        F.lit(None).cast("int").alias("seg_end"),  # = end of text
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("__removed"),
    )
    pieces = segs.unionByName(tails.drop("__removed")).join(
        docs.select(id_col, text_col), id_col
    )
    piece_txt = F.expr(
        f"substring({text_col}, seg_start, "
        f"coalesce(seg_end, length({text_col})) - seg_start + 1)"
    )
    cleaned = (
        pieces.withColumn("__piece", piece_txt)
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("seg_start", "__piece"))
                    ),
                    lambda st: st["__piece"],
                ),
                "",
            ).alias("cleaned")
        )
        .join(tails.select(id_col, "__removed"), id_col)
    )
    # no .distinct(): anti-join already has set semantics on the build side
    untouched = docs.join(spans.select(id_col), id_col, "left_anti")
    return cleaned.select(
        id_col, "cleaned", F.col("__removed").cast("bigint").alias("n_removed")
    ).unionByName(
        untouched.select(
            id_col,
            F.col(text_col).alias("cleaned"),
            F.lit(0).cast("bigint").alias("n_removed"),
        )
    )


def frequent_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 5,
) -> DataFrame:
    """Line-level document frequency: normalized lines (ASCII-space trim
    + lowercase — the CCNet-style key) appearing in at least ``min_docs``
    DISTINCT documents. Returns ``(line_key, n_docs)``.

    This is the discovery half of boilerplate-line removal (CCNet §4.1 /
    RefinedWeb line-wise filtering: navigation menus, cookie banners,
    "all rights reserved" footers recur across a crawl; content lines
    don't). Blank/whitespace-only lines are EXEMPT — their key is ''
    and removing them would be a formatting change, not dedup.

    Scale: one posexplode (line volume = corpus bytes) into a map-side-
    combinable groupBy on the line key — shuffle volume is DISTINCT keys
    per partition, and the output above any useful threshold is tiny
    (the boilerplate set), broadcastable into the removal join. Same
    family as duplicate_substring_spans' gram table, one gram per line.
    Reference: n/a (engine addition — LLM-pipeline surface)."""
    lines = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), "\n")).alias("__line"),
    )
    key = F.lower(F.trim(F.col("__line")))
    return (
        lines.select(F.col(id_col), key.alias("line_key"))
        .filter(F.col("line_key") != "")
        .groupBy("line_key")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= F.lit(int(min_docs)))
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 5,
    frequent: DataFrame | None = None,
) -> DataFrame:
    """Drop every line whose normalized key appears in ≥ ``min_docs``
    distinct documents (CCNet-style boilerplate removal), preserving the
    order and original (un-normalized) form of the surviving lines.

    Returns one row per input document: ``(id_col, clean_text, n_kept,
    n_removed)``. Blank lines are exempt (kept, counted in ``n_kept``);
    a document whose every line is boilerplate survives with
    ``clean_text = ''``. Pass ``frequent`` to reuse a precomputed
    :func:`frequent_lines` table (e.g. corpus-wide boilerplate applied
    to a new ingest batch — the incremental-dedup shape).

    Scale: the frequent set above threshold is small by construction, so
    the removal join broadcasts; reassembly is one groupBy per document
    over its own lines (collect_list + array_sort — per-doc data, no
    global window). Total: explode + count + broadcast join + per-doc
    regroup, every stage partitioned by content or document key."""
    if frequent is None:
        frequent = frequent_lines(docs, id_col, text_col, min_docs)
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__line"),
    ).withColumn("line_key", F.lower(F.trim(F.col("__line"))))
    marked = lines.join(
        F.broadcast(frequent.select("line_key", F.lit(True).alias("__boiler"))),
        "line_key",
        "left",
    )
    kept = F.col("__boiler").isNull() | (F.col("line_key") == "")
    per_doc = marked.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(kept, F.struct(F.col("__pos"), F.col("__line")))
                    )
                ),
                lambda s: s["__line"],
            ),
            "\n",
        ).alias("clean_text"),
        F.sum(kept.cast("bigint")).alias("n_kept"),
        F.sum((~kept).cast("bigint")).alias("n_removed"),
    )
    # docs with NULL text produce no exploded rows — restore them as-is
    return (
        docs.select(id_col, F.col(text_col).alias("__orig"))
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("clean_text"), F.col("__orig")).alias("clean_text"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
            F.coalesce(F.col("n_removed"), F.lit(0)).cast("bigint").alias("n_removed"),
        )
    )
