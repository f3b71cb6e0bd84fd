"""Training-data pipeline: selection, mixtures, packing, BPE, k-means,
LM scoring, end-to-end corpus/pretrain preps (batch 6, part 3).

Split from the flat contract module in round 5 (registry mechanics and
conventions: contract/_base.py; canonical key order: contract/_order.py).
"""

from __future__ import annotations

import math  # noqa: F401

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql.window import Window  # noqa: F401

from ..operators import windows as W  # noqa: F401
from ..operators.grid import binned_agg_2d, histogram  # noqa: F401
from ..operators.joins import asof_join, interp_join  # noqa: F401
from ..operators.qc import qc_velocity  # noqa: F401
from ._base import (  # noqa: F401
    EV_ORDER,
    ORACLES,
    QUERIES,
    R6P_SQL,
    events,
    ptable, q,
    r6,
    r6p,
    table,
    ts_us_col,
)
from .llm_core import _TOK_SQL  # noqa: F401
from .refparity import _EV_W_SQL  # noqa: F401


@q(
    "q_weighted_sample",
    """
    SELECT lang, doc_id, sample_rank FROM (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY pow(('0x' || substr(md5('ws' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                              / 4294967296.0,
                            1.0 / n_chars) DESC,
                        doc_id) AS sample_rank
      FROM documents WHERE n_chars > 0
    ) WHERE sample_rank <= 25
    """,
)
def q_weighted_sample(spark, sf_dir):
    """Weighted sampling without replacement (operators/sampling.py::
    weighted_sample_per_group): 25 docs per language with inclusion
    probability ∝ n_chars, via deterministic Efraimidis–Spirakis keys
    u^(1/w). The Spark path runs a partition-local top-k combine before
    the per-group window (a giant group never sorts whole); this oracle —
    the single-window formulation — pins the two-phase plan bit-identical
    to it."""
    from ..operators.sampling import weighted_sample_per_group

    docs = ptable(spark, sf_dir)
    out = weighted_sample_per_group(docs, ["lang"], "doc_id", "n_chars", k=25, salt="ws")
    return out.select("lang", "doc_id", "sample_rank")


@q(
    "q_source_cap",
    """
    SELECT doc_id, source, n_chars, cap_rank FROM (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id ASC) AS cap_rank
      FROM documents
    ) WHERE cap_rank <= 20
    """,
)
def q_source_cap(spark, sf_dir):
    """Per-source DOMAIN CAP (operators/sampling.py::top_k_per_group):
    keep at most 20 documents per source, best-first by (n_chars DESC,
    doc_id ASC) — the mixture-design primitive that bounds any one
    domain's contribution to a pretraining corpus (the keep/drop
    counterpart of q_mixture_upsample's repeat factors; same
    longest-wins policy as dd_canonical_pick). The Spark path runs a
    partition-local top-k combine before the per-group window, so a
    boilerplate-heavy mega-domain never sorts whole; this single-window
    oracle pins the two-phase plan bit-identical to it."""
    from ..operators.sampling import top_k_per_group

    docs = ptable(spark, sf_dir).select("doc_id", "source", "n_chars")
    return top_k_per_group(
        docs,
        ["source"],
        [F.col("n_chars").desc(), F.col("doc_id").asc()],
        k=20,
        rank_col="cap_rank",
    ).select("doc_id", "source", "n_chars", "cap_rank")


@q(
    "txt_tfidf",
    f"""
    WITH tk AS (
      SELECT doc_id, unnest({_TOK_SQL}) AS tok FROM documents
    ),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY doc_id, tok),
    dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.tok, tf.tf, dfq.df,
           round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfq.df), 6) AS tfidf
    FROM tf JOIN dfq USING (tok) CROSS JOIN n
    """,
)
def txt_tfidf(spark, sf_dir):
    """Corpus TF-IDF vectors: per-(doc, token) term frequency × ln(N/df)
    inverse document frequency. Two aggregations + a 1-row corpus-size
    broadcast; shuffle volume is |distinct (doc, token)|."""
    from ..operators.text import tfidf

    docs = ptable(spark, sf_dir)
    out = tfidf(docs)
    return out.select("doc_id", "tok", "tf", "df", r6(F.col("tfidf")).alias("tfidf"))


@q(
    "txt_bpe_tokens",
    r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
           len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS n_ws_tokens
    FROM documents
    """,
)
def txt_bpe_tokens(spark, sf_dir):
    """Token counting, both flavors: whitespace tokens and BPE-ish
    pre-tokens (letter runs / digits / punctuation — the GPT-2 pre-tokenizer
    shape) for LLM token budgeting."""
    from ..operators.text import bpe_ish_token_count, token_count

    docs = ptable(spark, sf_dir)
    return docs.select(
        "doc_id",
        bpe_ish_token_count(F.col("text")).cast("long").alias("n_bpe_tokens"),
        token_count(F.col("text")).cast("long").alias("n_ws_tokens"),
    )


@q(
    "mm_resize_frames",
    """
    WITH t AS (
      SELECT doc_id AS media_id,
             (1 + doc_id % 64) * (1 + doc_id % 48) AS target
      FROM documents
    ),
    s AS (SELECT media_id, target, greatest(target // 4, 1) AS step FROM t)
    SELECT media_id, CAST(4 AS BIGINT) AS n_frames,
           (greatest(0, least(target, 1 * step) - 0 * step)
            + greatest(0, least(target, 2 * step) - 1 * step)
            + greatest(0, least(target, 3 * step) - 2 * step)
            + greatest(0, least(target, 4 * step) - 3 * step)) AS total_frame_bytes
    FROM s
    """,
)
def mm_resize_frames(spark, sf_dir):
    """Multimodal resize + frame-sample plumbing (stub decode): documents
    as fake media → resize to each row's OWN (width, height) metadata
    target → 4 sampled frames each. The stub's byte arithmetic is
    deterministic and input-dependent (target = (1+id%64)·(1+id%48)), so
    the driver check is an EXACT integer oracle over the whole
    mapInPandas path (upgraded from rows-only; frame-slice truncation
    replayed with least/greatest arithmetic)."""
    from ..operators.multimodal import documents_as_media, resize_images, sample_frames

    media = documents_as_media(ptable(spark, sf_dir))
    resized = resize_images(media, per_row_dims=True)
    frames = sample_frames(resized, 4)
    return frames.groupBy("media_id").agg(
        F.count("*").alias("n_frames"),
        F.sum(F.length("frame_payload")).alias("total_frame_bytes"),
    )


@q(
    "w1b_running_median_minmax",
    f"""
    SELECT event_id,
           round(median(value) OVER ({_EV_W_SQL} ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING), 6)
             AS run_med,
           max(value) OVER ({_EV_W_SQL} ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS run_max,
           min(value) OVER ({_EV_W_SQL} ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS run_min
    FROM events
    """,
)
def w1b_running_median_minmax(spark, sf_dir):
    """W1 variants — centered running median/max/min (reference notebook
    RunningMedian/RunningMax/RunningMin, ProcessADCPSeaExplorer cell 10)."""
    ev = events(spark, sf_dir)
    return ev.select(
        "event_id",
        r6(W.centered_median("value", 3, ["user_id"], EV_ORDER)).alias("run_med"),
        W.centered_max("value", 3, ["user_id"], EV_ORDER).alias("run_max"),
        W.centered_min("value", 3, ["user_id"], EV_ORDER).alias("run_min"),
    )


@q(
    "txt_pii_redact",
    r"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@mail.example.com from 10.' ||
             (doc_id % 256) || '.0.' || (doc_id % 100) || ' call +1-555-123-' ||
             lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
           len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
           len(regexp_extract_all(t, '\+\d{1,2}-\d{3}-\d{3}-\d{4}')) AS n_phones,
           md5(regexp_replace(
                 regexp_replace(
                   regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                 '\+\d{1,2}-\d{3}-\d{3}-\d{4}', '<PHONE>', 'g')) AS red_fp
    FROM aug
    """,
)
def txt_pii_redact(spark, sf_dir):
    """PII scrubbing (emails / IPv4 / phone numbers → typed tags) with
    per-type counts — the standard pre-training redaction pass. The fixture
    text contains no PII, so deterministic synthetic PII is appended per doc
    (same expression in the oracle) to make the check non-vacuous; the
    redacted text is fingerprinted (md5) for the value hash. Patterns stay
    in the Java-regex ∩ RE2 common subset so both engines match identically."""
    from ..operators.text import pii_redact

    # plain table(): this lane is a pure map-side filter/aggregate —
    # the ptable fan-out shuffle measured NEGATIVE here (r9 A/B) and
    # tests/test_plans.py pins the zero-extra-exchange shape
    d = table(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com from 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0."),
            (F.col("doc_id") % 100).cast("string"),
            F.lit(" call +1-555-123-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("t"),
    )
    out = pii_redact(aug, text_col="t")
    return out.select(
        "doc_id",
        F.col("n_emails").cast("long").alias("n_emails"),
        F.col("n_ips").cast("long").alias("n_ips"),
        F.col("n_phones").cast("long").alias("n_phones"),
        F.md5("redacted").alias("red_fp"),
    )


@q(
    "txt_entropy",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_TOK_SQL}) AS t FROM documents),
    c AS (SELECT doc_id, t, count(*) AS n FROM tok GROUP BY doc_id, t),
    a AS (SELECT doc_id, count(*) AS n_types, CAST(sum(n) AS BIGINT) AS n_tokens,
                 sum(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))) AS nlogn
          FROM c GROUP BY doc_id)
    SELECT doc_id, n_types, n_tokens,
           round(ln(CAST(n_tokens AS DOUBLE)) - nlogn / CAST(n_tokens AS DOUBLE), 6) AS entropy
    FROM a
    """,
)
def txt_entropy(spark, sf_dir):
    """Per-doc Shannon entropy of the token distribution (lexical-diversity
    quality signal). Engine side uses H = ln N − (Σ n·ln n)/N so it's one
    explode + two partial-combine aggregations, no window/join."""
    from ..operators.text import token_entropy

    return token_entropy(ptable(spark, sf_dir))


@q(
    "q_percentile_filter",
    """
    WITH p AS (SELECT lang, quantile_cont(n_chars, 0.9) AS p90
               FROM documents GROUP BY lang)
    SELECT d.doc_id, d.lang, d.n_chars, round(p.p90, 6) AS p90
    FROM documents d JOIN p USING (lang)
    WHERE CAST(d.n_chars AS DOUBLE) > p.p90
    """,
)
def q_percentile_filter(spark, sf_dir):
    """Distribution-based quality filtering: keep docs above their
    language's exact 90th-percentile length. Per-key percentiles are a tiny
    aggregate (|langs| rows) broadcast back against the corpus — the
    groupBy+broadcast shape survives 100 TB where a per-row percentile
    window would not. Exact interpolated percentile (Spark `percentile` ==
    DuckDB `quantile_cont`), filter on the unrounded value so the boundary
    is engine-deterministic."""
    d = ptable(spark, sf_dir)
    p = d.groupBy("lang").agg(F.percentile("n_chars", F.lit(0.9)).alias("p90"))
    return (
        d.join(F.broadcast(p), "lang")
        .filter(F.col("n_chars").cast("double") > F.col("p90"))
        .select("doc_id", "lang", "n_chars", r6(F.col("p90")).alias("p90"))
    )


@q(
    "ann_quantize_int8",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    y AS (SELECT vec_id, nrm, list_transform(v, x -> x / nullif(nrm, 0.0)) AS y FROM n),
    s AS (SELECT vec_id, nrm, y,
                 list_max(list_transform(y, x -> abs(x))) AS sc FROM y)
    SELECT vec_id, round(nrm, 6) AS l2_norm, round(sc, 6) AS q_scale,
           array_to_string(
             list_transform(y, x -> CAST(CAST(floor(x * 127.0 / sc + 0.5) AS BIGINT) AS VARCHAR)),
             ',') AS qstr
    FROM s
    """,
)
def ann_quantize_int8(spark, sf_dir):
    """Embedding int8 quantization (normalize → symmetric scale → floor+0.5)
    — 4x storage cut for the 100 TB vector column; pure JVM array exprs.
    The quantized vector is emitted as a joined string so every element is
    value-hashed without exploding 64 rows per vector."""
    from ..operators.similarity import quantize_int8

    e = table(spark, sf_dir, "embeddings")
    out = quantize_int8(e, "embedding")
    return out.select(
        "vec_id",
        r6(F.col("l2_norm")).alias("l2_norm"),
        r6(F.col("q_scale")).alias("q_scale"),
        F.array_join(F.transform(F.col("q"), lambda x: x.cast("string")), ",").alias("qstr"),
    )


@q(
    "q_salted_join",
    """
    WITH d AS (SELECT event_type, round(avg(value), 6) AS type_avg
               FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type, d.type_avg,
           round(e.value - d.type_avg, 6) AS dev
    FROM events e JOIN d USING (event_type)
    """,
)
def q_salted_join(spark, sf_dir):
    """Skew-safe replicate-fragment join: events have only a handful of
    event_type values (maximal key skew), so the per-type dim is replicated
    across 8 deterministic salts and the join key becomes (type, salt) —
    each hot key spreads over 8 reducers. Result identical to the plain
    equi-join (the oracle). For a dim this small you'd broadcast; the query
    pins the pattern for when the build side is too big to broadcast."""
    from ..operators.skew import salted_join

    ev = events(spark, sf_dir)
    dim = ev.groupBy("event_type").agg(r6(F.avg("value")).alias("type_avg"))
    out = salted_join(
        ev.select("event_id", "event_type", "value"),
        dim,
        ["event_type"],
        n_salts=8,
        salt_from="event_id",
    )
    return out.select(
        "event_id",
        "event_type",
        "type_avg",
        r6(F.col("value") - F.col("type_avg")).alias("dev"),
    )


@q(
    "q_kmeans_assign",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 8),
    d AS (SELECT e.vec_id, c.c_id,
                 round(list_dot_product(e.v, e.v)
                       - 2.0 * list_dot_product(e.v, c.cv)
                       + list_dot_product(c.cv, c.cv), 6) AS d2
          FROM e CROSS JOIN c),
    r AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c_id ASC) AS rn
          FROM d)
    SELECT vec_id, c_id AS cluster, d2 FROM r WHERE rn = 1
    """,
)
def q_kmeans_assign(spark, sf_dir):
    """One Lloyd assignment step under deterministic init (k = 8 lowest-id
    vectors): broadcast the centroids, arg-min squared distance via the
    dot-product identity, centroid-id tiebreak on the rounded distance.
    The SQL-expressible slice of the iterative k-means in
    operators/clustering.py (full multi-iteration run: q_kmeans_iterate)."""
    from ..operators.clustering import assign_clusters

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    c = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cv")
    )
    return assign_clusters(e, c)


def _kmeans_oracle_sql(k: int = 8, n_iter: int = 3, dim: int = 64) -> str:
    """DuckDB replay of operators/clustering.py::kmeans_lloyd — same
    lowest-id init, same dot-identity distance (vv − 2vc + cc) rounded to
    6 dp before the (d2, c_id) arg-min, same per-dim mean update with
    empty clusters keeping their previous centroid."""
    parts = [
        f"""WITH cells AS MATERIALIZED (
      SELECT vec_id, r.range + 1 AS pos1,
             CAST(embedding[r.range + 1] AS DOUBLE) AS val
      FROM embeddings CROSS JOIN range({dim}) r
    ),
    vv AS MATERIALIZED (SELECT vec_id, SUM(val * val) AS vv FROM cells GROUP BY vec_id),
    cent0 AS MATERIALIZED (
      SELECT CAST(dense_rank() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS c_id,
             pos1, val AS cval
      FROM cells
      WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})
    )"""
    ]
    prev = "cent0"
    for t in range(1, n_iter + 1):
        parts.append(
            f"""cc{t} AS MATERIALIZED (SELECT c_id, SUM(cval * cval) AS cc FROM {prev} GROUP BY c_id),
    vc{t} AS MATERIALIZED (
      SELECT cells.vec_id, p.c_id, SUM(cells.val * p.cval) AS vc
      FROM cells JOIN {prev} p USING (pos1) GROUP BY cells.vec_id, p.c_id
    ),
    d{t} AS MATERIALIZED (
      SELECT vc{t}.vec_id, vc{t}.c_id,
             round(vv.vv - 2.0 * vc{t}.vc + cc{t}.cc, 6) AS d2
      FROM vc{t} JOIN vv USING (vec_id) JOIN cc{t} USING (c_id)
    ),
    asg{t} AS MATERIALIZED (
      SELECT vec_id, c_id AS cluster, d2 FROM (
        SELECT vec_id, c_id, d2,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_id) AS rn
        FROM d{t}
      ) WHERE rn = 1
    ),
    mean{t} AS MATERIALIZED (
      SELECT asg{t}.cluster AS c_id, cells.pos1, AVG(cells.val) AS cval
      FROM asg{t} JOIN cells USING (vec_id) GROUP BY 1, 2
    ),
    cent{t} AS MATERIALIZED (
      SELECT p.c_id, p.pos1, COALESCE(m.cval, p.cval) AS cval
      FROM {prev} p LEFT JOIN mean{t} m ON m.c_id = p.c_id AND m.pos1 = p.pos1
    )"""
        )
        prev = f"cent{t}"
    final = (
        f"SELECT cluster, count(*) AS n, round(SUM(d2), 6) AS sse"
        f" FROM asg{n_iter} GROUP BY cluster"
    )
    return ",\n    ".join(parts) + "\n    " + final


@q("q_kmeans_iterate", _kmeans_oracle_sql())
def q_kmeans_iterate(spark, sf_dir):
    """Three full Lloyd iterations (assign → per-dim mean update →
    re-broadcast): cluster sizes and within-cluster SSE. The fixed
    iteration count, lowest-id init, and 6-dp-rounded distances (ties on
    centroid id) make the whole loop deterministic and engine-portable,
    so the oracle UNROLLS the identical three iterations in SQL
    (materialized CTE chain, same dot-identity distance algebra) — the
    driver check is exact, upgraded from rows-only in round 3;
    tests/test_clustering.py additionally pins SSE monotonicity."""
    from ..operators.clustering import kmeans_lloyd

    e = table(spark, sf_dir, "embeddings")
    assign, _, _ = kmeans_lloyd(e, k=8, n_iter=3)
    return assign.groupBy("cluster").agg(
        F.count("*").alias("n"), r6(F.sum("d2")).alias("sse")
    )


def _bpe_train_oracle_chain(n_merges: int = 16) -> tuple[str, str]:
    """DuckDB replay of classic sequential BPE training (merges_per_round
    = 1): the trainer loop UNROLLED as one CTE group per merge round —
    count weighted adjacent pairs over the symbolized distinct-word
    table, pick the argmax under the engine's total order (count DESC,
    left ASC, right ASC; all-ASCII corpus ⇒ UTF-8 byte order == Java
    UTF-16 order), apply ONE greedy left-to-right merge pass, repeat.

    The apply pass must be exact for self-pairs (left == right): in a
    run of k identical candidates greedy merges positions 1-2, 3-4, …
    so a plain lag(hit) consumption chain over-consumes. Gaps-and-
    islands fixes it: candidate positions are grouped into maximal
    consecutive runs (pos - row_number()), and only ODD in-island ranks
    start a merge; the row after any merge-start is consumed. For
    left != right candidates can never be adjacent, so islands have
    length 1 and the parity rule degenerates to "merge every match" —
    one uniform pass covers both cases (same precedent as the unrolled
    k-means/IVF/PQ oracles, r5).

    Returns (chain, last_state): the WITH-body CTE chain and the name of
    the final symbolization state CTE, shared by the train and encode
    oracles."""
    parts = [f"""toks AS MATERIALIZED (
      SELECT unnest({_TOK_SQL}) AS word FROM documents
    ),
    wc AS MATERIALIZED (
      SELECT word, count(*) AS wcount FROM toks GROUP BY word
    ),
    s0 AS MATERIALIZED (
      SELECT word, wcount, p + 1 AS pos,
             CASE WHEN p < length(word) THEN substr(word, CAST(p + 1 AS INT), 1)
                  ELSE '</w>' END AS sym
      FROM (SELECT word, wcount, unnest(range(length(word) + 1)) AS p FROM wc)
    )"""]
    prev = "s0"
    for t in range(1, n_merges + 1):
        parts.append(f"""w{t} AS MATERIALIZED (
      SELECT l, r, cnt FROM (
        SELECT l, r, CAST(sum(wcount) AS BIGINT) AS cnt FROM (
          SELECT wcount, sym AS l,
                 lead(sym) OVER (PARTITION BY word ORDER BY pos) AS r
          FROM {prev}
        ) WHERE r IS NOT NULL GROUP BY l, r HAVING sum(wcount) >= 2
      ) ORDER BY cnt DESC, l, r LIMIT 1
    ),
    c{t} AS (
      SELECT s.word, s.wcount, s.pos, s.sym, w.l AS wl, w.r AS wr,
             coalesce(s.sym = w.l AND lead(s.sym)
                 OVER (PARTITION BY s.word ORDER BY s.pos) = w.r, FALSE) AS cand
      FROM {prev} s LEFT JOIN w{t} w ON TRUE
    ),
    i{t} AS (
      SELECT *, CASE WHEN cand THEN pos - row_number()
                 OVER (PARTITION BY word, cand ORDER BY pos) END AS isl
      FROM c{t}
    ),
    m{t} AS (
      SELECT *, cand AND (row_number()
                 OVER (PARTITION BY word, isl ORDER BY pos) % 2 = 1) AS mstart
      FROM i{t}
    ),
    s{t} AS MATERIALIZED (
      SELECT word, wcount,
             row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
             CASE WHEN mstart THEN wl || wr ELSE sym END AS sym
      FROM (SELECT *, coalesce(lag(mstart)
                 OVER (PARTITION BY word ORDER BY pos), FALSE) AS consumed
            FROM m{t})
      WHERE NOT consumed
    )""")
        prev = f"s{t}"
    return ",\n    ".join(parts), prev


def _bpe_train_oracle_sql(n_merges: int = 16) -> str:
    chain, _ = _bpe_train_oracle_chain(n_merges)
    rows = "\n      UNION ALL ".join(
        f"SELECT {t - 1} AS step, l, r, cnt FROM w{t}" for t in range(1, n_merges + 1)
    )
    return (
        f"WITH {chain}\n    "
        f"SELECT CAST(step AS INTEGER) AS step, l AS \"left\", r AS \"right\","
        f" l || r AS merged, cnt AS pair_count FROM ({rows})"
    )


def _bpe_encode_oracle_sql(n_merges: int = 16) -> str:
    """Encode = the trainer's final per-distinct-word symbolization,
    joined back to the corpus word stream: n_tokens(doc) = Σ over the
    doc's words of that word's final symbol count."""
    chain, last = _bpe_train_oracle_chain(n_merges)
    return f"""WITH {chain},
    wordlen AS MATERIALIZED (
      SELECT word, count(*) AS ntok FROM {last} GROUP BY word
    ),
    dw AS (SELECT doc_id, unnest({_TOK_SQL}) AS word FROM documents)
    SELECT doc_id, CAST(sum(ntok) AS INTEGER) AS n_tokens
    FROM dw JOIN wordlen USING (word) GROUP BY doc_id"""


@q("txt_bpe_train", _bpe_train_oracle_sql())
def txt_bpe_train(spark, sf_dir):
    """Distributed BPE tokenizer training over the documents corpus
    (operators/bpe.py::train_bpe): 16 merge rules learned on the weighted
    distinct-word table (corpus-size-independent inner loop), pair counts
    and greedy scan-merges all in JVM codegen, classic sequential BPE
    (one merge per round, counts recomputed after every merge). The
    fixed merge count, total-order tie-break (count DESC, pair lexico-
    graphic) and deterministic greedy scan make the whole loop engine-
    portable, so the oracle UNROLLS the identical 16 rounds as DuckDB
    CTE groups (count-pairs → pick-max → island-parity greedy apply) —
    the driver check is exact, upgraded from rows-only in round 7;
    tests/test_bpe.py additionally pins the merge sequence against a
    pure-python classic-BPE reference. LLM-pipeline surface (SURVEY §6)
    — the trainer behind bpe_ish_token_count's fixed tokenizer."""
    from ..operators.bpe import merge_table, train_bpe

    docs = ptable(spark, sf_dir)
    return merge_table(spark, train_bpe(docs, n_merges=16, merges_per_round=1))


@q("txt_bpe_encode", _bpe_encode_oracle_sql())
def txt_bpe_encode(spark, sf_dir):
    """Train-then-apply tokenizer loop: the 16 rules learned by
    txt_bpe_train replayed over every document as chained JVM scan-merges
    (operators/bpe.py::bpe_encode), emitting per-doc token counts.
    Exact-oracled in round 7: the oracle reuses the unrolled trainer
    chain and joins the final per-distinct-word symbol counts back to
    the corpus word stream (encode is word-major, so Σ per-word final
    symbol counts IS the document token count); tests/test_bpe.py pins
    the encode path against a pure-python replay and pins the
    JVM-expression path ≡ the mapInPandas path."""
    from ..operators.bpe import bpe_encode, train_bpe

    docs = ptable(spark, sf_dir)
    merges = train_bpe(docs, n_merges=16, merges_per_round=1)
    return bpe_encode(docs, merges).select("doc_id", "n_tokens")


# fixed literal BPE rules for the exact-oracle encode variant: realistic
# English merges, every rule left != right (self-pair rules like ('l','l')
# merge alternately within runs — the generic engine scan handles them and
# tests/test_bpe.py pins that path; the SQL replay below covers the
# left != right case where one pass == "merge every match")
_BPE_FIXED_RULES = [
    (1, "e", "</w>", 0), (2, "t", "h", 0), (3, "th", "e</w>", 0),
    (4, "s", "</w>", 0), (5, "i", "n", 0), (6, "a", "n", 0),
    (7, "o", "r", 0), (8, "e", "r", 0),
]


def _bpe_fixed_oracle_sql(rules=None) -> str:
    """DuckDB replay of bpe_encode under FIXED literal rules: symbols =
    chars + '</w>' marker; each rule is one greedy left-to-right pass,
    replayed as an iterated CTE pair — mark matches (sym = a AND
    lead(sym) = b), drop the consumed right symbol (lag(hit)), rewrite
    the match to the merged token, re-number. For left != right rules
    matches can never overlap, so one windowed pass IS the greedy scan."""
    rules = rules or _BPE_FIXED_RULES
    parts = [f"""WITH words AS MATERIALIZED (
      SELECT doc_id, generate_subscripts(l, 1) AS wpos, unnest(l) AS word
      FROM (SELECT doc_id, {_TOK_SQL} AS l FROM documents)
    ),
    s0 AS MATERIALIZED (
      SELECT doc_id, wpos, p + 1 AS pos,
             CASE WHEN p < length(word) THEN substr(word, CAST(p + 1 AS INT), 1)
                  ELSE '</w>' END AS sym
      FROM (SELECT doc_id, wpos, word, unnest(range(length(word) + 1)) AS p
            FROM words)
    )"""]
    prev = "s0"
    for t, a, b, _ in sorted(rules):
        parts.append(f"""h{t} AS MATERIALIZED (
      SELECT doc_id, wpos, pos, sym,
             (sym = '{a}' AND lead(sym) OVER (PARTITION BY doc_id, wpos ORDER BY pos) = '{b}') AS hit
      FROM {prev}
    ),
    k{t} AS MATERIALIZED (
      SELECT doc_id, wpos, pos, sym, hit FROM (
        SELECT doc_id, wpos, pos, sym, hit,
               coalesce(lag(hit) OVER (PARTITION BY doc_id, wpos ORDER BY pos), FALSE) AS consumed
        FROM h{t}
      ) WHERE NOT consumed
    ),
    s{t} AS MATERIALIZED (
      SELECT doc_id, wpos,
             row_number() OVER (PARTITION BY doc_id, wpos ORDER BY pos) AS pos,
             CASE WHEN hit THEN '{a}{b}' ELSE sym END AS sym
      FROM k{t}
    )""")
        prev = f"s{t}"
    final = (
        f"SELECT doc_id, CAST(count(*) AS INTEGER) AS n_tokens"
        f" FROM {prev} GROUP BY doc_id"
    )
    return ",\n    ".join(parts) + "\n    " + final


@q("txt_bpe_encode_fixed", _bpe_fixed_oracle_sql())
def txt_bpe_encode_fixed(spark, sf_dir):
    """bpe_encode under FIXED literal merge rules — the exact-oracle twin
    of txt_bpe_encode (whose rules come from the iterative trainer and
    stay rows-only): the same chained JVM scan-merges, but with the 8
    _BPE_FIXED_RULES shipped as literals, so the DuckDB oracle replays
    every greedy pass as an iterated windowed CTE and the driver check
    is exact. Separates "is the ENCODER portable?" (this gate) from "is
    the TRAINER right?" (tests/test_bpe.py's pure-python pin)."""
    from ..operators.bpe import bpe_encode

    docs = ptable(spark, sf_dir)
    return bpe_encode(docs, _BPE_FIXED_RULES).select("doc_id", "n_tokens")


@q(
    "q_pack_sequences",
    f"""
    WITH tk AS (
      SELECT doc_id, len({_TOK_SQL}) AS n_tok,
             ('0x' || substr(md5('pack' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM documents
    ),
    cs AS (SELECT h % 8 AS shard, doc_id, n_tok,
                  sum(n_tok) OVER (PARTITION BY h % 8 ORDER BY h, doc_id
                                   ROWS UNBOUNDED PRECEDING) - n_tok AS start_off
           FROM tk)
    SELECT shard, CAST(floor(start_off / 2048.0) AS BIGINT) AS bin,
           count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM cs GROUP BY shard, bin
    """,
)
def q_pack_sequences(spark, sf_dir):
    """Sequence packing for pretraining: concatenate documents into a
    token stream and cut fixed-capacity (2048-token) context windows — a
    document belongs to the bin where it starts, exactly the
    concatenate-then-chunk layout GPT-style training uses. Deterministic
    hash order decorrelates document length from position; the stream is
    SHARDED by the same hash (8 here, thousands at scale) so the running
    cumsum — the one inherently sequential step — parallelizes per shard
    instead of serializing the corpus through a single global window.
    Output: per (shard, bin) document and token counts (the packing
    manifest a loader consumes). Exact BIGINT arithmetic end to end."""
    from ..operators.packing import pack_manifest

    return pack_manifest(
        ptable(spark, sf_dir), capacity=2048, n_shards=8
    )


@q(
    "txt_chunk",
    f"""
    WITH tk AS (SELECT doc_id, {_TOK_SQL} AS toks FROM documents),
    n AS (SELECT doc_id, toks, len(toks) AS nt FROM tk WHERE len(toks) > 0),
    c AS (SELECT doc_id, toks, nt,
                 unnest(generate_series(0, CAST(ceil(nt / 24.0) AS BIGINT) - 1)) AS k
          FROM n)
    SELECT doc_id, k AS chunk_id,
           array_to_string(toks[k*24 + 1 : least(k*24 + 32, nt)], ' ') AS chunk_text,
           least(k*24 + 32, nt) - k*24 AS chunk_len
    FROM c WHERE k*24 < nt
    """,
)
def txt_chunk(spark, sf_dir):
    """Overlapping context-window chunking (size 32, stride 24 — 25 %
    overlap), the shape embedding pipelines feed encoders with: one
    JVM-side ``sequence`` + ``explode`` + ``slice`` per document, no
    Python. Row growth is ~n_tokens/stride per doc — linear in corpus
    tokens, embarrassingly parallel, no shuffle at all (the chunk rows
    inherit the scan's partitioning)."""
    docs = ptable(spark, sf_dir)
    from ..operators.dedup import tokens as _tokens

    n = (
        docs.select("doc_id", _tokens(F.col("text")).alias("toks"))
        .withColumn("nt", F.size("toks").cast("long"))
        .filter(F.col("nt") > 0)
    )
    c = n.withColumn(
        "k",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.ceil(F.col("nt") / F.lit(24.0)).cast("long") - 1,
            )
        ),
    ).filter(F.col("k") * 24 < F.col("nt"))
    chunk_len = F.least(F.col("k") * 24 + 32, F.col("nt")) - F.col("k") * 24
    return c.select(
        "doc_id",
        F.col("k").alias("chunk_id"),
        F.array_join(
            F.slice(F.col("toks"), (F.col("k") * 24 + 1).cast("int"), chunk_len.cast("int")),
            " ",
        ).alias("chunk_text"),
        chunk_len.alias("chunk_len"),
    )


@q(
    "txt_normalize",
    r"""
    WITH messy AS (
      SELECT doc_id, n_chars,
             replace(text, 'table', e'TABLE\t\n  ') AS m, text
      FROM documents
    ),
    norm AS (
      SELECT doc_id, n_chars, text,
             trim(regexp_replace(
                    regexp_replace(lower(m), '[\x00-\x1f\x7f]', ' ', 'g'),
                    '\s+', ' ', 'g')) AS norm_text
      FROM messy
    )
    SELECT doc_id,
           CAST(norm_text = text AS INTEGER) AS roundtrips,
           length(norm_text) AS n_norm
    FROM norm
    """,
)
def txt_normalize(spark, sf_dir):
    """Text normalization (operators/text.py::normalize_text): the corpus
    fixture is already clean, so the query INJECTS deterministic mess
    (case flip + tab/newline/double-space around every 'table') and
    asserts the normalizer restores the original byte-for-byte —
    non-vacuous by construction, same injection in the oracle. At scale
    this is a zero-shuffle projection pass."""
    from ..operators.text import normalize_text

    docs = ptable(spark, sf_dir)
    messy = F.replace(F.col("text"), F.lit("table"), F.lit("TABLE\t\n  "))
    norm = normalize_text(messy)
    return docs.select(
        "doc_id",
        (norm == F.col("text")).cast("int").alias("roundtrips"),
        F.length(norm).alias("n_norm"),
    )


@q(
    "pipe_pretrain_prep",
    # composed lazily below — it chains pipe_corpus_prep's oracle, which is
    # registered later in this module; see _finalize_pretrain_oracle()
    None,
)
def pipe_pretrain_prep(spark, sf_dir):
    """FLAGSHIP COMPOSITION #2 — pretraining prep on top of corpus_prep:
    cleaned survivors → bigram-LM perplexity gate (LM trained ON the
    survivors, the CCNet pattern) → domain-mixture reweighting (map-side
    hash fractions) → hash-sharded sequence-packing manifest. One DAG;
    checked against one chained DuckDB statement built from the stages'
    oracles (pipeline/pretrain.py)."""
    from ..pipeline.pretrain import pretrain_prep

    return pretrain_prep(ptable(spark, sf_dir))


def _finalize_pretrain_oracle() -> None:
    mix_case = (
        "CASE source WHEN 'src0' THEN 0.9 WHEN 'src1' THEN 0.7 "
        "WHEN 'src2' THEN 0.5 WHEN 'src3' THEN 0.3 ELSE 0.25 END"
    )
    ORACLES["pipe_pretrain_prep"] = f"""
    WITH RECURSIVE surv AS ({ORACLES["pipe_corpus_prep"]}),
    corpus AS (SELECT d.doc_id, d.text, d.source
               FROM documents d JOIN surv s ON s.doc_id = d.doc_id),
    {_lm_sql_over("corpus")},
    kept AS (SELECT c.doc_id, c.text, c.source
             FROM corpus c JOIN lmscore USING (doc_id)
             WHERE lmscore.xent <= 3.41),
    mixed AS (SELECT * FROM kept
              WHERE ('0x' || substr(md5('pp' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                      / 4294967296.0 < {mix_case}),
    ptk AS (SELECT doc_id, len({_TOK_SQL}) AS n_tok,
                   ('0x' || substr(md5('pack' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
            FROM mixed),
    pcs AS (SELECT h % 8 AS shard, doc_id, n_tok,
                   sum(n_tok) OVER (PARTITION BY h % 8 ORDER BY h, doc_id
                                    ROWS UNBOUNDED PRECEDING) - n_tok AS start_off
            FROM ptk)
    SELECT shard, CAST(floor(start_off / 512.0) AS BIGINT) AS bin,
           count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM pcs GROUP BY shard, bin
    """


def _pr_iter_sql(prev: str, cur: str) -> str:
    """One unrolled PageRank round (operators/graph.py::pagerank twin)."""
    return f"""
    {cur} AS (
      SELECT nodes.node,
             CAST(0.15 AS DOUBLE) / nn.n + 0.85 * coalesce(c.contrib, 0.0) AS rank
      FROM nodes CROSS JOIN nn
      LEFT JOIN (SELECT ed.t AS node, sum({prev}.rank / outd.deg) AS contrib
                 FROM ed JOIN {prev} ON ed.s = {prev}.node
                 JOIN outd ON ed.s = outd.s
                 GROUP BY ed.t) c ON nodes.node = c.node
    )"""


@q(
    "q_pagerank",
    f"""
    WITH ed AS (SELECT DISTINCT o_custkey AS s, l_suppkey + 10000000 AS t
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    nodes AS (SELECT s AS node FROM ed UNION SELECT t FROM ed),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    outd AS (SELECT s, count(*) AS deg FROM ed GROUP BY s),
    r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / n AS rank FROM nodes CROSS JOIN nn),
    {_pr_iter_sql("r0", "r1")}, {_pr_iter_sql("r1", "r2")}, {_pr_iter_sql("r2", "r3")}
    SELECT node, round(rank * nn.n, 6) AS rank_n FROM r3 CROSS JOIN nn
    """,
)
def q_pagerank(spark, sf_dir):
    """PageRank (3 damped iterations) over the customer→supplier purchase
    graph — link-graph centrality as a corpus-quality prior (CommonCrawl
    curation ranks hosts exactly this way). Each round is one edge-keyed
    join + one destination-keyed sum; lineage truncated per round; N is a
    driver scalar. Supplier ids offset by 10M so the two key spaces don't
    collide. Output scaled to mean 1 (rank·N) before rounding so the 6-dp
    compare operates at O(1) magnitude. Fixed iteration count ⇒ the loop
    unrolls into the SQL oracle (full iterative twin: q_kmeans_iterate
    pattern)."""
    from ..operators.graph import pagerank

    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(10000000)).alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank(edges, n_iter=3, damping=0.85)
    n = ranks.count()
    return ranks.select(
        "node", r6(F.col("rank") * F.lit(float(n))).alias("rank_n")
    )


@q(
    "dd_semdedup",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 8),
    d AS (SELECT e.vec_id, c.c_id,
                 round(list_dot_product(e.v, e.v)
                       - 2.0 * list_dot_product(e.v, c.cv)
                       + list_dot_product(c.cv, c.cv), 6) AS d2
          FROM e CROSS JOIN c),
    r AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c_id ASC) AS rn
          FROM d),
    asg AS (SELECT vec_id, c_id AS cluster FROM r WHERE rn = 1),
    va AS (SELECT e.vec_id, e.v, asg.cluster FROM e JOIN asg USING (vec_id))
    SELECT id1, id2, cluster, sim FROM (
      SELECT a.vec_id AS id1, b.vec_id AS id2, a.cluster,
             round(list_dot_product(a.v, b.v)
                   / nullif(sqrt(list_dot_product(a.v, a.v))
                            * sqrt(list_dot_product(b.v, b.v)), 0.0), 6) AS sim
      FROM va a JOIN va b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
    ) WHERE sim >= 0.3
    """,
)
def dd_semdedup(spark, sf_dir):
    """SemDeDup semantic dedup: nearest-centroid clustering bounds the
    pairwise cosine join to within-cluster candidates (15.6k pairs vs 125k
    all-pairs on this fixture; Σ|cluster|² vs N² at scale). Deterministic
    k=8 lowest-id centroids so the oracle reproduces the assignment; in
    production the centroids come from kmeans_lloyd and the dup pairs feed
    the connected-components canonical pick (dd_canonical_pick)."""
    from ..operators.similarity import semdedup_pairs

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    c = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cv")
    )
    return semdedup_pairs(e, c, threshold=0.3)


# DuckDB twin of the bigram-LM CTE stack (operators/lm.py): tokens →
# unigram/bigram counts → add-one-smoothed -ln p(w2|w1) per adjacent pair.
# Parametrized over the source relation so pipelines can train the LM on a
# filtered corpus (pipe_pretrain_prep) while the standalone queries use the
# full documents table.
def _lm_sql_over(src: str) -> str:
    return f"""
    tk AS (SELECT doc_id, {_TOK_SQL} AS toks FROM {src}),
    occ AS (SELECT doc_id, unnest(toks) AS w1 FROM tk),
    uni AS (SELECT w1, count(*) AS c1 FROM occ GROUP BY w1),
    v AS (SELECT count(*) AS vs FROM uni),
    idx AS (SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks) - 1)) AS i FROM tk),
    bgr AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM idx),
    bc AS (SELECT w1, w2, count(*) AS c12 FROM bgr GROUP BY w1, w2),
    lmscore AS (
      SELECT b.doc_id, count(*) AS n_bigrams,
             round(avg(-ln((bc.c12 + 1.0) / (uni.c1 + v.vs))), 6) AS xent
      FROM bgr b JOIN bc USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v
      GROUP BY b.doc_id
    )
"""


_LM_SQL = _lm_sql_over("documents")


@q(
    "lm_bigram_xent",
    f"WITH {_LM_SQL} SELECT doc_id, n_bigrams, xent FROM lmscore",
)
def lm_bigram_xent(spark, sf_dir):
    """CCNet-style corpus-quality scoring: train a bigram LM on the corpus
    (two map-side-combined count aggregates), score every document by
    cross-entropy under it (broadcast joins of the vocab-sized model
    tables). Shuffles |vocab| + |bigram vocab| + |docs| rows — never a
    second corpus-sized shuffle. Engine addition (reference has no text
    ops); operators/lm.py."""
    from ..operators.lm import score_cross_entropy, train_bigram_lm

    docs = ptable(spark, sf_dir)
    uni, big, vocab = train_bigram_lm(docs)
    scored = score_cross_entropy(docs, uni, big, vocab)
    return scored.select("doc_id", "n_bigrams", r6(F.col("xent")).alias("xent"))


@q(
    "lm_ppl_filter",
    f"""
    WITH {_LM_SQL}
    SELECT d.doc_id, d.source FROM documents d
    JOIN lmscore s USING (doc_id) WHERE s.xent <= 3.404
    """,
)
def lm_ppl_filter(spark, sf_dir):
    """Perplexity gate: keep documents whose bigram cross-entropy is at or
    below a fixed threshold (≈ corpus median here; in production the
    threshold comes from a quantile of a held-out sample). The comparison
    uses the 6-dp-rounded score on both sides so the kept set is
    engine-exact even for documents near the cut."""
    from ..operators.lm import score_cross_entropy, train_bigram_lm

    docs = ptable(spark, sf_dir)
    uni, big, vocab = train_bigram_lm(docs)
    scored = score_cross_entropy(docs, uni, big, vocab)
    keep = scored.filter(r6(F.col("xent")) <= 3.404).select("doc_id")
    return docs.join(keep, "doc_id", "inner").select("doc_id", "source")


# Domain-mixture resampling: target corpus composition by source.
_MIX_WEIGHTS = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
_MIX_BUDGET = 60  # target output size in documents


@q(
    "q_mixture_resample",
    f"""
    WITH w(source, wt) AS (VALUES
        ('src0', CAST(0.4 AS DOUBLE)), ('src1', CAST(0.3 AS DOUBLE)),
        ('src2', CAST(0.2 AS DOUBLE)), ('src3', CAST(0.1 AS DOUBLE))),
    n AS (SELECT source, count(*) AS n_s FROM documents GROUP BY source)
    SELECT d.doc_id, d.source FROM documents d
    JOIN w USING (source) JOIN n USING (source)
    WHERE ('0x' || substr(md5('mix' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
            / 4294967296.0
          < least(1.0, CAST({_MIX_BUDGET} AS DOUBLE) * w.wt / n.n_s)
    """,
)
def q_mixture_resample(spark, sf_dir):
    """Resample the corpus to a target domain mixture: given per-source
    target weights and an output budget, keep each source with fraction
    min(1, budget·w_s / n_s) via the deterministic hash draw — the
    pipeline that sets train-set composition (webtext 40 % / books 30 % /
    …). Per-source counts are a dim-sized aggregate collected to the
    driver (|sources| rows — the J4/J5 small-side pattern); the keep
    decision itself is a pure map-side filter, no shuffle of the corpus."""
    from ..operators.sampling import hash_uniform

    # plain table(): this lane is a pure map-side filter/aggregate —
    # the ptable fan-out shuffle measured NEGATIVE here (r9 A/B) and
    # tests/test_plans.py pins the zero-extra-exchange shape
    docs = table(spark, sf_dir, "documents")
    counts = {
        r["source"]: r["n"]
        for r in docs.filter(F.col("source").isin(*_MIX_WEIGHTS))
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    frac = {
        s: min(1.0, _MIX_BUDGET * w / counts[s])
        for s, w in _MIX_WEIGHTS.items()
        if s in counts
    }
    cond = F.lit(False)
    u = hash_uniform(F.col("doc_id"), salt="mix")
    for s, f_s in sorted(frac.items()):
        cond = cond | ((F.col("source") == s) & (u < F.lit(f_s)))
    return docs.filter(cond).select("doc_id", "source")


@q(
    "q_inverted_index",
    f"""
    WITH tk AS (SELECT DISTINCT doc_id, unnest({_TOK_SQL}) AS tok FROM documents)
    SELECT tok, count(*) AS df,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
    FROM tk GROUP BY tok
    """,
)
def q_inverted_index(spark, sf_dir):
    """Inverted index build: token → document frequency + sorted posting
    list. The exploded (token, doc_id) pair set IS the distributed index —
    one shuffle keyed by token; the stringified posting list is an
    export-side materialization. At 100 TB, stop-word tokens make hot
    keys: cap df (drop tokens above a df ceiling — they don't
    discriminate anyway) or shard postings as (tok, bucket) — the same
    salting pattern as operators/skew.py. Search twin: q_boolean_search."""
    from ..operators.dedup import doc_tokens

    docs = ptable(spark, sf_dir)
    return (
        doc_tokens(docs)
        .groupBy("tok")
        .agg(
            F.count("*").alias("df"),
            F.array_join(F.sort_array(F.collect_set("doc_id")), ",").alias(
                "postings"
            ),
        )
    )


_SEARCH_TERMS = ["spark", "join", "fast"]


@q(
    "q_boolean_search",
    f"""
    WITH tk AS (SELECT DISTINCT doc_id, unnest({_TOK_SQL}) AS tok FROM documents)
    SELECT d.doc_id, d.lang, d.source
    FROM documents d JOIN (
      SELECT doc_id FROM tk WHERE tok IN ('spark', 'join', 'fast')
      GROUP BY doc_id HAVING count(*) = 3
    ) hits USING (doc_id)
    """,
)
def q_boolean_search(spark, sf_dir):
    """Conjunctive (AND) term search over the inverted-index pair set:
    filter the (doc, distinct token) rows to the query terms, count per
    doc, require all terms. The filter on ``tok`` prunes the exploded set
    to |terms|·|matching docs| rows before the shuffle — the index query
    pattern where selectivity comes first."""
    from ..operators.dedup import doc_tokens

    docs = ptable(spark, sf_dir)
    hits = (
        doc_tokens(docs)
        .filter(F.col("tok").isin(*_SEARCH_TERMS))
        .groupBy("doc_id")
        .agg(F.count("*").alias("nt"))
        .filter(F.col("nt") == len(_SEARCH_TERMS))
        .select("doc_id")
    )
    return docs.join(hits, "doc_id", "inner").select("doc_id", "lang", "source")


@q(
    "txt_hash_classifier",
    f"""
    WITH occ AS (SELECT doc_id, unnest({_TOK_SQL}) AS tok FROM documents)
    SELECT doc_id,
           round(avg(('0x' || substr(md5('w' || tok), 1, 8))::BIGINT
                     / 4294967296.0 - 0.5), 6) AS score,
           CAST(avg(('0x' || substr(md5('w' || tok), 1, 8))::BIGINT
                    / 4294967296.0 - 0.5) > 0 AS INTEGER) AS keep
    FROM occ GROUP BY doc_id
    """,
)
def txt_hash_classifier(spark, sf_dir):
    """Serving shape of a fasttext-style hashed linear quality classifier:
    score = mean over token occurrences of the weight at the token's hash
    bucket. Weights here are a pure hash function (uniform [-0.5, 0.5)) so
    the oracle can recompute them; swap ``weight_of`` for a lookup into a
    broadcast trained-weights array and the plan is unchanged — one
    explode + one map-side-combined average per doc, no Python. This is
    how model-based quality filtering (e.g. a CCNet/fasttext gate)
    actually runs at corpus scale: inference as a columnar expression."""
    from ..operators.sampling import hash_uniform

    # plain table(): this lane is a pure map-side filter/aggregate —
    # the ptable fan-out shuffle measured NEGATIVE here (r9 A/B) and
    # tests/test_plans.py pins the zero-extra-exchange shape
    docs = table(spark, sf_dir, "documents")
    from ..operators.dedup import tokens as _tokens

    occ = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("tok"))
    weight = hash_uniform(F.col("tok"), salt="w") - F.lit(0.5)
    return occ.groupBy("doc_id").agg(
        r6(F.avg(weight)).alias("score"),
        (F.avg(weight) > 0).cast("int").alias("keep"),
    )


_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@q(
    "q_profile_table",
    "\nUNION ALL\n".join(
        f"""
        SELECT '{c}' AS column_name, count(*) AS n_rows,
               count(*) - count({c}) AS n_null,
               count(DISTINCT {c}) AS n_distinct,
               round(min({c}), 6) AS min_v, round(max({c}), 6) AS max_v,
               round(avg({c}), 6) AS mean_v
        FROM lineitem
        """
        for c in _PROFILE_COLS
    ),
)
def q_profile_table(spark, sf_dir):
    """One-pass table profiling (the ANALYZE every 100 TB ingest runs):
    per-column row/null/distinct counts + min/max/mean, computed in a
    SINGLE aggregate over the scan and unpivoted driver-free with
    ``stack``. Exact ndv here for oracle parity; at scale swap in
    approx_count_distinct (HLL — one pass, no per-column expand; accuracy
    characterized in tests/test_approx.py)."""
    li = table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count("*").alias(f"{c}__n"),
            (F.count("*") - F.count(c)).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            r6(F.min(c)).alias(f"{c}__mn"),
            r6(F.max(c)).alias(f"{c}__mx"),
            r6(F.avg(c)).alias(f"{c}__av"),
        ]
    one = li.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__n, {c}__nn, {c}__nd, {c}__mn, {c}__mx, {c}__av"
        for c in _PROFILE_COLS
    )
    return one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack}) AS "
            "(column_name, n_rows, n_null, n_distinct, min_v, max_v, mean_v)"
        )
    )


@q(
    "q_equidepth_histogram",
    """
    WITH r AS (
      SELECT l_extendedprice AS v,
             ntile(8) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber)
               AS bucket
      FROM lineitem
    )
    SELECT bucket, count(*) AS n,
           round(min(v), 6) AS lo, round(max(v), 6) AS hi
    FROM r GROUP BY 1
    """,
)
def q_equidepth_histogram(spark, sf_dir):
    """Equi-DEPTH histogram of l_extendedprice (8 buckets of equal row
    count — the optimizer-statistics histogram, where equal-WIDTH
    buckets like a10_histogram collapse under skew). Bucket membership
    is exact ntile(8) semantics via rank.global_ntile: range-partitioned
    global row_number + integer bucket arithmetic — NO single-partition
    window at any row count, unlike the oracle's plain ntile, which is
    the one-box spelling of the same statistic. Output is |buckets|
    rows: per bucket the row count (equal ±1 by construction) and the
    exact [lo, hi] value bounds."""
    from ..operators.rank import global_ntile

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v"), "l_orderkey", "l_linenumber"
    )
    tiled = global_ntile(
        li, [F.col("v"), F.col("l_orderkey"), F.col("l_linenumber")], 8, "bucket"
    )
    return tiled.groupBy("bucket").agg(
        F.count("*").alias("n"),
        r6(F.min("v")).alias("lo"),
        r6(F.max("v")).alias("hi"),
    )


_PROFILE_APPROX_ORACLE = (
    """
    WITH stacked AS (
    """
    + "\nUNION ALL\n".join(
        f"SELECT '{c}' AS column_name, CAST({c} AS DOUBLE) AS v FROM lineitem"
        for c in _PROFILE_COLS
    )
    + """
    ),
    q AS (
      SELECT column_name, CAST(floor(v * 1000000.0 + 0.5) AS BIGINT) AS qv
      FROM stacked WHERE v IS NOT NULL
    ),
    h AS (
      SELECT column_name,
             ('0x' || substr(md5(qv::VARCHAR), 1, 12))::BIGINT AS h
      FROM q
    ),
    b AS (SELECT column_name, h >> 40 AS idx, h % 1099511627776 AS w FROM h),
    r AS (
      SELECT column_name, idx,
             max(CASE WHEN w = 0 THEN 41 ELSE 41 - length(bin(w)) END) AS m_rho
      FROM b GROUP BY 1, 2
    ),
    s AS (
      SELECT column_name, sum(power(2.0, -m_rho)) AS s_nz, count(*) AS nz
      FROM r GROUP BY 1
    ),
    est AS (
      SELECT column_name,
             round(CASE WHEN ((0.7213 / (1 + 1.079 / 256.0)) * 256.0) * 256.0
                               / (s_nz + (256 - nz)) <= 640.0
                         AND nz < 256
                        THEN 256.0 * ln(256.0 / (256 - nz))
                        ELSE ((0.7213 / (1 + 1.079 / 256.0)) * 256.0) * 256.0
                               / (s_nz + (256 - nz)) END, 2) AS est_distinct
      FROM s
    ),
    ex AS (
    """
    + "\nUNION ALL\n".join(
        f"""
        SELECT '{c}' AS column_name, count(*) AS n_rows,
               count(*) - count({c}) AS n_null,
               round(min({c}), 6) AS min_v, round(max({c}), 6) AS max_v,
               round(avg({c}), 6) AS mean_v
        FROM lineitem
        """
        for c in _PROFILE_COLS
    )
    + """
    )
    SELECT ex.column_name, ex.n_rows, ex.n_null, est.est_distinct,
           ex.min_v, ex.max_v, ex.mean_v
    FROM ex JOIN est USING (column_name)
    """
)


@q("q_profile_table_approx", _PROFILE_APPROX_ORACLE)
def q_profile_table_approx(spark, sf_dir):
    """The 100 TB twin of q_profile_table: identical exact stats
    (rows/nulls/min/max/mean from ONE aggregate — no distinct, so no
    Expand), with the NDV column swapped from count(DISTINCT) to the
    from-scratch HLL sketch (operators/sketches.py, p=8). The exact
    query's 4-way Expand shuffles every distinct value and its scan slope
    measured ~2.7× per 100× (SCALING.md); here the stack-unpivoted values
    partial-aggregate map-side to ≤ |cols|·256 register rows per
    partition, so the shuffle is CONSTANT-sized in the row count — the
    profile every large ingest can afford. Values are micro-quantized
    (×1e6, round-half-up — injective for these ≤2-decimal columns) to
    BIGINT before hashing so the md5-based hash is byte-identical across
    engines, making this APPROXIMATE sketch exactly reproducible by the
    DuckDB oracle (same falsifiability bar as q_hll_distinct). Standard
    HLL error at p=8 is ~1.04/√256 ≈ 6.5 %; the exact-NDV twin remains
    registered for parity-critical profiling."""
    from ..operators.sketches import hll_estimate, hll_registers

    li = table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count("*").alias(f"{c}__n"),
            (F.count("*") - F.count(c)).alias(f"{c}__nn"),
            r6(F.min(c)).alias(f"{c}__mn"),
            r6(F.max(c)).alias(f"{c}__mx"),
            r6(F.avg(c)).alias(f"{c}__av"),
        ]
    one = li.agg(*aggs)
    stack_ex = ", ".join(
        f"'{c}', {c}__n, {c}__nn, {c}__mn, {c}__mx, {c}__av" for c in _PROFILE_COLS
    )
    exact = one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_ex}) AS "
            "(column_name, n_rows, n_null, min_v, max_v, mean_v)"
        )
    )
    stack_v = ", ".join(f"'{c}', CAST({c} AS DOUBLE)" for c in _PROFILE_COLS)
    stacked = li.select(
        F.expr(f"stack({len(_PROFILE_COLS)}, {stack_v}) AS (column_name, v)")
    ).where(F.col("v").isNotNull())
    quant = stacked.select(
        "column_name",
        F.floor(F.col("v") * F.lit(1000000.0) + F.lit(0.5)).cast("bigint").alias("qv"),
    )
    # HLL registers depend only on the DISTINCT value set (max(rho) per
    # register is duplicate-invariant), so dedup the cheap quantized
    # BIGINTs BEFORE the md5-dense register pass (round 9, guide §1.2
    # "don't compute what you throw away"): low-NDV columns (discount,
    # tax, quantity) collapse to dozens of hashed values instead of one
    # md5 per row, and the map-side-combined (column_name, qv) distinct
    # shuffle replaces the round-robin repartition this branch previously
    # needed for fan-out (same single exchange, strictly less hashing).
    quant = quant.distinct()
    regs = hll_registers(quant, "qv", ["column_name"], p=8)
    est = hll_estimate(regs, ["column_name"], p=8).select("column_name", "est_distinct")
    return exact.join(F.broadcast(est), "column_name").select(
        "column_name", "n_rows", "n_null", "est_distinct", "min_v", "max_v", "mean_v"
    )




@q(
    "q_nb_langid",
    f"""
    WITH dt AS (
      SELECT doc_id, lang, unnest({_TOK_SQL}) AS tok FROM documents
    ),
    tc AS (SELECT lang AS label, tok, count(*) AS cnt FROM dt GROUP BY 1, 2),
    ct AS (
      SELECT lang AS label, count(*) AS n_docs,
             CAST(sum(len({_TOK_SQL})) AS BIGINT) AS n_tok
      FROM documents GROUP BY 1
    ),
    v AS (SELECT count(DISTINCT tok) AS vocab FROM dt),
    tot AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS total FROM ct),
    base AS (
      SELECT label, ln(n_docs / total) AS prior_ln,
             ln(n_tok + vocab) AS denom_ln
      FROM ct, v, tot
    ),
    nd AS (SELECT doc_id, len({_TOK_SQL}) AS n_d FROM documents),
    hits AS (
      SELECT dt.doc_id, tc.label, sum(ln(tc.cnt + 1.0)) AS hit_sum
      FROM dt JOIN tc ON dt.tok = tc.tok
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT nd.doc_id, base.label,
             base.prior_ln + coalesce(hits.hit_sum, 0.0)
               - nd.n_d * base.denom_ln AS score
      FROM nd CROSS JOIN base
      LEFT JOIN hits ON hits.doc_id = nd.doc_id AND hits.label = base.label
    )
    SELECT doc_id, label AS pred_label, round(score, 6) AS score
    FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, label ASC) AS rn
      FROM scored
    ) WHERE rn = 1
    """,
)
def q_nb_langid(spark, sf_dir):
    """Multinomial Naive Bayes language identifier — train on the corpus
    (label = lang), classify every document
    (operators/classifier.py::nb_train/nb_classify). The learned twin of
    the heuristic txt_langid: per-(label, token) Laplace-smoothed counts
    built in ONE map-side-combined aggregate (the model IS a table,
    never collected — only |vocab| is a driver scalar), scoring is one
    token-keyed equi-join + per-doc argmax over |labels| rows. The
    oracle replays the identical formula (ln prior + Σ ln(c+1) −
    n·ln(N+V)); language token sets barely overlap so argmax margins
    are orders of magnitude above the 6-dp canon. Engine addition —
    the reference has no model ops."""
    from ..operators.classifier import nb_classify, nb_train

    docs = ptable(spark, sf_dir)
    tc, ct, v = nb_train(docs, "lang")
    out = nb_classify(docs, tc, ct, v)
    return out.select("doc_id", "pred_label", r6(F.col("score")).alias("score"))


@q(
    "txt_url_canon",
    """
    WITH u AS (
      SELECT doc_id,
             (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'httpS' END)
             || '://WWW.Site' || CAST(doc_id % 40 AS VARCHAR) || '.Example.COM'
             || (CASE doc_id % 3
                   WHEN 0 THEN (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END)
                   WHEN 1 THEN ':8080' ELSE '' END)
             || (CASE WHEN doc_id % 5 = 0 THEN '' ELSE '/A/b' || CAST(doc_id % 5 AS VARCHAR) END)
             || '?z=1&a=' || CAST(doc_id % 7 AS VARCHAR) || '&m=x'
             || '#sec' || CAST(doc_id % 4 AS VARCHAR) AS url
      FROM documents
    ),
    c AS (
      SELECT doc_id, url,
             lower(CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'httpS' END) AS scheme,
             'site' || CAST(doc_id % 40 AS VARCHAR) || '.example.com' AS host,
             CASE WHEN doc_id % 3 = 1 THEN ':8080' ELSE '' END AS port,
             CASE WHEN doc_id % 5 = 0 THEN '/'
                  ELSE '/A/b' || CAST(doc_id % 5 AS VARCHAR) END AS path,
             'a=' || CAST(doc_id % 7 AS VARCHAR) || '&m=x&z=1' AS q
      FROM u
    )
    SELECT doc_id,
           scheme || '://' || host || port || path || '?' || q AS canon_url,
           host,
           'example.com' AS domain
    FROM c
    """,
)
def txt_url_canon(spark, sf_dir):
    """URL canonicalization (operators/text.py::canonicalize_url) — the
    web-corpus dedup key: lower-cased scheme/host, www. stripped,
    default ports dropped (:80 http / :443 https kept when non-default),
    empty path → '/', query params sorted, fragment dropped, plus the
    naive registrable domain. The Spark side PARSES messy synthesized
    URLs (mixed case, default/explicit ports, missing paths, unsorted
    params, fragments) with codegen regexes; the oracle CONSTRUCTS the
    expected canonical form directly from the same doc_id arithmetic —
    parser vs constructor, not regex vs regex, so a parsing bug cannot
    cancel out. Zero shuffle, exact string equality."""
    docs = ptable(spark, sf_dir)
    d = F.col("doc_id")

    def s(c):
        return c.cast("string")

    url = F.concat(
        F.when(d % 2 == 0, F.lit("HTTP")).otherwise(F.lit("httpS")),
        F.lit("://WWW.Site"), s(d % 40), F.lit(".Example.COM"),
        F.when(d % 3 == 0, F.when(d % 2 == 0, F.lit(":80")).otherwise(F.lit(":443")))
        .when(d % 3 == 1, F.lit(":8080"))
        .otherwise(F.lit("")),
        F.when(d % 5 == 0, F.lit("")).otherwise(F.concat(F.lit("/A/b"), s(d % 5))),
        F.lit("?z=1&a="), s(d % 7), F.lit("&m=x"),
        F.lit("#sec"), s(d % 4),
    )
    from ..operators.text import canonicalize_url

    cols = canonicalize_url(url)
    return docs.select(
        "doc_id",
        cols["canon_url"].alias("canon_url"),
        cols["host"].alias("host"),
        cols["domain"].alias("domain"),
    )


@q(
    "txt_html_extract",
    """
    SELECT doc_id,
           'Doc ' || CAST(doc_id AS VARCHAR) || chr(10)
           || 'Head ' || CAST(doc_id % 10 AS VARCHAR) || chr(10)
           || text || chr(10)
           || 'Tail & x <y> ''q'' z' AS extracted
    FROM documents
    """,
)
def txt_html_extract(spark, sf_dir):
    """HTML → visible text (operators/text.py::html_extract): the Spark
    side WRAPS each document in a realistic messy page (script with an
    embedded '<', style, comment, title/h1/p blocks, double-encoded and
    plain entities, &nbsp;) and extracts; the oracle CONSTRUCTS the
    expected text directly from doc_id + the clean corpus text —
    parser vs constructor, so an extraction bug cannot cancel out.
    Codegen regexp chain, zero shuffle, exact string equality."""
    from ..operators.text import html_extract

    docs = ptable(spark, sf_dir)
    d = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><head><script type=\"text/javascript\">var x = 1 < 2;</script>"),
        F.lit("<style>.a{color:red}</style><title>Doc "), d,
        F.lit("</title></head><body><!-- boilerplate --><h1 class=\"t\">Head "),
        (F.col("doc_id") % 10).cast("string"),
        F.lit("</h1><p>"), F.col("text"),
        F.lit("</p><p>Tail &amp; x &lt;y&gt; &#39;q&#39;&nbsp;z</p></body></html>"),
    )
    return docs.select("doc_id", html_extract(html).alias("extracted"))


@q(
    "mm_warc_records",
    """
    SELECT doc_id AS media_id, 0 AS rec_idx, 'warcinfo' AS warc_type,
           CAST(NULL AS VARCHAR) AS target_uri,
           CAST(strlen('software: seaexplorertools_spark') AS BIGINT) AS content_length,
           'software: seaexplorertools_spark' AS body
    FROM documents
    UNION ALL
    SELECT doc_id, 1, 'response',
           'http://site' || CAST(doc_id % 40 AS VARCHAR)
             || '.example.com/doc/' || CAST(doc_id AS VARCHAR),
           CAST(strlen(text) AS BIGINT), text
    FROM documents
    """,
)
def mm_warc_records(spark, sf_dir):
    """WARC ingest (operators/warc.py): per document a real ISO-28500
    WARC file — warcinfo + response records, target URI and body
    closed-form in (doc_id, text) — with ODD doc_ids emitted as
    per-record multi-member gzip (the Common Crawl layout) and even
    ones plain, so the transparent gunzip path and the Content-Length
    record walk are BOTH driver-checked exactly (gzip is lossless).
    Bodies are consumed by Content-Length, never scanned, so body bytes
    containing 'WARC/1.0' cannot desynchronize the walk. mapInPandas
    explode, zero shuffle."""
    from ..operators.warc import documents_as_warc, warc_records

    media = documents_as_warc(ptable(spark, sf_dir))
    return warc_records(media)


# Interpolated Kneser–Ney bigram scaffold (operators/lm.py::train_kn_bigram)
# — context totals/continuation counts all derive from the bigram table,
# exactly as the Spark side computes them, and the discount D uses the
# Ney–Essen–Kneser counts-of-counts estimate with the same 0.75 fallback.
_KN_SQL = f"""
    tk AS (SELECT doc_id, {_TOK_SQL} AS toks FROM documents),
    idx AS (SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks) - 1)) AS i FROM tk),
    bgr AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM idx),
    bc AS (SELECT w1, w2, count(*) AS c12 FROM bgr GROUP BY w1, w2),
    ctx AS (SELECT w1, sum(c12) AS c1, count(*) AS n_follow
            FROM bc GROUP BY w1),
    cont AS (SELECT w2, count(*) AS n_prec FROM bc GROUP BY w2),
    sc AS (
      SELECT n_types, n1, n2,
             CASE WHEN n1 + 2 * n2 > 0
                  THEN CAST(n1 AS DOUBLE) / (n1 + 2 * n2)
                  ELSE 0.75 END AS d
      FROM (SELECT count(*) AS n_types,
                   sum(CASE WHEN c12 = 1 THEN 1 ELSE 0 END) AS n1,
                   sum(CASE WHEN c12 = 2 THEN 1 ELSE 0 END) AS n2
            FROM bc)
    ),
    knscore AS (
      SELECT b.doc_id, count(*) AS n_bigrams,
             avg(-ln(greatest(bc.c12 - sc.d, 0.0) / ctx.c1
                     + sc.d * ctx.n_follow / ctx.c1
                       * (cont.n_prec / CAST(sc.n_types AS DOUBLE)))) AS xent
      FROM bgr b JOIN bc USING (w1, w2) JOIN ctx USING (w1)
      JOIN cont USING (w2) CROSS JOIN sc
      GROUP BY b.doc_id
    )
"""


@q(
    "lm_kn_xent",
    f"WITH {_KN_SQL} SELECT doc_id, n_bigrams, round(xent, 6) AS xent"
    " FROM knscore",
)
def lm_kn_xent(spark, sf_dir):
    """Interpolated Kneser–Ney bigram cross-entropy per document
    (operators/lm.py::train_kn_bigram/score_cross_entropy_kn — the
    smoothing KenLM implements, i.e. the LM CCNet-style perplexity
    gates actually run, upgrading the add-one lane ``lm_bigram_xent``):
    absolute discount D from the counts-of-counts estimate, continuation
    probability N1+(·,w2)/N1+(··) as the lower-order distribution. All
    model tables are bigram-vocab-sized map-side-combined aggregates;
    scoring is three broadcast joins + one broadcast scalars row; the
    only doc-keyed shuffle is the final per-doc average. The oracle
    replays the identical count algebra and formula association in SQL;
    scores meet at 6 dp."""
    from ..operators.lm import score_cross_entropy_kn, train_kn_bigram

    docs = ptable(spark, sf_dir)
    bc, ctx, cont, scalars = train_kn_bigram(docs)
    scored = score_cross_entropy_kn(docs, bc, ctx, cont, scalars)
    return scored.select("doc_id", "n_bigrams", r6(F.col("xent")).alias("xent"))


@q(
    "lm_kn_model",
    f"""
    WITH {_KN_SQL}
    SELECT CAST(sc.n_types AS BIGINT) AS n_types,
           CAST(sc.n1 AS BIGINT) AS n1, CAST(sc.n2 AS BIGINT) AS n2,
           round(sc.d, 6) AS d,
           (SELECT CAST(count(*) AS BIGINT) FROM ctx) AS n_contexts,
           (SELECT CAST(count(*) AS BIGINT) FROM cont) AS n_continuations,
           (SELECT CAST(max(c1) AS BIGINT) FROM ctx) AS max_context_total
    FROM sc
    """,
)
def lm_kn_model(spark, sf_dir):
    """Kneser–Ney model report (single row): bigram type count, the
    counts-of-counts n1/n2, the estimated discount D, context /
    continuation vocabulary sizes and the heaviest context total — the
    numbers one checks before trusting a perplexity gate (a D near 1
    or a single dominating context flags a degenerate corpus). One
    aggregate over the bigram table + two tiny table counts."""
    from ..operators.lm import train_kn_bigram

    docs = ptable(spark, sf_dir)
    bc, ctx, cont, scalars = train_kn_bigram(docs)
    n_ctx = ctx.agg(
        F.count("*").cast("long").alias("n_contexts"),
        F.max("c1").cast("long").alias("max_context_total"),
    )
    n_cont = cont.agg(F.count("*").cast("long").alias("n_continuations"))
    return (
        scalars.select(
            "n_types", "n1", "n2", r6(F.col("d")).alias("d")
        )
        .crossJoin(F.broadcast(n_ctx))
        .crossJoin(F.broadcast(n_cont))
        .select(
            "n_types", "n1", "n2", "d",
            "n_contexts", "n_continuations", "max_context_total",
        )
    )
