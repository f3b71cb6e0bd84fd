"""Scale-path operators: skew-safe aggregation, JSON/variant, graph,
privacy, time-range frames (batch 6, part 1).

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
from .llm_core import _SHINGLE_SQL, _TOK_SQL  # noqa: F401


# Batch 6 — skew-safe aggregation, JSON extraction, time-range frames
# ---------------------------------------------------------------------------

from ..operators.skew import salted_sum_count  # noqa: E402


@q(
    "q_salted_agg",
    """
    SELECT event_type, round(sum(value), 6) AS sum_v, count(value) AS n
    FROM events GROUP BY event_type
    """,
)
def q_salted_agg(spark, sf_dir):
    """Skew-safe two-phase salted aggregation — result identical to a plain
    groupBy (the oracle), plan splits the hot key across n_salts reducers
    before merging. The salt column derives from event_id (deterministic)."""
    ev = events(spark, sf_dir)
    out = salted_sum_count(
        ev, ["event_type"], "value", n_salts=16, salt_from="event_id"
    )
    return out.select("event_type", r6(F.col("sum_v")).alias("sum_v"), "n")


@q(
    "q_json_extract",
    """
    SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           count(*) OVER (PARTITION BY CAST(json_extract(props, '$.k') AS BIGINT)) AS n_same_k
    FROM events
    """,
)
def q_json_extract(spark, sf_dir):
    """Semi-structured column handling: JSON field extraction from the
    events ``props`` payload + a per-value frequency window."""
    ev = events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    ev = ev.withColumn("k", k)
    return ev.select(
        "event_id", "k", F.count("*").over(Window.partitionBy("k")).alias("n_same_k")
    )


@q(
    "q_variant_extract",
    """
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
           count(*) AS n,
           round(avg(value), 6) AS avg_value
    FROM events
    WHERE json_extract(props, '$.k') IS NOT NULL
    GROUP BY 1
    """,
)
def q_variant_extract(spark, sf_dir):
    """Spark 4 VARIANT twin of q_json_extract: ``parse_json`` converts the
    props payload to the binary semi-structured VARIANT type ONCE, then
    ``variant_get`` does typed path access — at scale the parse cost is
    paid once per row instead of once per extracted field, and the binary
    encoding shreds/prunes where repeated ``get_json_object`` re-parses
    the string per call. Readout: per k%10 bucket counts + mean value."""
    ev = events(spark, sf_dir)
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "bigint")
    return (
        ev.withColumn("__k", k)
        .filter(F.col("__k").isNotNull())
        .groupBy((F.col("__k") % 10).alias("k_mod"))
        .agg(F.count("*").alias("n"), r6(F.avg("value")).alias("avg_value"))
    )


@q(
    "q_range_frame_trailing",
    """
    SELECT event_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 6) AS trailing_1h_sum,
           count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS trailing_1h_n
    FROM events
    """,
)
def q_range_frame_trailing(spark, sf_dir):
    """Time-based RANGE frame: trailing 1-hour sum/count per user — the
    value-range window (vs W1's row-count frame). At scale this is the
    hot-path form of 'rolling metrics over event time'."""
    ev = events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3600000000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        r6(F.sum("value").over(w)).alias("trailing_1h_sum"),
        F.count("*").over(w).alias("trailing_1h_n"),
    )


def _ivf_oracle_sql(
    n_cells: int = 8, nprobe: int = 6, k: int = 5, dim: int = 64,
    sample_n: int = 1024, iters: int = 10,
) -> str:
    """DuckDB replay of similarity.ivf_topk INCLUDING its k-means
    training: md5-ordered sample, lowest-id init, ``iters`` unrolled
    Lloyd rounds with 6-dp rounded cosine assignment (ties → lowest
    cell), then full-table assignment, nprobe multi-probe, candidate
    equi-join and 6-dp cosine re-rank — every comparison the engine
    makes is on rounded values, so the whole approximate path is
    EXACTLY replayable (upgraded from rows-only in round 5; the
    q_kmeans_iterate unrolled-CTE pattern applied to the trainer)."""
    parts = [f"""WITH cells AS MATERIALIZED (
      SELECT vec_id, r.range + 1 AS pos1,
             CAST(embedding[r.range + 1] AS DOUBLE) AS val
      FROM embeddings CROSS JOIN range({dim}) r
    ),
    vnorm AS MATERIALIZED (SELECT vec_id, sqrt(SUM(val * val)) AS nrm FROM cells GROUP BY vec_id),
    samp AS MATERIALIZED (
      SELECT vec_id FROM (
        SELECT vec_id, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
        FROM embeddings
      ) WHERE rk <= {sample_n}
    ),
    xs AS MATERIALIZED (
      SELECT c.vec_id AS id, c.pos1, c.val / v.nrm AS xval
      FROM cells c JOIN vnorm v USING (vec_id) JOIN samp s ON s.vec_id = c.vec_id
    ),
    xn AS MATERIALIZED (SELECT id, sqrt(SUM(xval * xval)) AS xn FROM xs GROUP BY id),
    cent0 AS MATERIALIZED (
      SELECT CAST(dense_rank() OVER (ORDER BY id) - 1 AS BIGINT) AS c_id, pos1, xval AS cval
      FROM xs WHERE id IN (SELECT id FROM (SELECT DISTINCT id FROM xs) ORDER BY id LIMIT {n_cells})
    )"""]
    prev = "cent0"
    for t in range(1, iters + 1):
        parts.append(f"""cn{t} AS MATERIALIZED (SELECT c_id, sqrt(SUM(cval * cval)) AS cn FROM {prev} GROUP BY c_id),
    dt{t} AS MATERIALIZED (
      SELECT xs.id, p.c_id, SUM(xs.xval * p.cval) AS dp
      FROM xs JOIN {prev} p USING (pos1) GROUP BY xs.id, p.c_id
    ),
    asg{t} AS MATERIALIZED (
      SELECT id, c_id FROM (
        SELECT dt{t}.id, dt{t}.c_id,
               row_number() OVER (
                 PARTITION BY dt{t}.id
                 ORDER BY round(dp / (xn.xn * cn{t}.cn), 6) DESC, dt{t}.c_id
               ) AS rn
        FROM dt{t} JOIN xn USING (id) JOIN cn{t} USING (c_id)
      ) WHERE rn = 1
    ),
    mean{t} AS MATERIALIZED (
      SELECT asg{t}.c_id, xs.pos1, AVG(xs.xval) AS cval
      FROM asg{t} JOIN xs USING (id) GROUP BY 1, 2
    ),
    cent{t} AS MATERIALIZED (
      SELECT p.c_id, p.pos1, COALESCE(m.cval, p.cval) AS cval
      FROM {prev} p LEFT JOIN mean{t} m ON m.c_id = p.c_id AND m.pos1 = p.pos1
    )""")
        prev = f"cent{t}"
    parts.append(f"""cnF AS MATERIALIZED (SELECT c_id, sqrt(SUM(cval * cval)) AS cn FROM {prev} GROUP BY c_id),
    dotsF AS MATERIALIZED (
      SELECT cells.vec_id, p.c_id, SUM(cells.val * p.cval) AS dp
      FROM cells JOIN {prev} p USING (pos1) GROUP BY 1, 2
    ),
    simsF AS MATERIALIZED (
      SELECT d.vec_id, d.c_id, round(d.dp / (v.nrm * c.cn), 6) AS sim
      FROM dotsF d JOIN vnorm v USING (vec_id) JOIN cnF c USING (c_id)
    ),
    acell AS MATERIALIZED (
      SELECT vec_id AS nbr_id, c_id AS cell FROM (
        SELECT vec_id, c_id, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, c_id) AS rn
        FROM simsF
      ) WHERE rn = 1
    ),
    probe AS MATERIALIZED (
      SELECT vec_id AS query_id, c_id AS cell FROM (
        SELECT vec_id, c_id, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, c_id) AS rn
        FROM simsF WHERE vec_id < 10
      ) WHERE rn <= {nprobe}
    ),
    cand AS MATERIALIZED (
      SELECT p.query_id, a.nbr_id FROM probe p JOIN acell a USING (cell)
      WHERE a.nbr_id <> p.query_id
    ),
    ev AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scored AS MATERIALIZED (
      SELECT c.query_id, c.nbr_id,
             round(list_dot_product(a.v, b.v)
                   / nullif(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)), 0.0),
                   6) AS sim
      FROM cand c JOIN ev a ON a.vec_id = c.query_id JOIN ev b ON b.vec_id = c.nbr_id
    )
    SELECT query_id, CAST(rn AS INTEGER) AS rank, nbr_id, sim FROM (
      SELECT query_id, nbr_id, sim,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, nbr_id) AS rn
      FROM scored
    ) WHERE rn <= {k}""")
    return ",\n    ".join(parts)


@q("ann_topk_ivf", _ivf_oracle_sql())
def ann_topk_ivf(spark, sf_dir):
    """IVF approximate ANN: sampled spherical-k-means coarse quantizer,
    inverted-list equi-join, nprobe=6 multi-probe — the second scale path
    beside hyperplane LSH; recall@5 ≈ 0.93 vs brute force on this fixture
    (tests/test_similarity_recall.py). The md5 sample, lowest-id init and
    6-dp rounded assignments make the trained quantizer itself
    deterministic and portable, so the oracle UNROLLS the 10 Lloyd
    training rounds in SQL and replays the probe/re-rank EXACTLY —
    upgraded from rows-only in round 5."""
    from ..operators.similarity import ivf_topk

    e = table(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("query_id"), "embedding")
    return ivf_topk(e, qs, n_cells=8, nprobe=6, k=5)


@q(
    "dd_dedup_pipeline",
    f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, tok FROM ({_SHINGLE_SQL})
    ),
    sig AS (
      SELECT doc_id, s.seed, min(md5(s.seed::VARCHAR || ':' || md5(tok))) AS mh
      FROM toks CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS seed) s
      GROUP BY doc_id, s.seed
    ),
    bands AS (
      SELECT doc_id, seed // 4 AS band, string_agg(mh, '|' ORDER BY seed) AS bsig
      FROM sig GROUP BY doc_id, seed // 4
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
      FROM bands a JOIN bands b ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
    inter AS (
      SELECT c.doc1, c.doc2, count(*) AS n_inter
      FROM cand c JOIN toks ta ON ta.doc_id = c.doc1 JOIN toks tb
        ON tb.doc_id = c.doc2 AND tb.tok = ta.tok
      GROUP BY c.doc1, c.doc2
    )
    SELECT c.doc1, c.doc2,
           round(CAST(coalesce(i.n_inter, 0) AS DOUBLE)
                 / nullif(CAST(sa.sz + sb.sz - coalesce(i.n_inter, 0) AS DOUBLE), 0.0), 6)
             AS jaccard,
           (CAST(coalesce(i.n_inter, 0) AS DOUBLE)
            / nullif(CAST(sa.sz + sb.sz - coalesce(i.n_inter, 0) AS DOUBLE), 0.0)) >= 0.8
             AS is_duplicate
    FROM cand c
    LEFT JOIN inter i ON i.doc1 = c.doc1 AND i.doc2 = c.doc2
    JOIN sizes sa ON sa.doc_id = c.doc1
    JOIN sizes sb ON sb.doc_id = c.doc2
    """,
)
def dd_dedup_pipeline(spark, sf_dir):
    """End-to-end near-dup pipeline: shingle-MinHash-LSH candidate
    generation → exact shingle-Jaccard verification → duplicate verdict.
    The canonical two-stage dedup (cheap recall stage, exact precision
    stage) as ONE lineage; candidates bound the expensive exact join."""
    from ..operators.dedup import jaccard_on_pairs, lsh_candidate_pairs

    docs = ptable(spark, sf_dir)
    cand = lsh_candidate_pairs(docs, k=16, band_rows=4)
    out = jaccard_on_pairs(docs, cand, use_shingles=True)
    return out.select(
        "doc1",
        "doc2",
        r6(F.col("jaccard")).alias("jaccard"),
        (F.col("jaccard") >= 0.8).alias("is_duplicate"),
    )


@q(
    "dd_dup_clusters",
    f"""
    WITH RECURSIVE pairs AS ({ORACLES["dd_dedup_pipeline"]}),
    sym AS (
      SELECT doc1 AS a, doc2 AS b FROM pairs WHERE is_duplicate
      UNION
      SELECT doc2 AS a, doc1 AS b FROM pairs WHERE is_duplicate
    ),
    reach(node, x) AS (
      SELECT a, a FROM sym
      UNION
      SELECT r.node, s.b FROM reach r JOIN sym s ON s.a = r.x
    )
    SELECT node AS doc_id, min(x) AS cluster_id, (node = min(x)) AS keep
    FROM reach GROUP BY node
    """,
)
def dd_dup_clusters(spark, sf_dir):
    """Dedup endgame: verified duplicate PAIRS → transitive CLUSTERS →
    keep/drop decisions. Connected components over the is_duplicate graph
    via iterative min-label propagation (operators/graph.py) — cluster_id
    is the component's minimum doc id, ``keep`` marks the canonical
    survivor. The oracle is a DuckDB recursive CTE over the same pipeline
    SQL, so the whole chain (LSH recall → Jaccard precision → closure) is
    exactly checked."""
    from ..operators.dedup import jaccard_on_pairs, lsh_candidate_pairs
    from ..operators.graph import dup_clusters

    docs = ptable(spark, sf_dir)
    cand = lsh_candidate_pairs(docs, k=16, band_rows=4)
    jac = jaccard_on_pairs(docs, cand, use_shingles=True)
    return dup_clusters(jac.filter(F.col("jaccard") >= 0.8))


@q(
    "dd_canonical_pick",
    f"""
    WITH RECURSIVE pairs AS ({ORACLES["dd_dedup_pipeline"]}),
    sym AS (
      SELECT doc1 AS a, doc2 AS b FROM pairs WHERE is_duplicate
      UNION
      SELECT doc2 AS a, doc1 AS b FROM pairs WHERE is_duplicate
    ),
    reach(node, x) AS (
      SELECT a, a FROM sym
      UNION
      SELECT r.node, s.b FROM reach r JOIN sym s ON s.a = r.x
    ),
    cl AS (SELECT node AS doc_id, min(x) AS cluster_id FROM reach GROUP BY node),
    j AS (SELECT cl.cluster_id, cl.doc_id, d.n_chars
          FROM cl JOIN documents d USING (doc_id)),
    r AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
                                       ORDER BY n_chars DESC, doc_id ASC) AS rn
          FROM j)
    SELECT cluster_id, doc_id AS canonical_id, n_chars FROM r WHERE rn = 1
    """,
)
def dd_canonical_pick(spark, sf_dir):
    """Content-aware canonical selection per duplicate cluster: keep the
    LONGEST member (ties → lowest doc id) rather than the min-id member —
    the policy real corpus dedup uses (longest version of a boilerplate
    family retains the most content). Cluster membership is tiny relative
    to the corpus, so the docs join is the only wide touch."""
    from ..operators.dedup import jaccard_on_pairs, lsh_candidate_pairs
    from ..operators.graph import dup_clusters

    docs = ptable(spark, sf_dir)
    cand = lsh_candidate_pairs(docs, k=16, band_rows=4)
    jac = jaccard_on_pairs(docs, cand, use_shingles=True)
    cl = dup_clusters(jac.filter(F.col("jaccard") >= 0.8))
    j = cl.select("doc_id", "cluster_id").join(
        docs.select("doc_id", "n_chars"), "doc_id"
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        j.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("cluster_id", F.col("doc_id").alias("canonical_id"), "n_chars")
    )


@q(
    "pipe_corpus_prep",
    f"""
    WITH RECURSIVE pairs AS ({ORACLES["dd_dedup_pipeline"]}),
    sym AS (
      SELECT doc1 AS a, doc2 AS b FROM pairs WHERE is_duplicate
      UNION
      SELECT doc2 AS a, doc1 AS b FROM pairs WHERE is_duplicate
    ),
    reach(node, x) AS (
      SELECT a, a FROM sym
      UNION
      SELECT r.node, s.b FROM reach r JOIN sym s ON s.a = r.x
    ),
    nd_losers AS (SELECT node AS doc_id FROM reach GROUP BY node HAVING node <> min(x)),
    ex AS (SELECT doc_id, row_number() OVER (PARTITION BY md5(substr(text, 1, 40))
                                             ORDER BY doc_id) AS rn
           FROM documents),
    ex_losers AS (SELECT doc_id FROM ex WHERE rn > 1),
    sh AS (SELECT DISTINCT doc_id, tok FROM ({_SHINGLE_SQL})),
    hold AS (SELECT DISTINCT tok FROM sh WHERE doc_id % 50 = 0),
    contam AS (SELECT t.doc_id FROM sh t JOIN hold h ON t.tok = h.tok
               WHERE t.doc_id % 50 <> 0
               GROUP BY t.doc_id HAVING count(DISTINCT t.tok) >= 3),
    lid AS (SELECT doc_id, lang_guess FROM ({ORACLES["txt_langid"]})),
    qual AS (SELECT doc_id, n_tokens, ttr FROM ({ORACLES["txt_quality"]}))
    SELECT d.doc_id, l.lang_guess, q.n_tokens, q.ttr
    FROM documents d
    JOIN lid l ON l.doc_id = d.doc_id
    JOIN qual q ON q.doc_id = d.doc_id
    WHERE l.lang_guess <> 'und' AND q.n_tokens >= 25 AND q.ttr >= 0.35
      AND d.doc_id % 50 <> 0
      AND NOT EXISTS (SELECT 1 FROM ex_losers x WHERE x.doc_id = d.doc_id)
      AND NOT EXISTS (SELECT 1 FROM nd_losers n WHERE n.doc_id = d.doc_id)
      AND NOT EXISTS (SELECT 1 FROM contam c WHERE c.doc_id = d.doc_id)
    """,
)
def pipe_corpus_prep(spark, sf_dir):
    """FLAGSHIP COMPOSITION — the full training-corpus preparation pipeline
    (language-ID → quality gate → eval-slice exclusion → exact dedup →
    LSH near-dup removal → decontamination) as ONE lazy DAG, checked
    end-to-end against a single SQL statement chaining the same stages'
    oracles. See pipeline/corpus.py for the scale rationale (independent
    drop-sets + broadcast anti-joins, not sequential re-filters)."""
    from ..pipeline.corpus import corpus_prep

    out = corpus_prep(ptable(spark, sf_dir))
    return out.select(
        "doc_id",
        "lang_guess",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "ttr",
    )


@q(
    "q_stratified_sample",
    """
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               / 4294967296.0 AS u
      FROM documents
    )
    WHERE u < CASE lang WHEN 'en' THEN 0.3 WHEN 'zh' THEN 0.8 ELSE 0.5 END
    """,
)
def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling (training-data rebalancing):
    per-language hash-threshold fractions — downsample dominant 'en' to
    0.3, upweight 'zh' to 0.8, 0.5 elsewhere. A pure map-side filter from
    md5(doc_id): reproducible across runs/engines (the oracle recomputes
    the identical draw), no RNG state, no shuffle — unlike df.sample(),
    whose per-partition RNG changes under repartitioning."""
    from ..operators.sampling import stratified_sample

    # plain table(): this lane is a pure map-side filter/aggregate —
    # the ptable fan-out shuffle measured NEGATIVE here (r9 A/B) and
    # tests/test_plans.py pins the zero-extra-exchange shape
    docs = table(spark, sf_dir, "documents")
    out = stratified_sample(
        docs, "lang", "doc_id", {"en": 0.3, "zh": 0.8}, default=0.5
    )
    return out.select("doc_id", "lang")


@q(
    "q_reservoir_sample",
    """
    SELECT lang, doc_id, sample_rank FROM (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY ('0x' || substr(md5('rs' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                          / 4294967296.0,
                        doc_id) AS sample_rank
      FROM documents
    ) WHERE sample_rank <= 25
    """,
)
def q_reservoir_sample(spark, sf_dir):
    """Exact-k per-group uniform sampling (operators/sampling.py::
    reservoir_per_group): 25 docs per language, deterministic by
    md5-derived draws — the distributed reservoir-sampling twin. The
    oracle ranks whole groups; the Spark path pre-prunes each group to
    draws below over*k/|group| before the window sort (with an exactness
    patch-up for deficient groups), so a 100 TB group sorts ~4k rows, not
    |group| — and the output is pinned bit-identical to the unpruned
    formulation by this very oracle."""
    from ..operators.sampling import reservoir_per_group

    docs = ptable(spark, sf_dir)
    out = reservoir_per_group(docs, ["lang"], "doc_id", k=25, salt="rs")
    return out.select("lang", "doc_id", "sample_rank")


@q(
    "q_quantile_transform",
    """
    SELECT doc_id, lang, n_chars,
           round(percent_rank() OVER (PARTITION BY lang
                                      ORDER BY n_chars, doc_id), 6) AS qnorm
    FROM documents
    """,
)
def q_quantile_transform(spark, sf_dir):
    """Per-group quantile (rank) normalization — map each doc's length to
    its uniform [0,1] quantile within its language, the distribution-free
    feature scaling a mixed-source corpus needs before thresholding.
    percent_rank over (group) with a doc_id tiebreak is deterministic and
    identical across engines ((rank−1)/(n−1) in both); window is bounded
    by the group, shuffle = one exchange on lang."""
    docs = ptable(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    return docs.select(
        "doc_id", "lang", "n_chars", r6(F.percent_rank().over(w)).alias("qnorm")
    )


@q(
    "q_group_ols",
    """
    WITH pts AS (
      SELECT event_type,
             (epoch_us(ts) - 1704067200000000) / 86400000000.0 AS x,
             value AS y
      FROM events WHERE value IS NOT NULL
    ),
    s AS (
      SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM pts GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           floor(((n * sxy - sx * sy) / (n * sxx - sx * sx)) * 1000000.0 + 0.5)
             / 1000000.0 AS slope,
           floor(((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n)
                 * 1000000.0 + 0.5) / 1000000.0 AS intercept
    FROM s
    """,
)
def q_group_ols(spark, sf_dir):
    """Per-group OLS trend (value vs time) from sufficient statistics —
    ONE aggregate computes (n, Σx, Σy, Σxy, Σx²); slope/intercept are
    closed-form arithmetic on the 5-tuple. x is anchored to a fixed epoch
    and scaled to days BEFORE squaring: raw µs timestamps (~1.7e15)
    squared would burn all 53 mantissa bits and the normal-equation
    subtraction would be catastrophic cancellation — anchoring keeps x in
    [0, 30] where the sums are well-conditioned (same trick any engine
    needs; the oracle replays identical expressions, r6p absorbs sum
    order)."""
    ev = events(spark, sf_dir).filter(F.col("value").isNotNull())
    x = (F.col("ts_us") - F.lit(1704067200000000)) / F.lit(86400000000.0)
    y = F.col("value")
    s = ev.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        r6p(slope).alias("slope"),
        r6p(intercept).alias("intercept"),
    )


@q(
    "q_peak_concurrency",
    """
    WITH b AS (
      SELECT o_orderdate AS t, 1 AS d FROM orders
      UNION ALL
      SELECT o_orderdate + INTERVAL 30 DAY AS t, -1 AS d FROM orders
    ),
    g AS (SELECT t, SUM(d) AS net FROM b GROUP BY t)
    SELECT t, CAST(SUM(net) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS concurrency
    FROM g
    """,
)
def q_peak_concurrency(spark, sf_dir):
    """Open-order concurrency step function over [o_orderdate,
    o_orderdate + 30 d) intervals via the distributed sweep line
    (operators/intervals.py::concurrency_profile): boundary deltas →
    range repartition → per-partition cumsum + broadcast prefix offsets.
    The oracle is the sequential global-window cumsum — equality
    certifies the distributed prefix sum; NO single-partition stage on
    the Spark side (the offset window runs over |partitions| rows)."""
    from ..operators.intervals import concurrency_profile

    iv = table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").alias("s"),
        F.expr("o_orderdate + INTERVAL 30 DAYS").alias("e"),
    )
    return concurrency_profile(iv, "s", "e")


def _rendezvous_oracle_sql() -> str:
    from ..operators.placement import rendezvous_shard_sql

    expr = rendezvous_shard_sql("doc_id", [f"s{i}" for i in range(8)])
    return f"SELECT doc_id, {expr} AS shard FROM documents"


@q("q_rendezvous_shards", _rendezvous_oracle_sql())
def q_rendezvous_shards(spark, sf_dir):
    """Consistent shard placement by rendezvous (HRW) hashing
    (operators/placement.py): every document elects argmax_s md5(doc, s)
    over 8 shards — growing the shard set moves only the stolen 1/(n+1)
    of keys and never moves a key between surviving shards (pinned in
    tests/test_placement.py). Pure map-side expressions, zero shuffle;
    the oracle runs the identical election via struct list_max."""
    from ..operators.placement import rendezvous_shard

    docs = ptable(spark, sf_dir)
    return docs.select(
        "doc_id",
        rendezvous_shard(F.col("doc_id"), [f"s{i}" for i in range(8)]).alias(
            "shard"
        ),
    )


def _j1_cogrouped_twin(spark, sf_dir):
    """§2.9 cogrouped-applyInPandas surface (operators/cogroup.py):
    the SAME J1 interpolation semantics as j1_interp_join, but through
    `cogroup(...).applyInPandas` + np.interp — checked against the SAME
    DuckDB oracle, so the Python batch API is pinned to the JVM
    union+window production path bit-for-bit at 6 dp."""
    from ..operators.cogroup import interp_join_cogrouped

    ev = events(spark, sf_dir)
    samples = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts_us", "value"
    )
    probes = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    out = interp_join_cogrouped(
        samples, probes, on="ts_us", values=["value"],
        partition_by=["user_id"], suffix="_i",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("ts_us").alias("t_us"),
        r6(F.col("value_i")).alias("value_i"),
    )


@q(
    "q_skyline_frontier",
    """
    WITH cust AS (
      SELECT o_custkey AS custkey,
             floor(SUM(o_totalprice) * 1000000.0 + 0.5) / 1000000.0 AS spend,
             count(*) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT custkey, spend, n_orders FROM cust a
    WHERE NOT EXISTS (
      SELECT 1 FROM cust b
      WHERE b.spend >= a.spend AND b.n_orders >= a.n_orders
        AND (b.spend > a.spend OR b.n_orders > a.n_orders)
    )
    """,
)
def q_skyline_frontier(spark, sf_dir):
    """Customer-value Pareto frontier — maximize (total spend, order
    count) — via the two-phase distributed skyline (operators/
    skyline.py::skyline2d: partition-local strict-domination prune, then
    the exact peer-group pass over the surviving local frontiers). The
    oracle is the N² NOT-EXISTS definition: every hash match certifies
    the prune lost nothing. Spend r6p-rounded BEFORE the comparison so
    domination is decided on identical floats in both engines."""
    from ..operators.skyline import skyline2d

    cust = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            r6p(F.sum("o_totalprice")).alias("spend"),
            F.count("*").alias("n_orders"),
        )
    )
    return skyline2d(cust, "spend", "n_orders").select(
        "custkey", "spend", "n_orders"
    )


@q(
    "q_graph_triangles",
    """
    WITH und AS (
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    ),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM und e1
      JOIN und e2 ON e1.b = e2.a
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    pernode AS (
      SELECT node, count(*) AS tri FROM (
        SELECT unnest([x, y, z]) AS node FROM tri
      ) GROUP BY node
    ),
    deg AS (
      SELECT node, count(*) AS deg FROM (
        SELECT a AS node FROM und UNION ALL SELECT b FROM und
      ) GROUP BY node
    )
    SELECT p.node AS part, p.tri, d.deg,
           2.0 * p.tri / (d.deg * (d.deg - 1)) AS coeff
    FROM pernode p JOIN deg d USING (node)
    """,
)
def q_graph_triangles(spark, sf_dir):
    """Per-part triangle counts + clustering coefficient of the
    co-purchase graph (parts appearing in the same order), via
    degree-ordered orientation (operators/graph.py::triangle_counts —
    wedge-join volume Σ outdeg² ≤ m^1.5 instead of hub-quadratic Σ deg²).
    The oracle enumerates undirected id-ordered triangles — orientation
    invariance IS the check."""
    from ..operators.graph import triangle_counts

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pairs = (
        li.alias("x")
        .join(li.alias("y"), "l_orderkey")
        .filter(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(
            F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b")
        )
    )
    tri = triangle_counts(pairs, "a", "b")
    und = pairs.select(
        F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
    ).distinct()
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    return tri.join(deg, "node").select(
        F.col("node").alias("part"),
        "tri",
        "deg",
        (F.lit(2.0) * F.col("tri") / (F.col("deg") * (F.col("deg") - 1))).alias(
            "coeff"
        ),
    )


@q(
    "q_chi2_independence",
    """
    WITH cells AS (SELECT lang, source, count(*) AS obs FROM documents GROUP BY 1, 2),
    ra AS (SELECT lang, CAST(SUM(obs) AS DOUBLE) AS rt FROM cells GROUP BY 1),
    ca AS (SELECT source, CAST(SUM(obs) AS DOUBLE) AS ct FROM cells GROUP BY 1),
    t AS (SELECT CAST(SUM(obs) AS DOUBLE) AS n FROM cells)
    SELECT c.lang, c.source, c.obs,
           ra.rt * ca.ct / t.n AS expected,
           (c.obs - ra.rt * ca.ct / t.n) * (c.obs - ra.rt * ca.ct / t.n)
             / (ra.rt * ca.ct / t.n) AS contrib
    FROM cells c
    JOIN ra ON c.lang IS NOT DISTINCT FROM ra.lang
    JOIN ca ON c.source IS NOT DISTINCT FROM ca.source
    CROSS JOIN t
    """,
)
def q_chi2_independence(spark, sf_dir):
    """Chi-squared independence audit of the lang × source contingency
    table (operators/stats.py::contingency_chi2): per-cell observed vs
    expected-under-independence and the chi² contribution. One aggregate
    over the rows; margins via windows on the |lang|·|source|-row cell
    table. Double-cast margin products make the floats bit-identical
    cross-engine — no rounding step anywhere."""
    from ..operators.stats import contingency_chi2

    docs = ptable(spark, sf_dir)
    return contingency_chi2(docs, "lang", "source")


@q(
    "q_kl_drift",
    """
    WITH cells AS (
      SELECT epoch_us(ts) // 86400000000 AS day, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    g AS (SELECT day, SUM(n) AS ng FROM cells GROUP BY 1),
    c AS (SELECT event_type, SUM(n) AS nc FROM cells GROUP BY 1),
    t AS (SELECT SUM(n) AS na FROM cells)
    SELECT cells.day AS day,
           round(SUM((cells.n / CAST(g.ng AS DOUBLE))
                     * ln((cells.n / CAST(g.ng AS DOUBLE))
                          / (c.nc / CAST(t.na AS DOUBLE)))), 6) AS kl
    FROM cells
    JOIN g ON cells.day IS NOT DISTINCT FROM g.day
    JOIN c ON cells.event_type IS NOT DISTINCT FROM c.event_type
    CROSS JOIN t
    GROUP BY cells.day
    """,
)
def q_kl_drift(spark, sf_dir):
    """Per-day KL divergence of the event-type mix from the corpus-wide
    mix (operators/stats.py::kl_from_global) — the drift audit a
    filtering pipeline runs to see what a filter did to the data
    distribution. One category-cardinality aggregate; margins via
    windows on the tiny cell table."""
    from ..operators.stats import kl_from_global

    ev = events(spark, sf_dir).withColumn(
        "day", F.expr("ts_us div 86400000000")
    )
    return kl_from_global(ev, "day", "event_type").select(
        "day", r6(F.col("kl")).alias("kl")
    )


@q(
    "q_auc_scores",
    """
    WITH l AS (
      SELECT value AS score,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      FROM events
      WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL
    ),
    g AS (SELECT score, count(*) AS cnt, sum(pos) AS np FROM l GROUP BY 1),
    c AS (SELECT score, cnt, np, sum(cnt) OVER (ORDER BY score) AS cum FROM g),
    t AS (SELECT CAST(sum(np * (2 * cum - cnt + 1)) AS BIGINT) AS r2,
                 CAST(sum(np) AS BIGINT) AS n_pos,
                 CAST(sum(cnt - np) AS BIGINT) AS n_neg
          FROM c)
    SELECT n_pos, n_neg,
           floor(CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE)
                 / nullif(2.0 * n_pos * n_neg, 0.0)
                 * 1000000.0 + 0.5) / 1000000.0 AS auc
    FROM t
    """,
)
def q_auc_scores(spark, sf_dir):
    """Exact ROC-AUC of `value` as a classifier score separating purchase
    events (positives) from views (operators/stats.py::auc_mann_whitney)
    — the evaluation every model-scored quality filter needs before its
    threshold is trusted. Mann-Whitney rank-sum with average-rank tie
    correction; rank arithmetic is all-BIGINT (2·midrank = 2·cum − cnt
    + 1), so the statistic is exact and the DuckDB oracle reproduces it
    bit-for-bit. Distribution: one |distinct scores| groupBy, then
    rank.global_cumsum (range-partitioned, windowless prefix) — no
    single-partition stage at any score cardinality; the oracle's plain
    SUM OVER expresses the same prefix on the engine where one box is
    fine."""
    from ..operators.stats import auc_mann_whitney

    ev = events(spark, sf_dir)
    labeled = ev.filter(
        F.col("event_type").isin("view", "purchase") & F.col("value").isNotNull()
    ).select(F.col("value").alias("score"), (F.col("event_type") == "purchase").alias("pos"))
    out = auc_mann_whitney(labeled, "score", "pos")
    return out.select("n_pos", "n_neg", r6p(F.col("auc")).alias("auc"))


@q(
    "q_welch_ttest",
    """
    WITH s AS (
      SELECT event_type, CAST(count(*) AS DOUBLE) AS n1,
             SUM(value - 50.0) AS s1,
             SUM((value - 50.0) * (value - 50.0)) AS q1
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    g AS (SELECT SUM(n1) AS n, SUM(s1) AS s, SUM(q1) AS q FROM s),
    e AS (
      SELECT event_type, n1, s1, q1,
             g.n - n1 AS n2, g.s - s1 AS s2, g.q - q1 AS q2
      FROM s CROSS JOIN g
    ),
    v AS (
      SELECT event_type, n1, n2,
             s1 / n1 - s2 / n2 AS md,
             ((q1 - s1 * s1 / n1) / (n1 - 1)) / n1 AS se1,
             ((q2 - s2 * s2 / n2) / (n2 - 1)) / n2 AS se2
      FROM e
    )
    SELECT event_type, CAST(n1 AS BIGINT) AS n_group,
           floor(md / sqrt(se1 + se2) * 1000000.0 + 0.5) / 1000000.0 AS t_stat,
           floor((se1 + se2) * (se1 + se2)
                 / (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1))
                 * 1000000.0 + 0.5) / 1000000.0 AS welch_df
    FROM v
    """,
)
def q_welch_ttest(spark, sf_dir):
    """Welch's unequal-variance t of each event_type's value vs the REST
    of the corpus (one-vs-rest A/B readout) with Welch–Satterthwaite df
    (operators/stats.py::welch_one_vs_rest). ONE aggregate per group; the
    complement's sufficient statistics are global-minus-group via a window
    over the |groups|-row table — no self-join, no second scan. Values
    anchored at 50 before squaring (the OLS conditioning trick)."""
    from ..operators.stats import welch_one_vs_rest

    ev = events(spark, sf_dir)
    out = welch_one_vs_rest(ev, "event_type", "value", anchor=50.0)
    return out.select(
        "event_type",
        "n_group",
        r6p(F.col("t_stat")).alias("t_stat"),
        r6p(F.col("welch_df")).alias("welch_df"),
    )


@q(
    "q_lag_autocorr",
    """
    WITH seq AS (
      SELECT user_id, value AS y,
             lag(value, 1) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS x
      FROM events
    ),
    p AS (SELECT user_id, x, y FROM seq WHERE x IS NOT NULL AND y IS NOT NULL),
    s AS (
      SELECT user_id, CAST(count(*) AS DOUBLE) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM p GROUP BY 1
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_pairs,
           CASE WHEN n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN floor((n * sxy - sx * sy)
                           / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
                           * 1000000.0 + 0.5) / 1000000.0
           END AS acf
    FROM s
    """,
)
def q_lag_autocorr(spark, sf_dir):
    """Per-user lag-1 autocorrelation of event values over the
    deterministic (ts, event_id) sequence
    (operators/stats.py::lag_autocorr) — the is-this-series-noise-or-trend
    probe. One lag window + one 5-sum aggregate; Pearson r is closed-form
    on the sufficient statistics. Groups with zero variance on either
    side yield NULL (ANSI-safe)."""
    from ..operators.stats import lag_autocorr

    ev = events(spark, sf_dir)
    out = lag_autocorr(ev, "user_id", EV_ORDER, "value", lag=1)
    return out.select("user_id", "n_pairs", r6p(F.col("acf")).alias("acf"))


@q(
    "q_mutual_info",
    """
    WITH cells AS (SELECT lang, source, count(*) AS obs FROM documents GROUP BY 1, 2),
    m AS (
      SELECT obs,
             CAST(SUM(obs) OVER (PARTITION BY lang) AS DOUBLE) AS na,
             CAST(SUM(obs) OVER (PARTITION BY source) AS DOUBLE) AS nb,
             CAST(SUM(obs) OVER () AS DOUBLE) AS nn
      FROM cells
    ),
    t AS (
      SELECT SUM((obs / nn) * ln(obs / nn * nn * nn / (na * nb))) AS mi,
             SUM(-(obs / nn) * ln(na / nn)) AS h_a,
             SUM(-(obs / nn) * ln(nb / nn)) AS h_b
      FROM m
    )
    SELECT floor(mi * 1000000.0 + 0.5) / 1000000.0 AS mi,
           floor(h_a * 1000000.0 + 0.5) / 1000000.0 AS h_a,
           floor(h_b * 1000000.0 + 0.5) / 1000000.0 AS h_b,
           floor(mi / sqrt(h_a * h_b) * 1000000.0 + 0.5) / 1000000.0 AS nmi
    FROM t
    """,
)
def q_mutual_info(spark, sf_dir):
    """Mutual information (nats) between lang and source plus marginal
    entropies and normalized MI (operators/stats.py::mutual_info) — the
    dependence audit run after stratified sampling. ONE cell aggregate;
    both entropies fall out of the same cell pass via
    Σ_cells p_ij·ln(p_a) = Σ_a p_a·ln(p_a)."""
    from ..operators.stats import mutual_info

    docs = ptable(spark, sf_dir)
    out = mutual_info(docs, "lang", "source")
    return out.select(
        r6p(F.col("mi")).alias("mi"),
        r6p(F.col("h_a")).alias("h_a"),
        r6p(F.col("h_b")).alias("h_b"),
        r6p(F.col("nmi")).alias("nmi"),
    )


@q(
    "q_gini_concentration",
    """
    WITH ranked AS (
      SELECT lang, n_chars AS x,
             row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS i
      FROM documents
    ),
    s AS (
      SELECT lang, count(*) AS n, SUM(x) AS sx, SUM(i * x) AS six
      FROM ranked GROUP BY 1
    )
    SELECT lang, CAST(n AS BIGINT) AS n,
           CASE WHEN n * sx > 0
                THEN CAST(2 * six - (n + 1) * sx AS DOUBLE)
                     / CAST(n * sx AS DOUBLE)
           END AS gini
    FROM s
    """,
)
def q_gini_concentration(spark, sf_dir):
    """Per-language Gini coefficient of document lengths
    (operators/stats.py::gini_by_rank) — corpus-concentration audit (is
    one tail of documents hogging the bytes?). Exact rank formula
    G = (2Σi·x₍ᵢ₎ − (n+1)Σx)/(nΣx) with deterministic (n_chars, doc_id)
    ordering; numerator and denominator are BIGINT-exact, so NO rounding
    is needed anywhere — the single final division is bit-identical on
    any engine."""
    from ..operators.stats import gini_by_rank

    docs = ptable(spark, sf_dir)
    return gini_by_rank(docs, "lang", "n_chars", "doc_id")


@q(
    "q_cusum_drift",
    """
    WITH dev AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             CAST(floor((value - 50.0) * 1000000.0 + 0.5) AS BIGINT) AS d
      FROM events
    ),
    c AS (
      SELECT user_id, ts_us, event_id,
             SUM(d) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM dev
    ),
    s AS (
      SELECT user_id, ts_us,
             cum - LEAST(CAST(0 AS BIGINT),
                         MIN(cum) OVER (PARTITION BY user_id
                                        ORDER BY ts_us, event_id
                                        ROWS UNBOUNDED PRECEDING)) AS s_units
      FROM c
    ),
    m AS (
      SELECT user_id, ts_us, s_units,
             MAX(s_units) OVER (PARTITION BY user_id) AS mx
      FROM s
    )
    SELECT user_id,
           CAST(MAX(s_units) AS DOUBLE) / 1000000.0 AS max_cusum,
           MIN(ts_us) AS peak_at
    FROM m WHERE s_units = mx GROUP BY user_id
    """,
)
def q_cusum_drift(spark, sf_dir):
    """Per-user one-sided CUSUM drift detector
    (operators/stats.py::cusum_max_excursion): the recursion
    S_t = max(0, S_{t−1} + (x_t − 50)) rewritten shuffle-free as
    C_t − min(0, running-min C) — a cumulative window plus a running
    min, no iteration. Deviations quantized to BIGINT µ-units first so
    the cumulative sums are exact under ANY summation association
    (a float cumsum's value depends on the window implementation's
    tree shape) — bit-identical cross-engine with zero rounding."""
    from ..operators.stats import cusum_max_excursion

    ev = events(spark, sf_dir)
    return cusum_max_excursion(ev, "user_id", EV_ORDER, "value", target=50.0)


@q(
    "q_assoc_rules",
    """
    WITH items AS (
      SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS item
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    nb AS (SELECT CAST(count(DISTINCT basket) AS DOUBLE) AS n FROM items),
    marg AS (SELECT item, count(*) AS item_n FROM items GROUP BY 1),
    pairs AS (
      SELECT a.item AS item_a, b.item AS item_b, count(*) AS pair_n
      FROM items a JOIN items b ON a.basket = b.basket AND a.item < b.item
      GROUP BY 1, 2 HAVING count(*) >= 2
    )
    SELECT item_a, item_b, pair_n,
           ma.item_n AS n_a, mb.item_n AS n_b,
           CAST(pair_n AS DOUBLE) / CAST(ma.item_n AS DOUBLE) AS conf_a_b,
           CAST(pair_n AS DOUBLE) / CAST(mb.item_n AS DOUBLE) AS conf_b_a,
           CAST(pair_n AS DOUBLE) * nb.n
             / (CAST(ma.item_n AS DOUBLE) * CAST(mb.item_n AS DOUBLE)) AS lift
    FROM pairs
    JOIN marg ma ON ma.item = pairs.item_a
    JOIN marg mb ON mb.item = pairs.item_b
    CROSS JOIN nb
    """,
)
def q_assoc_rules(spark, sf_dir):
    """Market-basket association rules over order×brand baskets
    (operators/itemsets.py::association_rules): pair support, both
    confidences and lift for every brand pair co-bought in ≥2 orders —
    the correlated-sources audit before corpus mixing. Presence matrix =
    one distinct; pairs = basket-keyed self-join (volume Σ k_b²/2,
    bounded by per-basket distinct items, never |items|²); marginals
    broadcast back onto the support-pruned pair table. All metrics are
    single divisions of exact BIGINT counts — no rounding anywhere."""
    from ..operators.itemsets import association_rules

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = li.join(pt, li.l_partkey == pt.p_partkey).select(
        F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("item")
    )
    return association_rules(baskets, "basket", "item", min_support=2)


@q(
    "q_winsorize",
    """
    WITH b AS (
      SELECT lang,
             quantile_cont(n_chars, 0.05) AS p_lo,
             quantile_cont(n_chars, 0.95) AS p_hi
      FROM documents GROUP BY 1
    )
    SELECT d.doc_id, d.lang, d.n_chars, b.p_lo, b.p_hi,
           least(greatest(CAST(d.n_chars AS DOUBLE), b.p_lo), b.p_hi) AS clipped
    FROM documents d JOIN b ON d.lang IS NOT DISTINCT FROM b.lang
    """,
)
def q_winsorize(spark, sf_dir):
    """Per-language winsorization of document lengths at the exact
    [p05, p95] band (operators/stats.py::winsorize) — the robust outlier
    clip before tail-dominated statistics. Spark's exact ``percentile``
    (sorted linear interpolation) is bit-identical to DuckDB's
    ``quantile_cont`` — verified cross-engine — so the oracle is exact
    with ZERO rounding. Bounds table (|langs| rows) broadcast back; data
    rows never re-shuffle."""
    from ..operators.stats import winsorize

    docs = ptable(spark, sf_dir).select("doc_id", "lang", "n_chars")
    return winsorize(docs, "lang", "n_chars", 0.05, 0.95).select(
        "doc_id", "lang", "n_chars", "p_lo", "p_hi", "clipped"
    )


@q(
    "q_markov_transitions",
    """
    WITH steps AS (
      SELECT lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id) AS from_state,
             event_type AS to_state
      FROM events
    ),
    t AS (
      SELECT from_state, to_state, count(*) AS n
      FROM steps WHERE from_state IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_state, to_state, n,
           CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY from_state) AS DOUBLE) AS p
    FROM t
    """,
)
def q_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix of event types over each
    user's (ts, event_id) sequence
    (operators/stats.py::markov_transitions) — the what-follows-what
    behavioral model. One lag window + one pair aggregate; row totals
    are a window over the |states|²-row transition table; probabilities
    are divisions of exact BIGINT counts — no rounding."""
    from ..operators.stats import markov_transitions

    ev = events(spark, sf_dir)
    return markov_transitions(ev, "user_id", EV_ORDER, "event_type")


@q(
    "q_benford_audit",
    """
    WITH obs AS (
      SELECT CAST(substr(CAST(CAST(floor(value) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INT) AS digit,
             count(*) AS obs
      FROM events WHERE value >= 1 GROUP BY 1
    ),
    m AS (SELECT CAST(SUM(obs) AS DOUBLE) AS n FROM obs)
    SELECT digit, obs,
           floor(obs / n * 1000000.0 + 0.5) / 1000000.0 AS obs_p,
           floor(log10(1.0 + 1.0 / digit) * 1000000.0 + 0.5) / 1000000.0
             AS benford_p,
           floor((obs - log10(1.0 + 1.0 / digit) * n)
                 * (obs - log10(1.0 + 1.0 / digit) * n)
                 / (log10(1.0 + 1.0 / digit) * n) * 1000000.0 + 0.5) / 1000000.0
             AS chi2_contrib
    FROM obs CROSS JOIN m
    """,
)
def q_benford_audit(spark, sf_dir):
    """Benford's-law first-digit audit of event values
    (operators/quality.py::benford_audit) — the fabricated-data detector.
    One conditional aggregate; expected shares are log10(1+1/d) literals;
    the digit comes from the BIGINT string form so extraction is
    engine-exact. 6-dp portable rounding absorbs libm log10 noise."""
    from ..operators.quality import benford_audit

    ev = events(spark, sf_dir)
    out = benford_audit(ev, "value")
    return out.select(
        "digit",
        "obs",
        r6p(F.col("obs_p")).alias("obs_p"),
        r6p(F.col("benford_p")).alias("benford_p"),
        r6p(F.col("chi2_contrib")).alias("chi2_contrib"),
    )


@q(
    "q_quantile_sketch",
    """
    WITH h AS (
      SELECT lang, n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
                  AS BIGINT) AS h,
             doc_id
      FROM documents
    ),
    s AS (
      SELECT lang, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
      FROM h
    )
    SELECT lang,
           quantile_cont(n_chars, 0.5) AS q_50,
           quantile_cont(n_chars, 0.9) AS q_90,
           count(*) AS sample_n
    FROM s WHERE rn <= 64 GROUP BY lang
    """,
)
def q_quantile_sketch(spark, sf_dir):
    """Deterministic mergeable quantile sketch per language
    (operators/sketches.py::quantile_sketch): bottom-64 md5-hash row
    sample → exact interpolated quantiles over the sample. Deterministic
    (same rows win on any partitioning — reproducible AND exactly
    oracle-checkable, unlike approx_percentile), mergeable by the KMV
    law. The oracle replays the identical hash selection and
    interpolation — bit-identical, zero rounding."""
    from ..operators.sketches import quantile_sketch

    docs = ptable(spark, sf_dir)
    return quantile_sketch(
        docs, "doc_id", "n_chars", ["lang"], k=64, qs=(0.5, 0.9)
    )


@q(
    "txt_pmi_bigrams",
    f"""
    WITH t AS (SELECT {_TOK_SQL} AS toks FROM documents),
    b AS (
      SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                    i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS bg
      FROM t WHERE len(toks) >= 2
    ),
    c AS (SELECT bg.w1 AS w1, bg.w2 AS w2, count(*) AS n FROM b GROUP BY 1, 2),
    m AS (
      SELECT w1, w2, n,
             CAST(SUM(n) OVER (PARTITION BY w1) AS DOUBLE) AS cl,
             CAST(SUM(n) OVER (PARTITION BY w2) AS DOUBLE) AS cr,
             CAST(SUM(n) OVER () AS DOUBLE) AS nn
      FROM c
    )
    SELECT w1, w2, n,
           floor(ln(CAST(n AS DOUBLE) * nn / (cl * cr)) * 1000000.0 + 0.5)
             / 1000000.0 AS pmi
    FROM m WHERE n >= 5
    """,
)
def txt_pmi_bigrams(spark, sf_dir):
    """PMI collocation mining over adjacent token pairs
    (operators/text.py::pmi_bigrams) — multi-word-expression detection
    before tokenizer training. One explode (volume = token count);
    margins via windows over the distinct-bigram table, computed BEFORE
    the min-count filter so denominators stay unbiased. Exact BIGINT
    counts; 6-dp portable rounding on the single ln."""
    from ..operators.text import pmi_bigrams

    docs = ptable(spark, sf_dir)
    out = pmi_bigrams(docs, "text", min_count=5)
    return out.select("w1", "w2", "n", r6p(F.col("pmi")).alias("pmi"))


@q(
    "q_two_hop_reach",
    """
    WITH und AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    adj AS (SELECT u, v FROM und UNION SELECT v, u FROM und),
    deg AS (SELECT u, count(*) AS n_one_hop FROM adj GROUP BY 1),
    wed AS (
      SELECT DISTINCT x.u AS u, y.v AS w
      FROM adj x JOIN adj y ON x.v = y.u WHERE x.u <> y.v
    ),
    s2 AS (
      SELECT wed.u, wed.w FROM wed
      ANTI JOIN adj ON wed.u = adj.u AND wed.w = adj.v
    ),
    two AS (SELECT u, count(*) AS n_two_hop FROM s2 GROUP BY 1)
    SELECT deg.u AS node, deg.n_one_hop,
           COALESCE(two.n_two_hop, 0) AS n_two_hop
    FROM deg LEFT JOIN two USING (u)
    """,
)
def q_two_hop_reach(spark, sf_dir):
    """Per-part graph-expansion profile on the co-purchase graph
    (operators/graph.py::two_hop_counts): degree + distinct
    strictly-2-hop reach (friends-of-friends minus friends) — the
    contamination-spread / candidate-sizing metric. One mid-node-keyed
    wedge join (Σ deg², the triangle counter's budget), anti-join removes
    direct edges. Exact set arithmetic, no rounding."""
    from ..operators.graph import two_hop_counts

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pairs = (
        li.alias("x")
        .join(li.alias("y"), "l_orderkey")
        .filter(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b"))
    )
    return two_hop_counts(pairs, "a", "b")


@q(
    "q_target_encode",
    """
    WITH s AS (
      SELECT event_type, SUM(value) AS sum_g, COUNT(value) AS n_g
      FROM events GROUP BY 1
    ),
    g AS (SELECT SUM(value) / COUNT(value) AS mu_global FROM events)
    SELECT e.event_id, e.event_type, e.value,
           floor((s.sum_g - e.value + 20.0 * g.mu_global)
                 / (s.n_g - 1 + 20.0) * 1000000.0 + 0.5) / 1000000.0 AS te_loo
    FROM events e
    JOIN s ON e.event_type IS NOT DISTINCT FROM s.event_type
    CROSS JOIN g
    WHERE e.value IS NOT NULL
    """,
)
def q_target_encode(spark, sf_dir):
    """Leave-one-out target encoding of event_type against value with an
    m=20 global-mean prior (operators/stats.py::target_encode_loo) — the
    high-cardinality categorical encoder, leak-free by construction.
    ONE aggregate → |categories|-row broadcast; the global mean is a
    1-row scalar broadcast; data rows never shuffle."""
    from ..operators.stats import target_encode_loo

    ev = events(spark, sf_dir).filter(F.col("value").isNotNull())
    out = target_encode_loo(ev, "event_type", "value", smoothing=20.0)
    return out.select(
        "event_id", "event_type", "value", r6p(F.col("te_loo")).alias("te_loo")
    )


