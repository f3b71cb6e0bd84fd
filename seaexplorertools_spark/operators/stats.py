"""Distribution audits for corpus curation — chi-squared independence of
two categorical columns, and KL divergence of per-group distributions
from the corpus-wide distribution (drift detection). Textbook statistics,
engine additions a 100 TB pipeline runs before/after every filter to see
what the filter did to the data mix.

Scale shape: everything reduces to ONE category-cardinality aggregate;
margins and totals come from windows over that tiny cell table (no
second scan, no row-level re-shuffle)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..caching import consistency_cache


def _bjoin_nullsafe(left: DataFrame, right: DataFrame, key: str) -> DataFrame:
    """Broadcast inner join on ``IS NOT DISTINCT FROM`` semantics. A plain
    equi-join silently drops NULL-keyed rows, but a NULL category is still
    a category: ``groupBy`` keeps it as a group, and the pre-round-4
    window forms (PARTITION BY key) kept it as a partition — so the
    margin joins must keep it too, or totals computed from the full cell
    table disagree with the joined cells and probabilities stop summing
    to 1. Null-safe equality is still a hashable join key, so the
    broadcast-hash plan is unchanged."""
    r = right.withColumnRenamed(key, f"__r_{key}")
    return left.join(
        F.broadcast(r), F.col(key).eqNullSafe(F.col(f"__r_{key}"))
    ).drop(f"__r_{key}")


def contingency_chi2(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Per-cell observed/expected counts and chi-squared contributions
    for the a×b contingency table. One aggregate over the rows; margins
    as three tiny aggregates of the |a|·|b|-row cell table broadcast
    back — fully windowless (round 4: the former margin windows were
    bounded but still tripped WindowExec's single-partition warning; the
    join form mirrors the oracle SQL exactly). The cell table is cached:
    it feeds four consumers and is one aggregate away from the raw rows."""
    cells = consistency_cache(
        df.groupBy(a_col, b_col).agg(F.count("*").alias("obs"))
    )
    # margins cast to double BEFORE multiplying: the product is then the
    # same IEEE value any engine computes (counts < 2^53 are exact), so
    # results are bit-identical cross-engine with no rounding step
    ra = cells.groupBy(a_col).agg(F.sum("obs").cast("double").alias("__rt"))
    ca = cells.groupBy(b_col).agg(F.sum("obs").cast("double").alias("__ct"))
    t = (
        cells.agg(F.sum("obs").cast("double").alias("__n"))
        .withColumn("__k", F.lit(1))
    )
    j = (
        _bjoin_nullsafe(_bjoin_nullsafe(cells, ra, a_col), ca, b_col)
        .withColumn("__k", F.lit(1))
        .join(F.broadcast(t), "__k")
    )
    exp = F.col("__rt") * F.col("__ct") / F.col("__n")
    return j.select(
        a_col,
        b_col,
        "obs",
        exp.alias("expected"),
        ((F.col("obs") - exp) * (F.col("obs") - exp) / exp).alias("contrib"),
    )


def welch_one_vs_rest(
    df: DataFrame, group_col: str, value_col: str, anchor: float = 0.0
) -> DataFrame:
    """Welch's unequal-variance t statistic of each group's values vs the
    REST of the table (one-vs-rest A/B readout), with the
    Welch–Satterthwaite degrees of freedom. ONE aggregate computes each
    group's (n, Σx, Σx²); the complement's sufficient statistics are the
    global sums (windows over the |groups|-row table) minus the group's —
    no second scan, no self-join. ``anchor`` is subtracted before squaring
    so Σx² stays well-conditioned when values sit far from 0 (the
    q_group_ols trick).

    Guards: groups (or complements) with n < 2 yield NULL t/df rather
    than dividing by zero — ANSI-safe."""
    x = F.col(value_col) - F.lit(float(anchor))
    s = df.filter(F.col(value_col).isNotNull()).groupBy(group_col).agg(
        F.count("*").cast("double").alias("n1"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("q1"),
    )
    # complement sums via a 1-row totals broadcast (windowless — the
    # former unpartitioned window over the |groups| table tripped the
    # WindowExec warning; the totals join is the same arithmetic)
    s = consistency_cache(s)  # feeds the totals aggregate AND the main select
    tot = (
        s.agg(
            F.sum("n1").alias("__tn"),
            F.sum("s1").alias("__ts"),
            F.sum("q1").alias("__tq"),
        )
        .withColumn("__k", F.lit(1))
    )
    s = (
        s.withColumn("__k", F.lit(1))
        .join(F.broadcast(tot), "__k")
        .select(
            group_col,
            "n1",
            "s1",
            "q1",
            (F.col("__tn") - F.col("n1")).alias("n2"),
            (F.col("__ts") - F.col("s1")).alias("s2"),
            (F.col("__tq") - F.col("q1")).alias("q2"),
        )
    )
    m1 = F.col("s1") / F.col("n1")
    m2 = F.col("s2") / F.col("n2")
    v1 = (F.col("q1") - F.col("s1") * F.col("s1") / F.col("n1")) / (F.col("n1") - 1)
    v2 = (F.col("q2") - F.col("s2") * F.col("s2") / F.col("n2")) / (F.col("n2") - 1)
    se1 = v1 / F.col("n1")
    se2 = v2 / F.col("n2")
    t = (m1 - m2) / F.sqrt(se1 + se2)
    dof = (se1 + se2) * (se1 + se2) / (
        se1 * se1 / (F.col("n1") - 1) + se2 * se2 / (F.col("n2") - 1)
    )
    ok = (F.col("n1") >= 2) & (F.col("n2") >= 2)
    return s.select(
        group_col,
        F.col("n1").cast("long").alias("n_group"),
        F.when(ok, t).alias("t_stat"),
        F.when(ok, dof).alias("welch_df"),
    )


def lag_autocorr(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    value_col: str,
    lag: int = 1,
) -> DataFrame:
    """Per-group lag-k autocorrelation (sample ACF on the paired
    formulation): Pearson r between (x_t, x_{t−k}) over the group's
    deterministic (order_cols) sequence. One lag window + one aggregate of
    the 5 sufficient sums — closed-form r, no iterative pass. Groups with
    fewer than k+2 points (or zero variance on either side) yield NULL."""
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    y = F.col(value_col)
    xl = F.lag(value_col, lag).over(w)
    pairs = df.select(group_col, y.alias("y"), xl.alias("x")).filter(
        F.col("x").isNotNull() & F.col("y").isNotNull()
    )
    s = pairs.groupBy(group_col).agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    ok = (F.col("n") >= 2) & (vx > 0) & (vy > 0)
    return s.select(
        group_col,
        F.col("n").cast("long").alias("n_pairs"),
        F.when(ok, cov / F.sqrt(vx * vy)).alias("acf"),
    )


def mutual_info(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Mutual information (nats) between two categorical columns, plus the
    marginal entropies and the normalized MI — the dependence audit run
    after stratified sampling to confirm the strata stayed independent of
    a sensitive column. ONE cell aggregate; every margin/total is a window
    over the |a|·|b|-row cell table. Both entropies come from the SAME
    cell pass via Σ_cells p_ij·ln(p_a) = Σ_a p_a·ln(p_a) — no second
    aggregate. Output: a single row (mi, h_a, h_b, nmi)."""
    cells = consistency_cache(
        df.groupBy(a_col, b_col).agg(F.count("*").alias("obs"))
    )
    # margins as tiny broadcast aggregates (windowless — see
    # contingency_chi2); cached: the cell table feeds four consumers
    ma = cells.groupBy(a_col).agg(F.sum("obs").alias("__na"))
    mb = cells.groupBy(b_col).agg(F.sum("obs").alias("__nb"))
    mt = cells.agg(F.sum("obs").alias("__nn")).withColumn("__k", F.lit(1))
    joined = (
        _bjoin_nullsafe(_bjoin_nullsafe(cells, ma, a_col), mb, b_col)
        .withColumn("__k", F.lit(1))
        .join(F.broadcast(mt), "__k")
    )
    na = F.col("__na").cast("double")
    nb = F.col("__nb").cast("double")
    nn = F.col("__nn").cast("double")
    p = F.col("obs").cast("double") / nn
    terms = joined.select(
        (p * F.log(p * nn * nn / (na * nb))).alias("mi_term"),
        (-p * F.log(na / nn)).alias("ha_term"),
        (-p * F.log(nb / nn)).alias("hb_term"),
    )
    agg = terms.agg(
        F.sum("mi_term").alias("mi"),
        F.sum("ha_term").alias("h_a"),
        F.sum("hb_term").alias("h_b"),
    )
    return agg.select(
        "mi",
        "h_a",
        "h_b",
        (F.col("mi") / F.sqrt(F.col("h_a") * F.col("h_b"))).alias("nmi"),
    )


def gini_by_rank(
    df: DataFrame, group_col: str, value_col: str, tiebreak: str
) -> DataFrame:
    """Per-group Gini coefficient of a non-negative measure (corpus
    concentration: is one source hogging the bytes?) via the exact rank
    formula G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) with x sorted ascending
    and a deterministic tiebreak. For integer measures the numerator and
    denominator are computed ENTIRELY in BIGINT — bit-identical on any
    engine — and only the final division is floating. One window + one
    aggregate; shuffle = one exchange on the group."""
    w = Window.partitionBy(group_col).orderBy(value_col, tiebreak)
    ranked = df.select(
        group_col,
        F.col(value_col).alias("x"),
        F.row_number().over(w).cast("bigint").alias("i"),
    )
    s = ranked.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("i") * F.col("x")).alias("six"),
    )
    num = F.lit(2) * F.col("six") - (F.col("n") + 1) * F.col("sx")
    den = F.col("n") * F.col("sx")
    return s.select(
        group_col,
        F.col("n").alias("n"),
        F.when(den > 0, num.cast("double") / den.cast("double")).alias("gini"),
    )


def cusum_max_excursion(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    value_col: str,
    target: float,
    units: float = 1e6,
) -> DataFrame:
    """Per-group one-sided CUSUM drift detector: the classic recursion
    S_t = max(0, S_{t−1} + (x_t − target)) rewritten shuffle-free as
    S_t = C_t − min(0, min_{j≤t} C_j) where C is the running sum of
    deviations — a cumulative window plus a running min, no iteration.
    Deviations are first quantized to integer ``units`` (µ-units by
    default) so the cumulative sums are BIGINT — exact under ANY
    summation association, hence bit-identical across engines (a float
    cumsum's value depends on the window implementation's tree shape).
    Output: per group, the maximum excursion (back in value units) and
    where it peaked."""
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    dev = F.floor(
        (F.col(value_col) - F.lit(float(target))) * F.lit(float(units)) + F.lit(0.5)
    ).cast("bigint")
    cum = F.sum(dev).over(w.rowsBetween(Window.unboundedPreceding, 0))
    run_min = F.min(cum).over(w.rowsBetween(Window.unboundedPreceding, 0))
    s = df.select(
        group_col,
        *order_cols,
        (cum - F.least(F.lit(0).cast("bigint"), run_min)).alias("s_units"),
    )
    mx = F.max("s_units").over(Window.partitionBy(group_col))
    peaked = s.withColumn("mx", mx).filter(F.col("s_units") == F.col("mx"))
    return peaked.groupBy(group_col).agg(
        (F.max("s_units").cast("double") / F.lit(float(units))).alias("max_cusum"),
        F.min(order_cols[0]).alias("peak_at"),
    )


def weighted_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col,
    tiebreak: str,
) -> DataFrame:
    """Per-group WEIGHTED lower quantiles (p25/p50/p90): the smallest
    value whose cumulative weight reaches q·W — the corpus statistic that
    answers "the median TOKEN sits in how long a document?" (each row
    counts by its weight, not once). Entirely INTEGER arithmetic: weights
    are cast to BIGINT, the q·W threshold is cleared by cross-multiplied
    integer comparisons (4·cum ≥ W, 2·cum ≥ W, 10·cum ≥ 9·W), so the
    selection is bit-identical on any engine with zero rounding. One
    ordered window pass + one aggregate; shuffle = one exchange on the
    group."""
    staged = df.select(
        group_col,
        F.col(value_col).alias("x"),
        F.col(tiebreak).alias("__tb"),
        weight_col.cast("bigint").alias("__w"),
    )
    w = Window.partitionBy(group_col).orderBy("x", "__tb")
    cum = F.sum("__w").over(w.rowsBetween(Window.unboundedPreceding, 0))
    tot = F.sum("__w").over(Window.partitionBy(group_col))
    s = staged.select(
        group_col,
        "x",
        cum.alias("cum"),
        tot.alias("wtot"),
    )
    def pick(cond):
        return F.min(F.when(cond, F.col("x")))
    return s.groupBy(group_col).agg(
        F.max("wtot").alias("w_total"),
        pick(4 * F.col("cum") >= F.col("wtot")).alias("p25"),
        pick(2 * F.col("cum") >= F.col("wtot")).alias("p50"),
        pick(10 * F.col("cum") >= 9 * F.col("wtot")).alias("p90"),
    )


def best_split(
    df: DataFrame,
    feature_col: str,
    label_col,
) -> DataFrame:
    """Best binary split of a numeric feature against a boolean label by
    information gain — the inner loop of decision-tree training,
    distributed: ONE aggregate to the |distinct feature values| table,
    one ordered cumsum window over it, closed-form entropies from exact
    BIGINT counts, argmax with 6-dp-rounded gain and smallest-threshold
    tiebreak. Returns one row: (split_at, ig, parent_entropy, n_left).
    Candidates are "feature ≤ t" at every distinct value except the last
    (empty right side). This is per-feature work a tree trainer fans out
    across features/nodes; the shuffle is |distinct values|, never row
    volume."""
    from .rank import global_cumsum

    cells = df.groupBy(F.col(feature_col).alias("t")).agg(
        F.count("*").alias("n"),
        F.sum(label_col.cast("int")).cast("bigint").alias("pos"),
    )
    cells = consistency_cache(cells)  # feeds cumulative pass AND totals
    # windowless (round 4): both cumulatives ride ONE global_cumsum pass;
    # the grand totals ride a 1-row broadcast (the J5 pattern)
    cum = global_cumsum(cells, ["t"], ["n", "pos"], ["nl", "pl"])
    tot = (
        cells.agg(F.sum("n").alias("__nn"), F.sum("pos").alias("__pp"))
        .withColumn("__k", F.lit(1))
    )
    s = (
        cum.withColumn("__k", F.lit(1))
        .join(F.broadcast(tot), "__k")
        .select(
            "t",
            "nl",
            "pl",
            F.col("__nn").alias("nn"),
            F.col("__pp").alias("pp"),
        )
        .filter(F.col("nl") < F.col("nn"))
    )

    def ent(p, n):
        q = p.cast("double") / n.cast("double")
        term = lambda z: F.when((z > 0) & (z < 1), -z * F.log(z)).otherwise(0.0)
        return term(q) + term(1 - q)

    parent = ent(F.col("pp"), F.col("nn"))
    left = ent(F.col("pl"), F.col("nl"))
    right = ent(F.col("pp") - F.col("pl"), F.col("nn") - F.col("nl"))
    ig = parent - (
        F.col("nl").cast("double") / F.col("nn").cast("double") * left
        + (F.col("nn") - F.col("nl")).cast("double")
        / F.col("nn").cast("double")
        * right
    )
    scored = s.select(
        "t",
        "nl",
        (F.floor(ig * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("ig"),
        (F.floor(parent * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
            "parent_entropy"
        ),
    )
    # argmax (ig desc, t asc) as a plain max_by aggregate — no ranking
    # window; the ordering struct negates t so larger-ig-then-smaller-t
    # wins lexicographically (t values are distinct, so ties are broken)
    best = scored.agg(
        F.max_by(
            F.struct("t", "nl", "ig", "parent_entropy"),
            F.struct(F.col("ig"), (-F.col("t")).alias("negt")),
        ).alias("b")
    ).where(F.col("b").isNotNull())  # no valid split (≤1 distinct value) → empty
    return best.select(
        F.col("b.t").alias("split_at"),
        F.col("b.ig").alias("ig"),
        F.col("b.parent_entropy").alias("parent_entropy"),
        F.col("b.nl").alias("n_left"),
    )


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    smoothing: float = 0.0,
) -> DataFrame:
    """Leave-one-out target encoding of a categorical column — the
    standard high-cardinality feature encoder for tree/linear models.
    Each row gets its category's target mean COMPUTED WITHOUT ITSELF
    (closed form: (Σ_g y − y_i)/(n_g − 1)), which kills the target-leak
    that naive mean encoding has. ``smoothing`` m blends in the global
    mean as an m-observation prior: (Σ_g y − y_i + m·μ)/(n_g − 1 + m) —
    singleton categories then fall back to μ instead of NULL.

    Shape: ONE aggregate to the |categories|-row stats table, broadcast
    back — the data rows never shuffle. The global mean is a 1-row
    scalar broadcast."""
    s = df.groupBy(cat_col).agg(
        F.sum(target_col).alias("sum_g"),
        F.count(target_col).alias("n_g"),
    )
    out = _bjoin_nullsafe(df, s, cat_col)
    if smoothing > 0:
        g = df.agg(
            (F.sum(target_col) / F.count(target_col)).alias("mu_global")
        )
        out = out.join(F.broadcast(g))
        enc = (
            F.col("sum_g")
            - F.col(target_col)
            + F.lit(float(smoothing)) * F.col("mu_global")
        ) / (F.col("n_g") - 1 + F.lit(float(smoothing)))
    else:
        enc = F.when(
            F.col("n_g") > 1,
            (F.col("sum_g") - F.col(target_col)) / (F.col("n_g") - 1),
        )
    return out.withColumn("te_loo", enc)


def markov_transitions(
    df: DataFrame,
    seq_col: str,
    order_cols: list[str],
    state_col: str,
) -> DataFrame:
    """First-order Markov transition matrix over per-sequence state
    chains: for every (from_state, to_state), the transition count and the
    row-normalized probability — the behavioral model (what follows what)
    behind sessionized-event analysis and synthetic-sequence generation.
    One lag window per sequence + one pair aggregate; row totals come from
    a window over the |states|²-row transition table. Probabilities are
    divisions of exact BIGINT counts — bit-identical cross-engine."""
    w = Window.partitionBy(seq_col).orderBy(*order_cols)
    steps = df.select(
        F.lag(state_col).over(w).alias("from_state"),
        F.col(state_col).alias("to_state"),
    ).filter(F.col("from_state").isNotNull())
    t = steps.groupBy("from_state", "to_state").agg(F.count("*").alias("n"))
    row_total = F.sum("n").over(Window.partitionBy("from_state"))
    return t.select(
        "from_state",
        "to_state",
        "n",
        (F.col("n").cast("double") / row_total.cast("double")).alias("p"),
    )


def winsorize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Per-group winsorization: clip the value into its group's exact
    [lo, hi] percentile band — the robust outlier treatment applied to
    document lengths / feature columns before statistics that a heavy
    tail would dominate. Percentiles use Spark's exact ``percentile``
    (sorted linear interpolation — bit-identical to DuckDB's
    ``quantile_cont``, verified cross-engine); the |groups|-row bound
    table is broadcast back, so rows never re-shuffle. At 100 TB swap
    ``percentile`` for ``approx_percentile(…, accuracy)`` — same plan
    shape, sketch-mergeable map-side."""
    bounds = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, {lo})").alias("p_lo"),
        F.expr(f"percentile({value_col}, {hi})").alias("p_hi"),
    )
    out = _bjoin_nullsafe(df, bounds, group_col)
    x = F.col(value_col).cast("double")
    return out.withColumn(
        "clipped", F.least(F.greatest(x, F.col("p_lo")), F.col("p_hi"))
    )


def kl_from_global(df: DataFrame, group_col: str, cat_col: str) -> DataFrame:
    """KL(P_group ‖ P_global) over the categorical column, one row per
    group — how far each slice's category mix drifts from the corpus.
    Categories absent from a group contribute 0 (0·ln 0 limit); the
    global distribution has full support by construction, so the
    divergence is always finite."""
    cells = consistency_cache(
        df.groupBy(group_col, cat_col).agg(F.count("*").alias("n"))
    )
    # margins as tiny broadcast aggregates (windowless — see
    # contingency_chi2); the cell table feeds four consumers, so cache it
    grp = cells.groupBy(group_col).agg(F.sum("n").alias("__ng"))
    cat = cells.groupBy(cat_col).agg(F.sum("n").alias("__nc"))
    tot = cells.agg(F.sum("n").alias("__na")).withColumn("__k", F.lit(1))
    j = (
        _bjoin_nullsafe(_bjoin_nullsafe(cells, grp, group_col), cat, cat_col)
        .withColumn("__k", F.lit(1))
        .join(F.broadcast(tot), "__k")
    )
    p = F.col("n") / F.col("__ng").cast("double")
    q = F.col("__nc") / F.col("__na").cast("double")
    return (
        j.select(group_col, (p * F.log(p / q)).alias("term"))
        .groupBy(group_col)
        .agg(F.sum("term").alias("kl"))
    )


def auc_mann_whitney(
    df: DataFrame,
    score_col: str,
    label_col,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ROC-AUC via the Mann-Whitney rank-sum identity, fully
    distributed: AUC = (Σ ranks of positives − n₊(n₊+1)/2) / (n₊·n₋)
    with average ranks over score ties (the standard tie-corrected
    estimator — equals P(score₊ > score₋) + ½P(=)).

    Scale shape: one groupBy collapses rows to the |distinct scores|
    table; the global rank prefix runs through rank.global_cumsum (range
    repartition + windowless offsets — no single-partition stage); the
    rest is a 1-row aggregate. All rank arithmetic stays integer
    (2·midrank = 2·cum − cnt + 1), so the sum is exact and
    engine-portable — the only float op is the final division. The
    rank-sum Σ np·(2·cum − cnt + 1) ≤ 2N² outgrows BIGINT at
    N ≈ 2×10⁹ rows, so the summand is promoted to DECIMAL(38,0)
    (exact to N ≈ 10¹⁸; DuckDB's SUM(BIGINT) → HUGEINT matches), as is
    the n₊(n₊+1) correction.

    Returns 1 row: (n_pos, n_neg, auc) with auc NULL when either class
    is empty."""
    from .rank import global_cumsum

    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    g = df.groupBy(score_col).agg(
        F.count("*").alias("cnt"),
        F.sum(lab.cast("long")).alias("np"),
    )
    c = global_cumsum(g, [score_col], "cnt", "cum", num_partitions=num_partitions)
    t = c.agg(
        F.sum(
            F.col("np").cast("decimal(20,0)")
            * (F.lit(2) * F.col("cum") - F.col("cnt") + F.lit(1))
        ).alias("r2"),
        F.sum("np").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("np")).alias("n_neg"),
    )
    np_d = F.col("n_pos").cast("decimal(20,0)")
    auc = (
        (F.col("r2") - np_d * (np_d + F.lit(1))).cast("double")
        / F.nullif(
            F.lit(2.0) * F.col("n_pos").cast("double") * F.col("n_neg").cast("double"),
            F.lit(0.0),
        )
    )
    return t.select("n_pos", "n_neg", auc.alias("auc"))
