"""Time-alignment joins — the reference's workhorse operators J1/J2.

Reference (`seaexplorertools/process_adcp.py`):

- J1 ``interp`` (:144-146): ``interp1d(x[finite], y[finite],
  bounds_error=False, fill_value=NaN)(xi)`` — 1-D linear interpolation of a
  sample series onto probe times; NULL outside the sample hull; per-column
  finite-pair skipping. ~12 call sites (:169-192, :851-856, :1237, :1338,
  :1402-1403, :1778-1787).
- J2 nearest/as-of (:1503-1507, :1523-1525): for each probe, index of the
  nearest sample by |Δt| (np.argmin → FIRST minimum, i.e. earlier sample
  wins ties).

Spark-first design — union + ordered window, not a range join
-------------------------------------------------------------
Both joins are expressed as: union the probe rows into the sample stream,
sort once per partition by (t, side), and take ``last(...ignoreNulls)`` /
``first(...ignoreNulls)`` to find the bracketing samples, then blend. This
is a single shuffle + sort (no O(|samples|×|probes|) range-join risk), and
every value column shares the same exchange/sort — Catalyst reuses one
Window physical node for all of them.

Scale notes
-----------
- Always pass ``partition_by`` (mission / dive / device / user) — the union
  window then parallelizes per key.
- For one giant un-keyed time series, pass ``bucket=<seconds-ish width in
  the same units as the time column>``: samples are replicated into their
  own + both neighbor buckets, probes into their own, and the window runs
  per (partition, bucket). Exact as long as the bracketing samples of any
  probe lie within ± one bucket width (i.e. bucket > max sample gap);
  3× sample replication buys unbounded parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SIDE = "__side"
_T = "__t"
_BUCKET = "__bucket"
_HOME = "__home_bucket"


def _prep(
    samples: DataFrame,
    probes: DataFrame,
    on: str,
    values: list[str],
    partition_by: list[str],
    bucket: float | None,
    cast_values: bool = True,
):
    """Union samples (side=0) and probes (side=1) on a common schema.
    ``cast_values=False`` keeps each value column's native type (as-of
    record transport works on any type; only interp arithmetic needs
    doubles)."""
    vtype = {v: samples.schema[v].dataType for v in values}
    s = samples.select(
        *partition_by,
        F.col(on).cast("double").alias(_T),
        *[
            (F.col(v).cast("double") if cast_values else F.col(v)).alias(v)
            for v in values
        ],
        F.lit(0).alias(_SIDE),
    )
    probe_cols = [c for c in probes.columns if c not in values]
    p = probes.select(
        *probe_cols,
        F.col(on).cast("double").alias(_T),
        *[
            F.lit(None).cast("double" if cast_values else vtype[v]).alias(v)
            for v in values
        ],
        F.lit(1).alias(_SIDE),
    )
    u = s.unionByName(p, allowMissingColumns=True)
    part_cols = list(partition_by)
    if bucket is not None:
        u = u.withColumn(_HOME, F.floor(F.col(_T) / F.lit(float(bucket))))
        # samples fan out to {b-1, b, b+1}; probes stay in their own bucket
        offsets = F.when(F.col(_SIDE) == 0, F.array(F.lit(-1), F.lit(0), F.lit(1))).otherwise(
            F.array(F.lit(0))
        )
        u = (
            u.withColumn("__off", F.explode(offsets))
            .withColumn(_BUCKET, F.col("__off") + F.col(_HOME))
            .drop("__off")
        )
        part_cols = part_cols + [_BUCKET]
    return u, part_cols


def interp_join(
    samples: DataFrame,
    probes: DataFrame,
    on: str,
    values: list[str],
    partition_by: list[str] | None = None,
    bucket: float | None = None,
    suffix: str = "",
) -> DataFrame:
    """J1 — linear-interpolation join.

    Returns ``probes`` plus one interpolated column per entry in ``values``
    (named ``value + suffix``). ``on`` must be numeric/castable-to-double
    (use an epoch-seconds column for timestamps). NULL outside the sample
    hull, exact value at exact time matches, per-value NULL-pair skipping —
    the reference's interp1d semantics.

    Caveat: a probe column whose name collides with an entry in ``values``
    is excluded from the output (the union needs the name for the sample
    side) — pass a ``suffix`` and rename, or alias the probe column first.
    """
    partition_by = partition_by or []
    u, part_cols = _prep(samples, probes, on, values, partition_by, bucket)

    w = Window.partitionBy(*part_cols).orderBy(_T, _SIDE)
    w_prev = w.rowsBetween(Window.unboundedPreceding, -1)
    # "next" lookups run over the REVERSED order with a RUNNING frame:
    # Spark's (k, unboundedFollowing) frames re-scan the partition tail per
    # row — O(n²) per partition (a multi-minute hang at 50k rows in one
    # mission) — while unboundedPreceding running frames are incremental
    # O(n). first-non-null-after ascending ≡ last-non-null-before
    # descending (strictly before current: frame end -1 excludes self).
    w_rev = Window.partitionBy(*part_cols).orderBy(F.col(_T).desc(), F.col(_SIDE).desc())
    w_next = w_rev.rowsBetween(Window.unboundedPreceding, -1)
    # samples sort before probes at equal t (side 0 < 1), so "preceding"
    # includes a sample at exactly t; t == prev_t then returns prev_v exactly.
    #
    # All prev-lookups land in ONE select and all next-lookups in ONE
    # select: Catalyst only collapses ADJACENT Window nodes with the same
    # spec, so a per-value withColumn loop interleaving asc/desc specs
    # would plan 2·N windows (and 2·N local sorts) instead of 2.
    prev_exprs, next_exprs = [], []
    for v in values:
        sample_t = F.when(F.col(v).isNotNull() & (F.col(_SIDE) == 0), F.col(_T))
        sample_v = F.when(F.col(_SIDE) == 0, F.col(v))
        prev_exprs.append(F.last(sample_t, ignorenulls=True).over(w_prev).alias(f"__pt_{v}"))
        prev_exprs.append(F.last(sample_v, ignorenulls=True).over(w_prev).alias(f"__pv_{v}"))
        next_exprs.append(F.last(sample_t, ignorenulls=True).over(w_next).alias(f"__nt_{v}"))
        next_exprs.append(F.last(sample_v, ignorenulls=True).over(w_next).alias(f"__nv_{v}"))
    out = u.select("*", *next_exprs).select("*", *prev_exprs)
    result_cols = []
    helper_cols = []
    for v in values:
        prev_t, prev_v = F.col(f"__pt_{v}"), F.col(f"__pv_{v}")
        next_t, next_v = F.col(f"__nt_{v}"), F.col(f"__nv_{v}")
        frac = (F.col(_T) - prev_t) / F.nullif(next_t - prev_t, F.lit(0.0))
        interp = (
            F.when(prev_t.isNull(), F.lit(None).cast("double"))
            .when(F.col(_T) == prev_t, prev_v)
            .when(next_t.isNull(), F.lit(None).cast("double"))
            .otherwise(prev_v + (next_v - prev_v) * frac)
        )
        name = v + suffix if suffix else v
        out = out.withColumn(name, interp)
        result_cols.append(name)
        helper_cols += [f"__pt_{v}", f"__pv_{v}", f"__nt_{v}", f"__nv_{v}"]

    out = out.filter(F.col(_SIDE) == 1).drop(*helper_cols)
    if bucket is not None:
        out = out.filter(F.col(_BUCKET) == F.col(_HOME))
    drop = [_SIDE, _T] + ([_BUCKET, _HOME] if bucket is not None else [])
    if suffix:
        drop += values  # raw union copies of the sample columns (all-NULL on probes)
    return out.drop(*drop)


def asof_join(
    samples: DataFrame,
    probes: DataFrame,
    on: str,
    values: list[str],
    partition_by: list[str] | None = None,
    direction: str = "nearest",
    tolerance: float | None = None,
    bucket: float | None = None,
    suffix: str = "",
    cast_values: bool = True,
) -> DataFrame:
    """J2 — as-of join: attach the sample row's values at the nearest /
    latest-before / earliest-after sample time.

    ``direction``: 'nearest' (reference argmin-|Δt|, earlier wins ties),
    'backward' (classic as-of), 'forward'. ``tolerance`` drops matches with
    |Δt| > tolerance (NULL result). ``cast_values=False`` carries value
    columns in their native types (strings, structs, …) — the matched-row
    struct transport is type-agnostic; only the time column must be
    numeric.
    """
    partition_by = partition_by or []
    u, part_cols = _prep(
        samples, probes, on, values, partition_by, bucket, cast_values=cast_values
    )

    w = Window.partitionBy(*part_cols).orderBy(_T, _SIDE)
    w_prev = w.rowsBetween(Window.unboundedPreceding, 0)
    # reversed-order running frame for the "next" lookup (see interp_join:
    # Spark's unboundedFollowing frames are O(n²) per partition); frame end
    # 0 over the reversed order = at-or-after current in the true order
    w_rev = Window.partitionBy(*part_cols).orderBy(F.col(_T).desc(), F.col(_SIDE).desc())
    w_next = w_rev.rowsBetween(Window.unboundedPreceding, 0)
    is_sample = F.col(_SIDE) == 0
    sample_t = F.when(is_sample, F.col(_T))
    # one select per window DIRECTION (see interp_join: adjacent-only
    # window collapsing) — prev_t/prev_rec share the asc sort, next_t/
    # next_rec the desc sort
    record_expr = F.when(is_sample, F.struct(*[F.col(v) for v in values]))
    u = u.select(
        "*",
        F.last(sample_t, ignorenulls=True).over(w_next).alias("__next_t"),
        F.last(record_expr, ignorenulls=True).over(w_next).alias("__next_rec"),
    ).select(
        "*",
        F.last(sample_t, ignorenulls=True).over(w_prev).alias("__prev_t"),
        F.last(record_expr, ignorenulls=True).over(w_prev).alias("__prev_rec"),
    )
    prev_t, next_t = F.col("__prev_t"), F.col("__next_t")

    d_prev = F.col(_T) - prev_t
    d_next = next_t - F.col(_T)
    if direction == "backward":
        use_prev = prev_t.isNotNull()
    elif direction == "forward":
        use_prev = F.lit(False)
    else:  # nearest: earlier sample wins ties (np.argmin first-minimum)
        use_prev = prev_t.isNotNull() & (next_t.isNull() | (d_prev <= d_next))

    # The matched row's values travel as ONE struct keyed to the matched
    # time: a struct of NULL fields is still non-NULL, so ignorenulls picks
    # the nearest SAMPLE ROW — not the nearest non-null value per column
    # (the reference takes the argmin ping's value even when it is NaN,
    # :1503-1507).
    prev_rec, next_rec = F.col("__prev_rec"), F.col("__next_rec")
    out = u
    result_cols = []
    for v in values:
        if direction == "backward":
            picked = F.when(use_prev, prev_rec[v])
        else:
            picked = F.when(use_prev, prev_rec[v]).otherwise(next_rec[v])
        if tolerance is not None:
            dist = F.when(use_prev, d_prev).otherwise(d_next)
            picked = F.when(dist <= F.lit(float(tolerance)), picked)
        name = v + suffix if suffix else v
        out = out.withColumn(name, picked)
        result_cols.append(name)

    out = out.filter(F.col(_SIDE) == 1)
    if bucket is not None:
        out = out.filter(F.col(_BUCKET) == F.col(_HOME))
    drop = [_SIDE, _T, "__prev_t", "__next_t", "__prev_rec", "__next_rec"] + (
        [_BUCKET, _HOME] if bucket is not None else []
    )
    if suffix:
        drop += values
    return out.drop(*drop)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    time_col: str,
    tol: float,
    right_time_col: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Range join: pair rows sharing ``on`` keys whose times differ by at
    most ``tol`` (|t_left − t_right| ≤ tol). The batch form of a
    watermarked stream-stream interval join.

    A naive key-equi-join + range filter degenerates at scale: one key's
    whole history lands in one task and the range predicate runs over the
    full cross product per key. Instead both sides are bucketed by
    ``time_col div tol`` and the LEFT side probes its own bucket and both
    neighbors (3-row explode) — every candidate pair shares an exact
    (keys, bucket) equi-join key, so the pair space per task is bounded by
    rows-per-bucket and the planner sees a plain shuffled equi-join
    (AQE-splittable, skew-salvageable), never an unbounded theta join.
    Candidates are then filtered exactly; each true pair is produced once
    (its matching bucket pairing is unique).

    ``right_time_col`` defaults to ``time_col``; right's time surfaces as
    ``<time_col>_right`` alongside every right value column.
    """
    rt = right_time_col or time_col
    l = left.withColumn("__b0", F.floor(F.col(time_col) / F.lit(tol))).withColumn(
        "__b", F.explode(F.array(F.col("__b0") - 1, F.col("__b0"), F.col("__b0") + 1))
    )
    rren = right.withColumnRenamed(rt, f"{time_col}_right") if rt == time_col else (
        right.withColumn(f"{time_col}_right", F.col(rt)).drop(rt)
    )
    r = rren.withColumn("__b", F.floor(F.col(f"{time_col}_right") / F.lit(tol)))
    out = l.join(r, [*on, "__b"], how).filter(
        F.abs(F.col(time_col) - F.col(f"{time_col}_right")) <= F.lit(tol)
    )
    return out.drop("__b", "__b0")


def positional_join(
    left: DataFrame,
    right: DataFrame,
    left_order: list,
    right_order: list,
    how: str = "inner",
    pos_col: str = "pos",
) -> DataFrame:
    """J3: positional/index-alignment join — graft the i-th row of
    ``right`` (under ``right_order``) onto the i-th row of ``left``
    (under ``left_order``). The reference grafts extra columns by pandas
    row position after re-reading the same Parquet
    (process_adcp.py:2068-2074; SURVEY §2 J3); the engine's PREFERRED
    answer remains "project every column at the first read" (SURVEY §7
    risk 8 — this operator is never the cheap path), but when an
    upstream genuinely hands over two position-aligned tables this is
    the scale-correct form: exact global rank per side
    (rank.py::global_rank — one range shuffle + per-partition window
    each, NO single-partition window anywhere), then one equi-join on
    position. Each order list must be a total order (include a unique
    tiebreaker) or alignment is nondeterministic by definition.
    Output carries ``pos_col`` plus both sides' columns; overlapping
    column names raise (alias before joining — the same rule pandas'
    index-graft silently violates)."""
    from .rank import global_rank

    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"positional_join column collision {sorted(overlap)}: alias "
            "one side before aligning"
        )
    lr = global_rank(left, left_order, rank_col=pos_col)
    rr = global_rank(right, right_order, rank_col=pos_col)
    return lr.join(rr, pos_col, how)
