"""Driver-contract query registry: every operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable plus a DuckDB oracle SQL string.

Conventions (these make the driver's order-insensitive value-hash match):

- Every computed/aggregate column is aliased IDENTICALLY in the Spark code
  and the oracle SQL.
- Every float expression is rounded to 6 decimals ON BOTH SIDES — Spark and
  DuckDB agree to well below 1e-6 on identical inputs, so rounding removes
  summation-order and libm noise without hiding real bugs.
- ``events.ts`` physical type varies by driver testdata generation
  (ns-as-long, µs timestamp_ntz, …). ``ts_us_col`` normalizes every case
  to BIGINT microseconds matching DuckDB's ``epoch_us(ts)``; all event
  queries go through it.
- ``o_orderdate`` / ``l_shipdate`` are parquet µs → Spark ``timestamp_ntz``,
  which compares tz-safely against DuckDB's naive TIMESTAMP.
- All SQL is ANSI-safe (guarded divisions) because the driver may run the
  session with ``spark.sql.ansi.enabled=true`` (Spark 4 default).

Reference citations (`/root/reference/seaexplorertools/process_adcp.py`)
are on each query; the operator IDs (P1.., J1.., A1.., W1.., F1..) are
SURVEY.md §2's inventory.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .operators import windows as W
from .operators.grid import binned_agg_2d, histogram
from .operators.joins import asof_join, interp_join
from .operators.qc import qc_velocity

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        # a second registration under the same name would silently
        # REPLACE the first (dict write), changing a query's semantics
        # and output schema out from under its driver CORRECTNESS
        # history — refuse loudly instead
        if name in QUERIES:
            raise ValueError(f"contract query {name!r} is already registered")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def r6(c):
    return F.round(c, 6)


def r6p(c):
    """Portable 6-dp rounding: floor(x*1e6 + 0.5)/1e6 — the SAME IEEE ops in
    Spark and DuckDB, so results are bit-identical even on exact round-half
    ties (where Spark's BigDecimal HALF_UP and DuckDB's multiply-then-round
    disagree) and never -0.0. Used where tie-prone arithmetic (2-decimal
    money/value inputs through divisions) feeds the rounded output."""
    return F.floor(c * F.lit(1000000.0) + F.lit(0.5)).cast("double") / F.lit(1000000.0)


R6P_SQL = "floor({} * 1000000.0 + 0.5) / 1000000.0"


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def ts_us_col(df: DataFrame, col: str = "ts"):
    """BIGINT µs-since-epoch from whatever physical type the driver's parquet
    writer used for event time — ns-as-long (legacy flag), timestamp_ntz
    (µs parquet), or tz-aware timestamp. The NTZ branch uses naive datetime
    arithmetic (timestampdiff against the NTZ epoch) so the result is
    session-timezone-independent and equals DuckDB's ``epoch_us(ts)``."""
    dt = dict(df.dtypes)[col]
    if dt == "bigint":  # nanosAsLong: ns integer
        return F.expr(f"{col} div 1000")
    if dt == "timestamp_ntz":
        return F.expr(f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})")
    return F.unix_micros(F.col(col))


def events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts_us BIGINT (µs, matches DuckDB's ns→µs truncation)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = table(spark, sf_dir, "events")
    return ev.withColumn("ts_us", ts_us_col(ev))


# per-user event ordering used by every window query (stable tiebreaker)
EV_ORDER = ["ts_us", "event_id"]


# ---------------------------------------------------------------------------
# S/P — scans, projections, predicates (SURVEY §2.1–2.2)
# ---------------------------------------------------------------------------


@q(
    "s1_scan_project",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           round(l_extendedprice * (1 - l_discount), 6) AS net_price
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1998-06-01'
    """,
)
def s1_scan_project(spark, sf_dir):
    """S1/P1 — projection + derived column + pushdown filter
    (reference load(): process_adcp.py:80-114, sel_cols :83-92)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_shipdate") < "1998-06-01").select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        r6(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("net_price"),
    )


@q(
    "p2_row_filter",
    """
    SELECT event_id, user_id, value FROM events
    WHERE value < 20.0 AND event_type = 'view'
    """,
)
def p2_row_filter(spark, sf_dir):
    """P2 — row-range predicate (reference tests/test_adcp_processing.py:28-29)."""
    ev = events(spark, sf_dir)
    return ev.filter((F.col("value") < 20.0) & (F.col("event_type") == "view")).select(
        "event_id", "user_id", "value"
    )


@q(
    "p3_qc_mask",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount < 0.02 OR l_tax > 0.06 OR abs(l_quantity) > 45
                THEN NULL ELSE l_extendedprice END AS price_qc
    FROM lineitem
    """,
)
def p3_qc_mask(spark, sf_dir):
    """P3 — QC threshold masking (reference remove_outliers :517-538):
    correlation-floor / amplitude-ceiling / velocity-magnitude analogue."""
    li = table(spark, sf_dir, "lineitem").withColumnsRenamed(
        {
            "l_extendedprice": "velocity_beam1",
            "l_discount": "correlation_beam1",
            "l_tax": "amplitude_beam1",
        }
    )
    out = qc_velocity(
        li.withColumn("qty_abs_src", F.col("l_quantity")),
        beams=[1],
        corr_min=0.02,
        amp_max=0.06,
        vel_max=float("inf"),
    )
    # the |velocity|>thr leg maps to |l_quantity|>45 here (separate column)
    masked = F.when(F.abs(F.col("l_quantity")) > 45, F.lit(None).cast("double")).otherwise(
        F.col("velocity_beam1")
    )
    return out.select("l_orderkey", "l_linenumber", masked.alias("price_qc"))


@q(
    "p4_flag_predicate",
    """
    SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
    WHERE event_type = 'signup' AND value > 10.0
    """,
)
def p4_flag_predicate(spark, sf_dir):
    """P4 — GPS-fix-style boolean predicate (reference :1335
    ``(DeadReckoning < 1) & (NAV_RESOURCE == 116)``)."""
    ev = events(spark, sf_dir)
    return ev.filter((F.col("event_type") == "signup") & (F.col("value") > 10.0)).select(
        "event_id", "user_id", "ts_us"
    )


@q(
    "p6_bin_discard",
    "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_linenumber >= 3",
)
def p6_bin_discard(spark, sf_dir):
    """P6 — drop first N range bins (ADCP_discardFirstBins)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_linenumber") >= 3).select("l_orderkey", "l_linenumber", "l_quantity")


@q(
    "p7_finite_pair",
    """
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice + l_quantity, 6) AS pair_sum
    FROM lineitem
    WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
    """,
)
def p7_finite_pair(spark, sf_dir):
    """P7 — np.isfinite(x+y) mask before interpolation (reference :144-146)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_extendedprice").isNotNull() & F.col("l_quantity").isNotNull()).select(
        "l_orderkey", "l_linenumber", r6(F.col("l_extendedprice") + F.col("l_quantity")).alias("pair_sum")
    )


# ---------------------------------------------------------------------------
# J — joins (SURVEY §2.3)
# ---------------------------------------------------------------------------


@q(
    "j1_interp_join",
    """
    WITH s AS (
      SELECT user_id, epoch_us(ts) AS t, value,
             lead(epoch_us(ts)) OVER w AS nt, lead(value) OVER w AS nv
      FROM events WHERE event_type = 'view' AND value IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    p AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id, p.t AS t_us,
           round(CASE WHEN p.t = s.t THEN s.value
                      WHEN s.nt IS NULL THEN NULL
                      ELSE s.value + (s.nv - s.value) * ((p.t - s.t) / (s.nt - s.t))
                 END, 6) AS value_i
    FROM p LEFT JOIN s
      ON p.user_id = s.user_id AND p.t >= s.t AND (p.t < s.nt OR s.nt IS NULL)
    """,
)
def j1_interp_join(spark, sf_dir):
    """J1 — linear-interpolation join (reference interp :144-146, ~12 call
    sites): view-event values interpolated at purchase times per user."""
    ev = events(spark, sf_dir)
    samples = ev.filter(F.col("event_type") == "view").select("user_id", "ts_us", "value")
    probes = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts_us")
    out = interp_join(samples, probes, on="ts_us", values=["value"], partition_by=["user_id"], suffix="_i")
    return out.select(
        "event_id", "user_id", F.col("ts_us").alias("t_us"), r6(F.col("value_i")).alias("value_i")
    )


@q(
    "j2_asof_nearest",
    """
    WITH s AS (SELECT user_id, epoch_us(ts) AS t, value FROM events WHERE event_type = 'click'),
    p AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events WHERE event_type = 'purchase'),
    prev AS (
      SELECT p.event_id, max(s.t) AS pt FROM p JOIN s ON s.user_id = p.user_id AND s.t <= p.t
      GROUP BY p.event_id
    ),
    nxt AS (
      SELECT p.event_id, min(s.t) AS nt FROM p JOIN s ON s.user_id = p.user_id AND s.t > p.t
      GROUP BY p.event_id
    )
    SELECT p.event_id, p.user_id,
           CASE WHEN prev.pt IS NOT NULL AND (nxt.nt IS NULL OR (p.t - prev.pt) <= (nxt.nt - p.t))
                THEN sp.value ELSE sn.value END AS v_near,
           CASE WHEN prev.pt IS NOT NULL AND (nxt.nt IS NULL OR (p.t - prev.pt) <= (nxt.nt - p.t))
                THEN p.t - prev.pt ELSE nxt.nt - p.t END AS dt_us
    FROM p
    LEFT JOIN prev ON p.event_id = prev.event_id
    LEFT JOIN nxt ON p.event_id = nxt.event_id
    LEFT JOIN s sp ON sp.user_id = p.user_id AND sp.t = prev.pt
    LEFT JOIN s sn ON sn.user_id = p.user_id AND sn.t = nxt.nt
    """,
)
def j2_asof_nearest(spark, sf_dir):
    """J2 — nearest-|Δt| as-of join (reference :1503-1507 argmin loop):
    nearest click value for each purchase, earlier wins ties."""
    ev = events(spark, sf_dir)
    samples = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "ts_us", "value", F.col("ts_us").cast("double").alias("t_s"))
    )
    probes = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts_us")
    out = asof_join(samples, probes, on="ts_us", values=["value", "t_s"], partition_by=["user_id"])
    return out.select(
        "event_id",
        "user_id",
        F.col("value").alias("v_near"),
        F.abs(F.col("ts_us").cast("double") - F.col("t_s")).cast("long").alias("dt_us"),
    )


@q(
    "j2b_asof_backward",
    """
    WITH s AS (SELECT user_id, epoch_us(ts) AS t, value FROM events WHERE event_type = 'click'),
    p AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events WHERE event_type = 'purchase'),
    prev AS (
      SELECT p.event_id, max(s.t) AS pt FROM p JOIN s ON s.user_id = p.user_id AND s.t <= p.t
      GROUP BY p.event_id
    )
    SELECT p.event_id, p.user_id, sp.value AS v_before
    FROM p LEFT JOIN prev ON p.event_id = prev.event_id
    LEFT JOIN s sp ON sp.user_id = p.user_id AND sp.t = prev.pt
    """,
)
def j2b_asof_backward(spark, sf_dir):
    """J2 — classic backward as-of (scatter-back pattern, reference :1586-1595)."""
    ev = events(spark, sf_dir)
    samples = ev.filter(F.col("event_type") == "click").select("user_id", "ts_us", "value")
    probes = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts_us")
    out = asof_join(samples, probes, on="ts_us", values=["value"], partition_by=["user_id"], direction="backward")
    return out.select("event_id", "user_id", F.col("value").alias("v_before"))


@q(
    "j4_broadcast_dim",
    """
    SELECT p.p_brand, round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           count(*) AS n
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def j4_broadcast_dim(spark, sf_dir):
    """J4 — broadcast dim join (reference per-bin correction arrays :762,
    :843-846 → small dim table joined on bin). part is the small side →
    explicit broadcast()."""
    li = table(spark, sf_dir, "lineitem")
    pa = table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))), 4).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


@q(
    "j5_scalar_broadcast",
    """
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * 1.0423, 6) AS adj_price
    FROM lineitem WHERE l_linenumber = 1
    """,
)
def j5_scalar_broadcast(spark, sf_dir):
    """J5 — driver-side scalar applied as a literal (reference declination
    :77, geomag target :341, soundspeed coeff :1978-1984)."""
    li = table(spark, sf_dir, "lineitem")
    coeff = 1.0423  # stands in for the driver-side fetched scalar
    return li.filter(F.col("l_linenumber") == 1).select(
        "l_orderkey", "l_linenumber", r6(F.col("l_extendedprice") * F.lit(coeff)).alias("adj_price")
    )


@q(
    "j0_equi_3way",
    """
    SELECT c.c_mktsegment, n.n_name,
           round(sum(o.o_totalprice), 4) AS total, count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY c.c_mktsegment, n.n_name
    """,
)
def j0_equi_3way(spark, sf_dir):
    """Spark-native equi-join surface (SURVEY §2.3 note: the reference has no
    hash joins; the engine gets them from df.join). 3-way star join with
    broadcast dims."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_mktsegment", "n_name")
        .agg(F.round(F.sum("o_totalprice"), 4).alias("total"), F.count("*").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# A — aggregations (SURVEY §2.4)
# ---------------------------------------------------------------------------


@q(
    "a1_grid2d_mean",
    """
    SELECT CAST(floor(l_quantity / 5.0) AS BIGINT) AS xbin,
           CAST(floor(l_extendedprice / 10000.0) AS BIGINT) AS ybin,
           round(avg(l_discount), 6) AS avg_disc,
           round(sum(l_quantity), 6) AS sum_qty,
           count(l_tax) AS n
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def a1_grid2d_mean(spark, sf_dir):
    """A1 — grid2d, THE core operator (reference :117-134, ~20 call sites).
    One shuffle, all variables aggregated together (the reference re-buckets
    per variable; see SURVEY §4)."""
    li = table(spark, sf_dir, "lineitem")
    return binned_agg_2d(
        li,
        "l_quantity",
        "l_extendedprice",
        {
            "avg_disc": r6(F.avg("l_discount")),
            "sum_qty": r6(F.sum("l_quantity")),
            "n": F.count("l_tax"),
        },
        x_origin=0,
        x_width=5,
        y_origin=0,
        y_width=10000,
    )


@q(
    "a1_grid2d_median",
    """
    SELECT CAST(floor(l_quantity / 10.0) AS BIGINT) AS xbin,
           CAST(floor(l_extendedprice / 20000.0) AS BIGINT) AS ybin,
           round(median(l_tax), 6) AS med_tax,
           round(median(l_discount), 6) AS med_disc
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def a1_grid2d_median(spark, sf_dir):
    """A1 — grid2d with exact median (reference grid2d('median') :1703;
    exact F.median, never percentile_approx, to hash-match the oracle)."""
    li = table(spark, sf_dir, "lineitem")
    return binned_agg_2d(
        li,
        "l_quantity",
        "l_extendedprice",
        {"med_tax": r6(F.median("l_tax")), "med_disc": r6(F.median("l_discount"))},
        x_origin=0,
        x_width=10,
        y_origin=0,
        y_width=20000,
    )


@q(
    "a2_global_scalars",
    """
    SELECT count(*) AS n, round(avg(value), 6) AS mean_v,
           round(stddev(value), 6) AS std_v, round(median(value), 6) AS med_v
    FROM events
    """,
)
def a2_global_scalars(spark, sf_dir):
    """A2 — global scalar aggregates (reference orientation detect :210-213,
    nanmedian :316-318)."""
    ev = events(spark, sf_dir)
    return ev.agg(
        F.count("*").alias("n"),
        r6(F.avg("value")).alias("mean_v"),
        r6(F.stddev("value")).alias("std_v"),
        r6(F.median("value")).alias("med_v"),
    )


@q(
    "a3_per_bin_stats",
    """
    SELECT event_type, round(avg(value), 6) AS mean_v, round(stddev(value), 6) AS std_v,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def a3_per_bin_stats(spark, sf_dir):
    """A3 — per-bin mean/std over time (reference max-usable-range pick
    :888-891, mean amplitude per bin :867-868)."""
    ev = events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        r6(F.avg("value")).alias("mean_v"),
        r6(F.stddev("value")).alias("std_v"),
        F.count("*").alias("n"),
    )


@q(
    "a4_class_means",
    """
    SELECT CAST(floor(l_quantity / 10.0) AS BIGINT) AS spd_class, l_returnflag,
           round(avg(l_extendedprice), 6) AS mean_price, count(*) AS n
    FROM lineitem WHERE l_quantity > 5
    GROUP BY 1, 2
    """,
)
def a4_class_means(spark, sf_dir):
    """A4 — speed-conditioned class means (reference get_correction_array
    :712-746: per speed-class per-bin mean profiles)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") > 5)
        .groupBy(
            F.floor(F.col("l_quantity") / 10.0).cast("long").alias("spd_class"),
            "l_returnflag",
        )
        .agg(r6(F.avg("l_extendedprice")).alias("mean_price"), F.count("*").alias("n"))
    )


@q(
    "a5_per_profile_mean",
    """
    SELECT o_custkey, round(avg(o_totalprice), 6) AS mean_total, count(*) AS n
    FROM orders GROUP BY o_custkey
    """,
)
def a5_per_profile_mean(spark, sf_dir):
    """A5 — per-profile axis aggregation (reference :1652-1653)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        r6(F.avg("o_totalprice")).alias("mean_total"), F.count("*").alias("n")
    )


@q(
    "a6_distinct_days",
    """
    SELECT DISTINCT date_diff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS day_idx
    FROM lineitem
    """,
)
def a6_distinct_days(spark, sf_dir):
    """A6 — distinct rounded days (reference :1654 np.unique(time.round('D'))).
    Day index vs epoch date — integer, tz-free for NTZ timestamps."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        F.datediff(F.col("l_shipdate").cast("date"), F.lit("1992-01-01").cast("date"))
        .cast("long")
        .alias("day_idx")
    ).distinct()


@q(
    "a7_group_max_broadcast",
    """
    SELECT event_id, round(max(value) OVER (PARTITION BY user_id) - value, 6) AS below_max
    FROM events
    """,
)
def a7_group_max_broadcast(spark, sf_dir):
    """A7 — per-profile max broadcast back (reference :1509-1517 loop →
    window max, no loop)."""
    ev = events(spark, sf_dir)
    w = Window.partitionBy("user_id")
    return ev.select(
        "event_id", r6(F.max("value").over(w) - F.col("value")).alias("below_max")
    )


@q(
    "a8_first_last_per_group",
    """
    WITH r AS (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC) AS rf,
             row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rl
      FROM events WHERE event_type = 'signup'
    )
    SELECT user_id,
           min(CASE WHEN rf = 1 THEN event_id END) AS first_id,
           min(CASE WHEN rl = 1 THEN event_id END) AS last_id,
           round(min(CASE WHEN rf = 1 THEN value END), 6) AS first_v,
           round(min(CASE WHEN rl = 1 THEN value END), 6) AS last_v
    FROM r GROUP BY user_id
    """,
)
def a8_first_last_per_group(spark, sf_dir):
    """A8 — per-dive first/last GPS row (reference :1352-1369) via min_by/max_by."""
    ev = events(spark, sf_dir).filter(F.col("event_type") == "signup")
    key = F.struct(F.col("ts_us"), F.col("event_id"))
    return ev.groupBy("user_id").agg(
        F.min_by("event_id", key).alias("first_id"),
        F.max_by("event_id", key).alias("last_id"),
        r6(F.min_by("value", key)).alias("first_v"),
        r6(F.max_by("value", key)).alias("last_v"),
    )


_T0_US = 1704067200000000  # 2024-01-01 epoch µs; events start here


@q(
    "a9_filtered_group_median",
    f"""
    SELECT user_id, round(median(value), 6) AS med_v,
           floor(CAST(sum(epoch_us(ts) - {_T0_US}) AS DOUBLE) / count(*) / 1000000.0
                 * 1000000.0 + 0.5) / 1000000.0 AS mean_t_rel,
           count(*) AS n
    FROM events WHERE event_type = 'click' AND value < 50.0
    GROUP BY user_id
    """,
)
def a9_filtered_group_median(spark, sf_dir):
    """A9 — per-dive surface-drift medians (reference :1456-1464:
    gap-filtered per-dive nanmedian/nanmean). The mean time is computed as
    an EXACT BIGINT sum relative to a base, then one double division —
    avg() over 1e15-µs longs differs between engines in the last ulp."""
    ev = events(spark, sf_dir)
    return (
        ev.filter((F.col("event_type") == "click") & (F.col("value") < 50.0))
        .groupBy("user_id")
        .agg(
            r6(F.median("value")).alias("med_v"),
            r6p(
                F.sum(F.col("ts_us") - F.lit(_T0_US)).cast("double")
                / F.count("*")
                / F.lit(1000000.0)
            ).alias("mean_t_rel"),
            F.count("*").alias("n"),
        )
    )


@q(
    "a10_histogram",
    """
    WITH h AS (
      SELECT CAST(least(floor(l_quantity / 2.0), 24) AS BIGINT) AS bin, count(*) AS n
      FROM lineitem WHERE l_quantity IS NOT NULL AND l_quantity >= 0 AND l_quantity <= 50
      GROUP BY 1
    )
    SELECT bin, n, round(n / (sum(n) OVER () * 2.0), 6) AS pdf FROM h
    """,
)
def a10_histogram(spark, sf_dir):
    """A10 — histogram/PDF aggregation (reference verify_depth_bias
    :1884-1896 np.histogram(density=True); right edge closed like
    np.histogram — l_quantity == 50 lands in the last bin)."""
    li = table(spark, sf_dir, "lineitem")
    out = histogram(li, "l_quantity", 0, 50, 25)
    return out.select("bin", "n", r6(F.col("pdf")).alias("pdf"))


@q(
    "a11_rmsd",
    """
    SELECT event_type, round(sqrt(avg(value * value)), 6) AS rmsd_v FROM events
    GROUP BY event_type
    """,
)
def a11_rmsd(spark, sf_dir):
    """A11 — RMSD reduction (reference rmsd :149-150, score :1962-1966)."""
    ev = events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        r6(F.sqrt(F.avg(F.col("value") * F.col("value")))).alias("rmsd_v")
    )


@q(
    "a12_finite_count",
    """
    SELECT user_id, event_type, count(value) AS n_finite FROM events
    GROUP BY user_id, event_type
    """,
)
def a12_finite_count(spark, sf_dir):
    """A12 — finite-count density (reference :569-576; count skips NULLs)."""
    ev = events(spark, sf_dir)
    return ev.groupBy("user_id", "event_type").agg(F.count("value").alias("n_finite"))


# ---------------------------------------------------------------------------
# W — window / ordered operators (SURVEY §2.5)
# ---------------------------------------------------------------------------

_EV_W_SQL = "PARTITION BY user_id ORDER BY epoch_us(ts), event_id"


@q(
    "w1_centered_mean",
    f"""
    SELECT event_id,
           round(avg(value) OVER ({_EV_W_SQL} ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING), 6)
             AS run_mean
    FROM events
    """,
)
def w1_centered_mean(spark, sf_dir):
    """W1 — centered running mean (reference RunningMean :137-141)."""
    ev = events(spark, sf_dir)
    return ev.select(
        "event_id", r6(W.centered_mean("value", 3, ["user_id"], EV_ORDER)).alias("run_mean")
    )


@q(
    "w2_central_diff",
    f"""
    WITH t AS (
      SELECT event_id, value, epoch_us(ts) / 1000000.0 AS x,
             lag(value)  OVER ({_EV_W_SQL}) AS vp,
             lead(value) OVER ({_EV_W_SQL}) AS vn,
             lag(epoch_us(ts) / 1000000.0)  OVER ({_EV_W_SQL}) AS xp,
             lead(epoch_us(ts) / 1000000.0) OVER ({_EV_W_SQL}) AS xn
      FROM events
    )
    SELECT event_id,
           floor(CASE
             WHEN xp IS NULL AND xn IS NULL THEN NULL
             WHEN xp IS NULL THEN (vn - value) / nullif(xn - x, 0)
             WHEN xn IS NULL THEN (value - vp) / nullif(x - xp, 0)
             ELSE ((x - xp) * (x - xp) * vn + ((xn - x) * (xn - x) - (x - xp) * (x - xp)) * value
                   - (xn - x) * (xn - x) * vp)
                  / nullif((x - xp) * (xn - x) * ((x - xp) + (xn - x)), 0)
           END * 1000000.0 + 0.5) / 1000000.0 AS dvdt
    FROM t
    """,
)
def w2_central_diff(spark, sf_dir):
    """W2 — np.gradient central difference (reference :1186-1194, xarray
    differentiate :1171 — second-order nonuniform scheme, one-sided edges)."""
    ev = events(spark, sf_dir).withColumn("x_sec", F.col("ts_us") / F.lit(1000000.0))
    return ev.select(
        "event_id", r6p(W.central_diff("value", "x_sec", ["user_id"], EV_ORDER)).alias("dvdt")
    )


@q(
    "w3_cumsum",
    f"""
    SELECT event_id,
           round(sum(coalesce(value, 0.0)) OVER ({_EV_W_SQL}
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cum_v
    FROM events
    """,
)
def w3_cumsum(spark, sf_dir):
    """W3 — nancumsum integration (reference :1345-1346, :1676-1682)."""
    ev = events(spark, sf_dir)
    return ev.select("event_id", r6(W.cumsum("value", ["user_id"], EV_ORDER)).alias("cum_v"))


@q(
    "w3b_cumsum_reverse",
    f"""
    SELECT event_id,
           round(sum(coalesce(value, 0.0)) OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts) DESC, event_id DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cum_up
    FROM events
    """,
)
def w3b_cumsum_reverse(spark, sf_dir):
    """W3 — bottom-up cumsum ``np.nancumsum(arr[::-1])[::-1]`` (reference
    :1203, :1957) as a descending-order window, no data reversal."""
    ev = events(spark, sf_dir)
    return ev.select(
        "event_id", r6(W.cumsum("value", ["user_id"], EV_ORDER, reverse=True)).alias("cum_up")
    )


@q(
    "w4_cumsum_reset",
    f"""
    WITH t AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS tu,
             sum(coalesce(value, 0.0)) OVER ({_EV_W_SQL}
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM events
    )
    SELECT event_id,
           round(cum - coalesce(last_value(CASE WHEN event_type = 'signup' THEN cum END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY tu, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0), 6)
             AS cum_since_marker
    FROM t
    """,
)
def w4_cumsum_reset(spark, sf_dir):
    """W4 — cumsum with reset at markers (reference reset_transport_at_GPS
    :1329-1333): running value re-zeroed at each 'signup' event."""
    ev = events(spark, sf_dir)
    return ev.select(
        "event_id",
        r6(
            W.cumsum_reset("value", F.col("event_type") == "signup", ["user_id"], EV_ORDER)
        ).alias("cum_since_marker"),
    )


@q(
    "w5_ffill",
    f"""
    SELECT event_id,
           round(last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
                 OVER ({_EV_W_SQL} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS last_purchase_v,
           round(first_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
                 OVER ({_EV_W_SQL} ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 6) AS next_purchase_v
    FROM events
    """,
)
def w5_ffill(spark, sf_dir):
    """W5 — ffill/bfill (reference :1405-1406, :852-856): carry the last/next
    purchase value across every event."""
    ev = events(spark, sf_dir)
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    ev = ev.withColumn("__pv", pv)
    return ev.select(
        "event_id",
        r6(W.ffill("__pv", ["user_id"], EV_ORDER)).alias("last_purchase_v"),
        r6(W.bfill("__pv", ["user_id"], EV_ORDER)).alias("next_purchase_v"),
    )


@q(
    "w6_demean",
    """
    SELECT event_id, round(value - round(avg(value) OVER (PARTITION BY user_id), 6), 6) AS v_anom
    FROM events
    """,
)
def w6_demean(spark, sf_dir):
    """W6 — per-profile demean (reference :1682, :1959). The group mean is
    rounded to 6dp BEFORE the per-row subtraction: the mean is summation-
    order-sensitive across engines, the subtraction of a rounded mean is
    exact IEEE and bit-identical."""
    ev = events(spark, sf_dir)
    w = Window.partitionBy("user_id")
    return ev.select(
        "event_id", r6(F.col("value") - F.round(F.avg("value").over(w), 6)).alias("v_anom")
    )


@q(
    "w7_tail_flag",
    """
    WITH t AS (
      SELECT event_id, value,
             count(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM events
    )
    SELECT event_id, (value IS NOT NULL AND c <= 5) AS in_tail FROM t
    """,
)
def w7_tail_flag(spark, sf_dir):
    """W7 — bottom-most-k finite cells (reference :1756-1759)."""
    ev = events(spark, sf_dir)
    return ev.select(
        "event_id",
        W.tail_flag("value", 5, ["user_id"], [F.col("ts_us").desc(), F.col("event_id").desc()]).alias(
            "in_tail"
        ),
    )


@q(
    "w8_parity",
    """
    SELECT event_id, user_id % 2 AS updown,
           CASE WHEN value > 50.0 THEN 1 ELSE -1 END AS sign_class
    FROM events
    """,
)
def w8_parity(spark, sf_dir):
    """W8 — parity / sign classification (reference :1863-1864 profile%2,
    :1020-1021 pitch-sign split)."""
    ev = events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.pmod(F.col("user_id"), F.lit(2)).cast("long").alias("updown"),
        F.when(F.col("value") > 50.0, 1).otherwise(-1).alias("sign_class"),
    )


# ---------------------------------------------------------------------------
# F — scalar expression families (SURVEY §2.6), exercised on lineitem columns
# re-labelled as instrument channels (pitch/roll/depth stand-ins)
# ---------------------------------------------------------------------------

from .functions import geodesy as G  # noqa: E402
from .functions import math as M  # noqa: E402

# synthetic channel mapping used by all f* queries (documented once):
#   pitch ≔ l_quantity − 25   (≈ ±25°)     roll ≔ l_discount·100 − 5 (≈ ±5°)
#   depth ≔ l_extendedprice/1000           rng  ≔ l_linenumber·2 (m along beam)
_CH_SQL = """
      SELECT l_orderkey, l_linenumber,
             l_quantity - 25.0 AS pitch,
             l_discount * 100.0 - 5.0 AS roll,
             l_extendedprice / 1000.0 AS depth,
             l_linenumber * 2.0 AS rng,
             l_quantity / 10.0 AS b1, l_discount * 10.0 AS b2,
             l_tax * 10.0 AS b3, l_extendedprice / 50000.0 AS b4
      FROM lineitem
"""


def _channels(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_quantity") - 25.0).alias("pitch"),
        (F.col("l_discount") * 100.0 - 5.0).alias("roll"),
        (F.col("l_extendedprice") / 1000.0).alias("depth"),
        (F.col("l_linenumber") * 2.0).alias("rng"),
        (F.col("l_quantity") / 10.0).alias("b1"),
        (F.col("l_discount") * 10.0).alias("b2"),
        (F.col("l_tax") * 10.0).alias("b3"),
        (F.col("l_extendedprice") / 50000.0).alias("b4"),
    )


@q(
    "f1_trig_angles",
    f"""
    WITH ch AS ({_CH_SQL})
    SELECT l_orderkey, l_linenumber,
           round(((pitch * 37.0 % 360.0) + 360.0) % 360.0, 6) AS wrapped,
           round(CASE WHEN abs(pitch * 11.0) > 180
                      THEN pitch * 11.0 - 360.0 * sign(pitch * 11.0)
                      ELSE pitch * 11.0 END, 6) AS circd,
           round(degrees(atan2(b2, b3)), 6) AS bearing
    FROM ch
    """,
)
def f1_trig_angles(spark, sf_dir):
    """F1 — trig & angle wrap (reference :228-237, :359-373: wrap=(x+360)%360,
    circ to ±180, atan2d chains)."""
    ch = _channels(spark, sf_dir)
    return ch.select(
        "l_orderkey",
        "l_linenumber",
        r6(M.wrap360(F.col("pitch") * 37.0)).alias("wrapped"),
        r6(M.circ180(F.col("pitch") * 11.0)).alias("circd"),
        r6(M.atan2d(F.col("b2"), F.col("b3"))).alias("bearing"),
    )


@q(
    "f2_beam_depth",
    f"""
    WITH ch AS ({_CH_SQL})
    SELECT l_orderkey, l_linenumber,
           round(depth - rng * cos(acos(cos(radians(47.5 - pitch)) * cos(radians(roll)))), 6) AS d1,
           round(depth - rng * cos(acos(cos(radians(25.0 - roll)) * cos(radians(pitch)))), 6) AS d2,
           round(depth - rng * cos(acos(cos(radians(47.5 + pitch)) * cos(radians(roll)))), 6) AS d3,
           round(depth - rng * cos(acos(cos(radians(25.0 + roll)) * cos(radians(pitch)))), 6) AS d4
    FROM ch
    """,
)
def f2_beam_depth(spark, sf_dir):
    """F2 — per-beam cell depth remap (reference remapADCPdepth :224-270,
    top-mounted orientation): Depth − range·cos(θ_beam(pitch, roll))."""
    ch = _channels(spark, sf_dir)
    cols = [
        M.beam_cell_depth(F.col("depth"), F.col("rng"), F.col("pitch"), F.col("roll"), b).alias(f"d{b}")
        for b in (1, 2, 3, 4)
    ]
    return ch.select("l_orderkey", "l_linenumber", *[r6(c).alias(f"d{i+1}") for i, c in enumerate(cols)])


def _xyzz_sql() -> str:
    m = M.BEAM2XYZZ
    return f"""
           {m[0][0]!r} * b1 + {m[0][2]!r} * b3 AS x4,
           {m[1][1]!r} * b2 + {m[1][3]!r} * b4 AS y4,
           {m[2][0]!r} * b1 + {m[2][2]!r} * b3 AS z4,
           {m[3][1]!r} * b2 + {m[3][3]!r} * b4 AS zz4
    """


@q(
    "f3_beam2xyzz",
    f"""
    WITH ch AS ({_CH_SQL})
    SELECT l_orderkey, l_linenumber,
           floor(({M.BEAM2XYZZ[0][0]!r} * b1 + {M.BEAM2XYZZ[0][2]!r} * b3) * 1000000.0 + 0.5)
             / 1000000.0 AS x4,
           floor(({M.BEAM2XYZZ[1][1]!r} * b2 + {M.BEAM2XYZZ[1][3]!r} * b4) * 1000000.0 + 0.5)
             / 1000000.0 AS y4,
           floor(({M.BEAM2XYZZ[2][0]!r} * b1 + {M.BEAM2XYZZ[2][2]!r} * b3) * 1000000.0 + 0.5)
             / 1000000.0 AS z4,
           floor(({M.BEAM2XYZZ[3][1]!r} * b2 + {M.BEAM2XYZZ[3][3]!r} * b4) * 1000000.0 + 0.5)
             / 1000000.0 AS zz4
    FROM ch
    """,
)
def f3_beam2xyzz(spark, sf_dir):
    """F3 — 4-beam → XYZZ fixed-matrix transform (reference quad_beam2xyzz
    :595-634; the per-column loop :631-632 becomes 4 expressions).

    NOTE: the Spark side builds the full 4-term linear combination from the
    matrix (zero coefficients fold away under constant folding); the oracle
    writes only the nonzero terms — Catalyst constant-folds 0.0*x + y to the
    same arithmetic, keeping both sides bit-identical before rounding.
    """
    ch = _channels(spark, sf_dir)
    xyzz = M.beam2xyzz(F.col("b1"), F.col("b2"), F.col("b3"), F.col("b4"))
    names = ["x4", "y4", "z4", "zz4"]
    # r6p: the beam combinations of 2-decimal-derived channels land exactly
    # on round-half boundaries (and tiny negatives round to DuckDB -0.0) —
    # the portable floor-rounding is bit-identical in both engines
    return ch.select(
        "l_orderkey", "l_linenumber",
        *[r6p(c).alias(n) for c, n in zip(xyzz, names)]
    )


@q(
    "f4_three_beam_xyz",
    f"""
    WITH ch AS ({_CH_SQL}),
    eff AS (
      SELECT *,
             CASE WHEN NOT pitch > 0
                  THEN (2 * {M._b(25.0)!r} * b2 + 2 * {M._b(25.0)!r} * b4 - 2 * {M._b(47.5)!r} * b3)
                       / (2 * {M._b(47.5)!r})
                  ELSE b1 END AS v1e,
             CASE WHEN pitch > 0
                  THEN (2 * {M._b(25.0)!r} * b2 + 2 * {M._b(25.0)!r} * b4 - 2 * {M._b(47.5)!r} * b1)
                       / (2 * {M._b(47.5)!r})
                  ELSE b3 END AS v3e
      FROM ch
    )
    SELECT l_orderkey, l_linenumber,
           round({M._a(47.5)!r} * v1e - {M._a(47.5)!r} * v3e, 6) AS x,
           round(-{M._a(25.0)!r} * b2 + {M._a(25.0)!r} * b4, 6) AS y,
           round(2 * {M._b(25.0)!r} * b2 + 2 * {M._b(25.0)!r} * b4, 6) AS z
    FROM eff
    """,
)
def f4_three_beam_xyz(spark, sf_dir):
    """F4 — pitch-conditional 3-beam XYZ solution (reference calcXYZfrom3beam
    :984-1034, top-mounted: wake-shadowed fore/aft beam replaced by the
    error-zero combination :1018, :1026-1028)."""
    ch = _channels(spark, sf_dir)
    xyz = M.xyz_from_3beam(
        F.col("b1"), F.col("b2"), F.col("b3"), F.col("b4"), F.col("pitch"), top_mounted=True
    )
    return ch.select(
        "l_orderkey", "l_linenumber",
        r6(xyz[0]).alias("x"), r6(xyz[1]).alias("y"), r6(xyz[2]).alias("z"),
    )


@q(
    "f5_enu_rotation",
    f"""
    WITH ch AS ({_CH_SQL}),
    ang AS (
      SELECT *, radians((((pitch * 29.0 % 360.0) + 360.0) % 360.0) - 90.0) AS hh,
             radians(pitch) AS pp, radians(roll) AS rr,
             b1 AS vx, b2 AS vy, b3 AS vz
      FROM ch
    )
    SELECT l_orderkey, l_linenumber,
           {R6P_SQL.format('''((cos(hh) * cos(pp)) * vx
                 + (-cos(hh) * sin(pp) * sin(rr) + sin(hh) * cos(rr)) * vy
                 + (-cos(hh) * sin(pp) * cos(rr) - sin(hh) * sin(rr)) * vz)''')} AS e,
           {R6P_SQL.format('''((-sin(hh) * cos(pp)) * vx
                 + (sin(hh) * sin(pp) * sin(rr) + cos(hh) * cos(rr)) * vy
                 + (sin(hh) * sin(pp) * cos(rr) - cos(hh) * sin(rr)) * vz)''')} AS n,
           {R6P_SQL.format('(sin(pp) * vx + (cos(pp) * sin(rr)) * vy + (cos(pp) * cos(rr)) * vz)')} AS u
    FROM ang
    """,
)
def f5_enu_rotation(spark, sf_dir):
    """F5 — XYZ→ENU heading/pitch/roll rotation (reference M_xyz2enu
    :1134-1146, applied :1156-1158; top-mounted → direction=+1).

    Rounded with r6p, not F.round: BigDecimal HALF_UP rounding dominated the
    runtime (1.09 s vs 0.46 s warm at sf0.1 for the same plan) — floor-based
    rounding stays in pure-double codegen, and the ENU outputs are finite
    bounded trig products (the r6p safety domain)."""
    ch = _channels(spark, sf_dir)
    heading = M.wrap360(F.col("pitch") * 29.0)
    enu = M.xyz_to_enu(
        F.col("b1"), F.col("b2"), F.col("b3"), heading, F.col("pitch"), F.col("roll"), top_mounted=True
    )
    return ch.select(
        "l_orderkey", "l_linenumber",
        r6p(enu[0]).alias("e"), r6p(enu[1]).alias("n"), r6p(enu[2]).alias("u"),
    )


@q(
    "f8_francois_garrison",
    f"""
    WITH ch AS ({_CH_SQL}),
    env AS (
      SELECT l_orderkey, l_linenumber,
             31.0 + b3 * 5.0 AS s, (pitch + 25.0) / 2.0 AS t, depth AS z
      FROM ch
    ),
    fg AS (
      SELECT *, 1412.0 + 3.21 * t + 1.19 * s + 0.0167 * z AS c, 273.0 + t AS theta,
             307.0 * 307.0 AS fxf
      FROM env
    ),
    fg2 AS (
      SELECT *,
             2.8 * sqrt(s / 35.0) * pow(10.0, 4.0 - 1245.0 / theta) AS f1,
             8.17 * pow(10.0, 8.0 - 1990.0 / theta) / (1.0 + 0.0018 * (s - 35.0)) AS f2,
             8.86 / c * pow(10.0, 0.78 * 8.1 - 5.0) AS a1,
             21.44 * s / c * (1.0 + 0.025 * t) AS a2,
             CASE WHEN t <= 20.0
                  THEN 4.937e-4 - 2.59e-5 * t + 9.11e-7 * t * t - 1.50e-8 * t * t * t
                  ELSE 3.964e-4 - 1.146e-5 * t + 1.45e-7 * t * t - 6.5e-10 * t * t * t END AS a3,
             1.0 - 1.35e-4 * z + 6.2e-9 * z * z AS p2,
             1.0 - 3.83e-5 * z + 4.9e-10 * z * z AS p3
      FROM fg
    )
    SELECT l_orderkey, l_linenumber,
           round((a1 * f1 * fxf / (f1 * f1 + fxf)
                  + a2 * p2 * f2 * fxf / (f2 * f2 + fxf)
                  + a3 * p3 * fxf) / 1000.0, 6) AS alpha_db_m
    FROM fg2
    """,
)
def f8_francois_garrison(spark, sf_dir):
    """F8 — Francois–Garrison seawater absorption α(f,S,T,pH,z) with the
    T≤20 °C branch (reference francoisgarrison :808-838)."""
    ch = _channels(spark, sf_dir)
    s = F.lit(31.0) + F.col("b3") * 5.0
    t = (F.col("pitch") + 25.0) / 2.0
    alpha = M.francois_garrison(307.0, s, t, 8.1, F.col("depth"))
    return ch.select("l_orderkey", "l_linenumber", r6(alpha).alias("alpha_db_m"))


@q(
    "f10_mag_heading",
    f"""
    WITH ch AS ({_CH_SQL}),
    mag AS (
      SELECT l_orderkey, l_linenumber, pitch, roll,
             1.02 * (b1 - 0.1) + 0.03 * (b2 - 0.02) + 0.01 * (b3 - 0.05) AS mx,
             0.02 * (b1 - 0.1) + 0.98 * (b2 - 0.02) + 0.04 * (b3 - 0.05) AS my,
             0.01 * (b1 - 0.1) + 0.02 * (b2 - 0.02) + 1.01 * (b3 - 0.05) AS mz
      FROM ch
    )
    SELECT l_orderkey, l_linenumber,
           round((((degrees(atan2(
                     mx * cos(radians(pitch)) + my * sin(radians(roll)) * sin(radians(pitch))
                        + mz * cos(radians(roll)) * sin(radians(pitch)),
                     my * cos(radians(roll)) - mz * sin(radians(roll))
                   )) - 90.0 + 360.0) % 360.0) + 360.0) % 360.0, 6) AS heading
    FROM mag
    """,
)
def f10_mag_heading(spark, sf_dir):
    """F10 — hard/soft-iron calibration A@(v−B) + tilt-compensated heading
    (reference calibrate :375-387, heading :367-373). Coefficients are
    driver-side literals (the fmin fit O1 happens at the collect boundary).
    """
    ch = _channels(spark, sf_dir)
    coeffs = [1.02, 0.03, 0.01, 0.02, 0.98, 0.04, 0.01, 0.02, 1.01, 0.1, 0.02, 0.05]
    mx, my, mz = M.calibrate_mag(F.col("b1"), F.col("b2"), F.col("b3"), coeffs)
    hdg = M.mag_heading(mx, my, mz, F.col("pitch"), F.col("roll"))
    return ch.select("l_orderkey", "l_linenumber", r6(hdg).alias("heading"))


@q(
    "f6_f11_soundspeed_norm",
    f"""
    WITH ch AS ({_CH_SQL})
    SELECT l_orderkey, l_linenumber,
           round(b1 * ((1500.0 + depth * 0.017) / nullif(1481.0, 0.0)), 6) AS v_corrected,
           round(sqrt(b1 * b1 + b2 * b2 + b3 * b3), 6) AS speed3d
    FROM ch
    """,
)
def f6_f11_soundspeed_norm(spark, sf_dir):
    """F6 — soundspeed ratio correction V·c_new/c_old (reference :464-475);
    F11 — 3-D magnitude (reference :359)."""
    ch = _channels(spark, sf_dir)
    c_new = F.lit(1500.0) + F.col("depth") * 0.017
    return ch.select(
        "l_orderkey",
        "l_linenumber",
        r6(M.soundspeed_ratio_correction(F.col("b1"), c_new, F.lit(1481.0))).alias("v_corrected"),
        r6(M.magnitude3(F.col("b1"), F.col("b2"), F.col("b3"))).alias("speed3d"),
    )


@q(
    "f12_epoch_convert",
    """
    SELECT event_id, epoch_us(ts) AS ts_us,
           round(epoch_us(ts) / 1000000.0, 6) AS ts_sec,
           epoch_us(ts) // 60000000 AS minute_bucket
    FROM events
    """,
)
def f12_epoch_convert(spark, sf_dir):
    """F12 — timestamp↔epoch conversions (reference date_float :93-105,
    /1e9 seconds :1171, :1337)."""
    ev = events(spark, sf_dir)
    return ev.select(
        "event_id",
        "ts_us",
        r6(F.col("ts_us") / F.lit(1000000.0)).alias("ts_sec"),
        F.expr("ts_us div 60000000").alias("minute_bucket"),
    )


@q(
    "f13_round_clip",
    """
    SELECT l_orderkey, l_linenumber,
           least(greatest(l_extendedprice, 1000.0), 50000.0) AS price_clipped,
           round(l_quantity / 7.0, 2) AS qty_r2,
           round(l_extendedprice) AS price_r0
    FROM lineitem
    """,
)
def f13_round_clip(spark, sf_dir):
    """F13 — rounding & clipping (reference np.round :181, clip :1708-1710)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        M.clip(F.col("l_extendedprice"), 1000.0, 50000.0).alias("price_clipped"),
        F.round(F.col("l_quantity") / 7.0, 2).alias("qty_r2"),
        F.round(F.col("l_extendedprice")).alias("price_r0"),
    )


@q(
    "f7_geodesy_distance",
    """
    WITH g AS (
      SELECT event_id, user_id, 58.0 + value * 0.001 AS lat, 11.0 + value * 0.002 AS lon
      FROM events
    )
    SELECT event_id,
           round((lat - 58.0) * 111319.444, 6) AS dy_m,
           round((lon - 11.0) * 40075000.0 * cos(radians(lat)) / 360.0, 6) AS dx_m
    FROM g
    """,
)
def f7_geodesy_distance(spark, sf_dir):
    """F7 — degree→meter geodesy (reference dead-reckoning constants
    :1244-1246; gsw.distance call sites :1386-1387 use the same
    small-displacement approximation)."""
    ev = events(spark, sf_dir)
    lat = F.lit(58.0) + F.col("value") * 0.001
    lon = F.lit(11.0) + F.col("value") * 0.002
    return ev.select(
        "event_id",
        r6(G.dlat_to_m(lat - F.lit(58.0))).alias("dy_m"),
        r6(G.dlon_to_m(lon - F.lit(11.0), lat)).alias("dx_m"),
    )


@q(
    "f9_backscatter",
    f"""
    WITH ch AS ({_CH_SQL})
    SELECT l_orderkey, l_linenumber,
           round((70.0 + b2 * 3.0) + 2.0 * 0.08 * (rng / cos(radians(47.4))), 6) AS amp_corrected
    FROM ch
    """,
)
def f9_backscatter(spark, sf_dir):
    """F9 — backscatter correction Amp + 2·α·BeamRange with slant range
    range/cos(θ) (reference correct_backscatter :843-846, :861-865)."""
    ch = _channels(spark, sf_dir)
    amp = F.lit(70.0) + F.col("b2") * 3.0
    slant = F.col("rng") / F.cos(F.radians(F.lit(47.4)))
    return ch.select(
        "l_orderkey",
        "l_linenumber",
        r6(M.backscatter_correction(amp, F.lit(0.08), slant)).alias("amp_corrected"),
    )


# ---------------------------------------------------------------------------
# R1 — per-group regridding (SURVEY §2.7)
# ---------------------------------------------------------------------------

from .operators.regrid import regrid_interp  # noqa: E402


@q(
    "r1_regrid_ladder",
    f"""
    WITH s0 AS (
      SELECT user_id, (epoch_us(ts) - {_T0_US}) / 1000000.0 AS x, value, event_id
      FROM events WHERE value IS NOT NULL
    ),
    s1 AS (
      SELECT * FROM s0
      QUALIFY row_number() OVER (PARTITION BY user_id, x ORDER BY event_id) = 1
    ),
    s AS (
      SELECT user_id, x, value,
             lead(x) OVER (PARTITION BY user_id ORDER BY x) AS nx,
             lead(value) OVER (PARTITION BY user_id ORDER BY x) AS nv
      FROM s1
    ),
    lad AS (SELECT unnest(generate_series(0, 29)) AS k),
    probes AS (SELECT u.user_id, lad.k * 86400.0 AS xt
               FROM (SELECT DISTINCT user_id FROM events) u CROSS JOIN lad)
    SELECT p.user_id, p.xt AS x_target,
           round(CASE WHEN p.xt = s.x THEN s.value
                      WHEN s.nx IS NULL THEN NULL
                      ELSE s.value + ((s.nv - s.value) / (s.nx - s.x)) * (p.xt - s.x)
                 END, 6) AS value
    FROM probes p LEFT JOIN s
      ON p.user_id = s.user_id AND p.xt >= s.x AND (p.xt < s.nx OR s.nx IS NULL)
    """,
)
def r1_regrid_ladder(spark, sf_dir):
    """R1 — per-group isobar-style regrid (reference regridADCPdata
    :876-981): per user, interpolate event values onto a fixed ladder of
    day-marks. Uses the measured-fastest impl (carry-buffer mapInPandas,
    0.97 s warm at sf0.1); the pure-JVM union+window formulation is
    result-identical (tests/test_regrid.py) and available via impl='jvm'."""
    ev = events(spark, sf_dir).withColumn(
        "x", (F.col("ts_us") - F.lit(_T0_US)) / F.lit(1000000.0)
    )
    ladder = [k * 86400.0 for k in range(30)]
    out = regrid_interp(
        ev, ["user_id"], "x", ["value"], ladder, x_name="x_target",
        impl="partitions", order_col="event_id"
    )
    return out.select("user_id", "x_target", r6(F.col("value")).alias("value"))


# ---------------------------------------------------------------------------
# Dedup / text / similarity / multimodal — LLM-data-pipeline operators
# (engine additions per BASELINE.json north star; not in the reference)
# ---------------------------------------------------------------------------

from .operators import text as T  # noqa: E402
from .operators.dedup import (  # noqa: E402
    exact_duplicates,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash32,
)
from .operators.multimodal import documents_as_media, extract_features  # noqa: E402
from .operators.similarity import brute_force_topk, lsh_topk  # noqa: E402

_TOK_SQL = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"

# 3-token shingles over the token list (1-based list indexing in DuckDB,
# matching Spark element_at) — see operators/dedup.py shingles()
_SHINGLE_SQL = f"""
      SELECT doc_id, unnest(
        CASE WHEN len(toks) >= 3
             THEN list_transform(generate_series(1, len(toks) - 2),
                                 i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
             ELSE [array_to_string(toks, ' ')] END) AS tok
      FROM (SELECT doc_id, {_TOK_SQL} AS toks FROM documents)
"""


@q(
    "dd_exact_dup",
    """
    SELECT md5(substr(text, 1, 40)) AS digest, min(doc_id) AS canonical_id,
           count(*) AS n_dups, max(doc_id) AS max_id
    FROM documents GROUP BY md5(substr(text, 1, 40)) HAVING count(*) > 1
    """,
)
def dd_exact_dup(spark, sf_dir):
    """Exact dedup via content-digest groupBy (hash-groupBy; shuffle volume
    = distinct digests). Keyed on a 40-char prefix digest here because the
    synthetic corpus has near-duplicates but zero byte-identical documents —
    the full-text variant is the same operator with ``key=F.col('text')``
    and would be a vacuous 0-row check."""
    docs = table(spark, sf_dir, "documents").withColumn(
        "text", F.substring(F.col("text"), 1, 40)
    )
    return exact_duplicates(docs)


@q(
    "dd_minhash_sig",
    f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, tok FROM ({_SHINGLE_SQL})
    )
    SELECT doc_id, s.seed, min(md5(s.seed::VARCHAR || ':' || md5(tok))) AS mh
    FROM toks CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS seed) s
    GROUP BY doc_id, s.seed
    """,
)
def dd_minhash_sig(spark, sf_dir):
    """MinHash signatures (K=16) over 3-token shingles — md5-hex min per
    (doc, seed); engine-portable uniform min-hash. Shingles (not unigrams)
    so word ORDER matters: same-vocabulary word-salad documents don't
    collapse into one bucket."""
    return minhash_signatures(table(spark, sf_dir, "documents"), k=16)


@q(
    "dd_minhash_lsh_pairs",
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
    )
    SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
    FROM bands a JOIN bands b ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
    """,
)
def dd_minhash_lsh_pairs(spark, sf_dir):
    """MinHash-LSH candidate pairs (16 hashes, 4 bands × 4 rows): bucket-join
    on band signature — the scalable near-dup candidate generator."""
    return lsh_candidate_pairs(table(spark, sf_dir, "documents"), k=16, band_rows=4)


@q(
    "dd_simhash",
    f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest({_TOK_SQL}) AS tok FROM documents
    ),
    th AS (
      SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM toks
    ),
    votes AS (
      SELECT doc_id, b.b,
             sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM th CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b) b
      GROUP BY doc_id, b.b
    )
    SELECT doc_id, CAST(sum(CASE WHEN v >= 0 THEN 1::BIGINT << b ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
    """,
)
def dd_simhash(spark, sf_dir):
    """32-bit SimHash per document (per-bit ±1 votes over md5-derived token
    hashes)."""
    return simhash32(table(spark, sf_dir, "documents"))


@q(
    "dd_ngram_jaccard",
    f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, lang, unnest({_TOK_SQL}) AS tok FROM documents
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS n_inter
      FROM toks a JOIN toks b ON a.lang = b.lang AND a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc1, doc2,
           round(CAST(n_inter AS DOUBLE)
                 / nullif(CAST(sa.sz + sb.sz - n_inter AS DOUBLE), 0.0), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc1
    JOIN sizes sb ON sb.doc_id = doc2
    WHERE CAST(n_inter AS DOUBLE) / nullif(CAST(sa.sz + sb.sz - n_inter AS DOUBLE), 0.0) >= 0.7
    """,
)
def dd_ngram_jaccard(spark, sf_dir):
    """Blocked pairwise token-set Jaccard (near-dup verification stage)."""
    out = ngram_jaccard_pairs(table(spark, sf_dir, "documents"), block_col="lang", threshold=0.7)
    return out.select("doc1", "doc2", r6(F.col("jaccard")).alias("jaccard"))


@q(
    "dd_jaccard_prefix_pairs",
    f"""
    WITH tok AS (
      SELECT DISTINCT doc_id AS id, unnest({_TOK_SQL}) AS tok FROM documents
    ),
    dfreq AS (SELECT tok, count(*) AS dfr FROM tok GROUP BY 1),
    lists AS (
      SELECT id, array_agg(t.tok ORDER BY d.dfr, t.tok) AS ord
      FROM tok t JOIN dfreq d USING (tok) GROUP BY id
    ),
    meta AS (
      SELECT id, ord, len(ord) AS n,
             CAST(len(ord) - ceil(0.8 * len(ord)) + 1 AS INT) AS plen
      FROM lists
    ),
    pref AS (SELECT id, n, unnest(list_slice(ord, 1, plen)) AS tok FROM meta),
    cand AS (
      SELECT DISTINCT a.id AS id1, b.id AS id2
      FROM pref a JOIN pref b
        ON a.tok = b.tok AND a.id < b.id
       AND CAST(least(a.n, b.n) AS DOUBLE) >= 0.8 * greatest(a.n, b.n)
    ),
    v AS (
      SELECT id1, id2,
             len(list_intersect(m1.ord, m2.ord)) AS inter,
             m1.n + m2.n - len(list_intersect(m1.ord, m2.ord)) AS uni
      FROM cand
      JOIN meta m1 ON id1 = m1.id
      JOIN meta m2 ON id2 = m2.id
    )
    SELECT id1 AS doc_id1, id2 AS doc_id2, inter, uni,
           floor(CAST(inter AS DOUBLE) / uni * 1000000.0 + 0.5) / 1000000.0
             AS jaccard
    FROM v WHERE CAST(inter AS DOUBLE) >= 0.8 * uni
    """,
)
def dd_jaccard_prefix_pairs(spark, sf_dir):
    """EXACT Jaccard ≥ 0.8 similarity self-join with AllPairs/PPJoin
    prefix filtering (operators/dedup.py::jaccard_prefix_join) — the
    zero-false-negative dedup path beside MinHash-LSH: candidates come
    from an equi-join on each document's rare-first token PREFIX
    (n − ceil(t·n) + 1 tokens), length-filtered, then verified by exact
    array_intersect. No all-pairs or blocking stage; candidate volume is
    the prefix-token collision count, the published AllPairs bound. The
    oracle replays the identical prefix algebra; every comparison is on
    integers or identical IEEE products, so the match is exact."""
    from .operators.dedup import jaccard_prefix_join

    out = jaccard_prefix_join(table(spark, sf_dir, "documents"), threshold=0.8)
    return out.select(
        F.col("id1").alias("doc_id1"),
        F.col("id2").alias("doc_id2"),
        "inter",
        "uni",
        "jaccard",
    )


@q(
    "dd_lsh_recall_report",
    f"""
    WITH tok AS (SELECT DISTINCT doc_id AS id, tok FROM ({_SHINGLE_SQL})),
    dfreq AS (SELECT tok, count(*) AS dfr FROM tok GROUP BY 1),
    lists AS (
      SELECT id, array_agg(t.tok ORDER BY d.dfr, t.tok) AS ord
      FROM tok t JOIN dfreq d USING (tok) GROUP BY id
    ),
    meta AS (
      SELECT id, ord, len(ord) AS n,
             CAST(len(ord) - ceil(0.8 * len(ord)) + 1 AS INT) AS plen
      FROM lists
    ),
    pref AS (SELECT id, n, unnest(list_slice(ord, 1, plen)) AS tok FROM meta),
    pcand AS (
      SELECT DISTINCT a.id AS id1, b.id AS id2
      FROM pref a JOIN pref b
        ON a.tok = b.tok AND a.id < b.id
       AND CAST(least(a.n, b.n) AS DOUBLE) >= 0.8 * greatest(a.n, b.n)
    ),
    v AS (
      SELECT id1, id2,
             len(list_intersect(m1.ord, m2.ord)) AS inter,
             m1.n + m2.n - len(list_intersect(m1.ord, m2.ord)) AS uni
      FROM pcand
      JOIN meta m1 ON id1 = m1.id
      JOIN meta m2 ON id2 = m2.id
    ),
    truth AS (SELECT id1, id2 FROM v WHERE CAST(inter AS DOUBLE) >= 0.8 * uni),
    lsh AS (SELECT doc1, doc2 FROM ({ORACLES["dd_minhash_lsh_pairs"]})),
    m AS (
      SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true,
             CAST((SELECT count(*) FROM lsh) AS BIGINT) AS n_cand,
             CAST((SELECT count(*) FROM truth t
                   WHERE EXISTS (SELECT 1 FROM lsh l
                                 WHERE l.doc1 = t.id1 AND l.doc2 = t.id2))
                  AS BIGINT) AS n_hit
    )
    SELECT n_true, n_cand, n_hit,
           floor(CAST(n_hit AS DOUBLE) / nullif(n_true, 0) * 1000000.0 + 0.5)
             / 1000000.0 AS recall,
           floor(CAST(n_hit AS DOUBLE) / nullif(n_cand, 0) * 1000000.0 + 0.5)
             / 1000000.0 AS prec
    FROM m
    """,
)
def dd_lsh_recall_report(spark, sf_dir):
    """Banding-recall evaluation of the MinHash-LSH candidate generator
    against EXACT shingle-Jaccard ground truth — the measurement a dedup
    pipeline owes before trusting its probabilistic path. Ground truth:
    jaccard_prefix_join at t=0.8 over the SAME 3-token-shingle universe
    the 16-hash/4-band LSH signatures summarize (token_df override), so
    recall is the true banding s-curve sample (analytic expectation at
    J=0.8: 1−(1−0.8⁴)⁴ ≈ 0.88, higher for closer pairs) and precision is
    the candidate-verification survival rate. Everything is
    deterministic (md5 hashes, exact prefix algebra), so this
    APPROXIMATE-path evaluation has an EXACT oracle. One row:
    (n_true, n_cand, n_hit, recall, prec)."""
    from .operators.dedup import (
        jaccard_prefix_join,
        lsh_candidate_pairs,
        shingles_from_tokens,
        tokens,
    )

    docs = table(spark, sf_dir, "documents")
    staged = docs.select("doc_id", tokens(F.col("text")).alias("__toks"))
    sh = staged.select(
        "doc_id", F.explode(shingles_from_tokens(F.col("__toks"), 3)).alias("tok")
    )
    truth = jaccard_prefix_join(docs, 0.8, token_df=sh).select("id1", "id2").cache()
    cand = lsh_candidate_pairs(docs, k=16, band_rows=4).cache()
    nt = truth.agg(F.count("*").alias("n_true")).withColumn("__k", F.lit(1))
    nc = cand.agg(F.count("*").alias("n_cand")).withColumn("__k", F.lit(1))
    nh = (
        truth.join(
            cand,
            (F.col("id1") == F.col("doc1")) & (F.col("id2") == F.col("doc2")),
            "left_semi",
        )
        .agg(F.count("*").alias("n_hit"))
        .withColumn("__k", F.lit(1))
    )
    one = nt.join(nc, "__k").join(nh, "__k").drop("__k")
    return one.select(
        "n_true",
        "n_cand",
        "n_hit",
        r6p(
            F.col("n_hit").cast("double") / F.nullif(F.col("n_true"), F.lit(0)).cast("double")
        ).alias("recall"),
        r6p(
            F.col("n_hit").cast("double") / F.nullif(F.col("n_cand"), F.lit(0)).cast("double")
        ).alias("prec"),
    )


@q(
    "dd_embedding_dup",
    """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           round(list_dot_product(a.v, b.v)
                 / nullif(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)), 0.0),
                 6) AS sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.v, b.v)
                / nullif(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)), 0.0),
                6) >= 0.3
    """,
)
def dd_embedding_dup(spark, sf_dir):
    """Embedding-cosine near-dup pairs, blocked by label (at scale the block
    is an LSH bucket). Threshold applied on the ROUNDED similarity so the
    cut is engine-deterministic."""
    from .operators.similarity import cosine

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    a = e.select(F.col("vec_id").alias("id1"), F.col("label").alias("l1"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("id2"), F.col("label").alias("l2"), F.col("v").alias("vb"))
    pairs = a.join(b, (F.col("l1") == F.col("l2")) & (F.col("id1") < F.col("id2")))
    sim = F.round(cosine(F.col("va"), F.col("vb")), 6)
    return pairs.select("id1", "id2", sim.alias("sim")).filter(F.col("sim") >= 0.3)


def _brute_oracle_sql(k: int = 5) -> str:
    """DuckDB replay of similarity.brute_force_topk — shared by the
    ann_topk_bruteforce gate and as the truth leg of ann_recall_report."""
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS vq FROM e WHERE vec_id < 10),
    c AS (
      SELECT q.query_id, e.vec_id AS nbr_id,
             round(list_dot_product(q.vq, e.v)
                   / nullif(sqrt(list_dot_product(q.vq, q.vq)) * sqrt(list_dot_product(e.v, e.v)), 0.0),
                   6) AS sim
      FROM q CROSS JOIN e WHERE e.vec_id <> q.query_id
    ),
    r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, nbr_id ASC) AS rank
          FROM c)
    SELECT query_id, rank, nbr_id, sim FROM r WHERE rank <= {k}
    """


@q("ann_topk_bruteforce", _brute_oracle_sql())
def ann_topk_bruteforce(spark, sf_dir):
    """Exact brute-force cosine top-k (k=5) for the first 10 vectors as
    queries — the ANN correctness baseline. Rank on ROUNDED sim with vec_id
    tiebreak (engine-deterministic ordering)."""
    e = table(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("query_id"), "embedding")
    return brute_force_topk(e, qs, k=5)


@q(
    "ann_hard_negatives",
    """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, label AS q_label, v AS vq
          FROM e WHERE vec_id < 10),
    c AS (
      SELECT q.query_id, e.vec_id AS nbr_id, e.label AS neg_label,
             round(list_dot_product(q.vq, e.v)
                   / nullif(sqrt(list_dot_product(q.vq, q.vq))
                            * sqrt(list_dot_product(e.v, e.v)), 0.0),
                   6) AS sim
      FROM q CROSS JOIN e
      WHERE e.vec_id <> q.query_id AND e.label <> q.q_label
    ),
    r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, nbr_id ASC) AS rank
          FROM c)
    SELECT query_id, rank, nbr_id, neg_label, sim FROM r WHERE rank <= 5
    """,
)
def ann_hard_negatives(spark, sf_dir):
    """Hard-negative mining (operators/similarity.py::hard_negatives):
    per query, the 5 most cosine-similar vectors with a DIFFERENT label —
    the contrastive-training pair miner. Declared-exact |queries|-bounded
    crossJoin (the ann_topk_bruteforce pattern); at production query
    volume the label filter composes with the lsh_topk/ivf_topk shortlist
    generators instead."""
    from .operators.similarity import hard_negatives

    e = table(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    return hard_negatives(e, qs, k=5)


def _lsh_oracle_sql(
    k: int = 5, band_width: int = 4, n_bands: int = 20, dim: int = 64, seed: int = 42
) -> str:
    """DuckDB replay of similarity.lsh_topk with the SAME seed-42 plane
    constants embedded as literals: identical sign-bit buckets, any-band
    candidate join, 6-dp cosine re-rank, (sim desc, nbr_id) tie-break —
    the approximate path is deterministic, so it gets an EXACT oracle
    (upgraded from rows-only in round 3; recall quality is measured
    separately in tests/test_similarity_recall.py)."""
    from .operators.similarity import gaussian_planes

    planes = gaussian_planes(n_bands * band_width, dim, seed)
    vals = ",\n      ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in p)}])"
        for i, p in enumerate(planes)
    )
    return f"""
    WITH planes AS MATERIALIZED (SELECT * FROM (VALUES {vals}) t(pid, p)),
    v AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    bits AS MATERIALIZED (
      SELECT v.vec_id, planes.pid,
             CASE WHEN list_dot_product(v.emb, planes.p) >= 0 THEN 1 ELSE 0 END AS bit
      FROM v CROSS JOIN planes
    ),
    buckets AS MATERIALIZED (
      SELECT vec_id, pid // {band_width} AS band,
             SUM(bit * (1 << ({band_width - 1} - (pid % {band_width})))) AS bucket
      FROM bits GROUP BY 1, 2
    ),
    cand AS MATERIALIZED (
      SELECT DISTINCT q.vec_id AS query_id, e.vec_id AS nbr_id
      FROM buckets q JOIN buckets e ON q.band = e.band AND q.bucket = e.bucket
      WHERE q.vec_id < 10 AND e.vec_id != q.vec_id
    ),
    scored AS MATERIALIZED (
      SELECT c.query_id, c.nbr_id,
             round(list_dot_product(a.emb, b.emb)
                   / (sqrt(list_dot_product(a.emb, a.emb))
                      * sqrt(list_dot_product(b.emb, b.emb))), 6) AS sim
      FROM cand c JOIN v a ON a.vec_id = c.query_id JOIN v b ON b.vec_id = c.nbr_id
    )
    SELECT query_id, CAST(rn AS INTEGER) AS rank, nbr_id, sim FROM (
      SELECT query_id, nbr_id, sim,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, nbr_id) AS rn
      FROM scored
    ) WHERE rn <= {k}
    """


@q("ann_topk_lsh", _lsh_oracle_sql())
def ann_topk_lsh(spark, sf_dir):
    """Approximate ANN: banded OR-amplified hyperplane LSH (20 bands × 4
    sign bits) restricts the candidate join — the 100 TB scale path
    (equi-join on (band, bucket) instead of crossJoin); recall@5 ≈ 0.94 vs
    brute force on this fixture (tests/test_similarity_recall.py).
    Approximate ⇒ no SQL oracle; driver records rows-only."""
    e = table(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("query_id"), "embedding")
    return lsh_topk(e, qs, dim=64, k=5)


_SW_SQL = {
    lang: "[" + ", ".join(f"'{w}'" for w in words) + "]"
    for lang, words in T.STOPWORDS.items()
}


@q(
    "txt_langid",
    f"""
    WITH v AS (
      SELECT doc_id, lang,
             len(list_filter({_TOK_SQL}, x -> list_contains({_SW_SQL['de']}, x))) AS v_de,
             len(list_filter({_TOK_SQL}, x -> list_contains({_SW_SQL['en']}, x))) AS v_en,
             len(list_filter({_TOK_SQL}, x -> list_contains({_SW_SQL['es']}, x))) AS v_es,
             len(list_filter({_TOK_SQL}, x -> list_contains({_SW_SQL['fr']}, x))) AS v_fr,
             len(list_filter({_TOK_SQL}, x -> list_contains({_SW_SQL['zh']}, x))) AS v_zh
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN greatest(v_de, v_en, v_es, v_fr, v_zh) = 0 THEN 'und'
                WHEN v_de = greatest(v_de, v_en, v_es, v_fr, v_zh) THEN 'de'
                WHEN v_en = greatest(v_de, v_en, v_es, v_fr, v_zh) THEN 'en'
                WHEN v_es = greatest(v_de, v_en, v_es, v_fr, v_zh) THEN 'es'
                WHEN v_fr = greatest(v_de, v_en, v_es, v_fr, v_zh) THEN 'fr'
                ELSE 'zh' END AS lang_guess
    FROM v
    """,
)
def txt_langid(spark, sf_dir):
    """Language-ID heuristic: stopword votes, argmax with deterministic
    sorted-language tiebreak, 'und' when no votes."""
    docs = table(spark, sf_dir, "documents")
    return T.langid(docs).select("doc_id", "lang", "lang_guess")


@q(
    "q_kappa_langid",
    f"""
    WITH lid AS (SELECT lang, lang_guess FROM ({ORACLES["txt_langid"]})),
    cells AS (SELECT lang, lang_guess, count(*) AS n FROM lid GROUP BY 1, 2),
    rowm AS (SELECT lang, sum(n) AS nr FROM cells GROUP BY 1),
    colm AS (SELECT lang_guess, sum(n) AS nc FROM cells GROUP BY 1),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cells),
    agree AS (SELECT CAST(COALESCE(sum(n), 0) AS BIGINT) AS diag
              FROM cells WHERE lang = lang_guess),
    pe AS (SELECT CAST(COALESCE(sum(nr * nc), 0) AS BIGINT) AS cross_sum
           FROM rowm JOIN colm ON rowm.lang = colm.lang_guess)
    SELECT nn AS n, diag AS n_agree,
           floor(CAST(diag AS DOUBLE) / nn * 1000000.0 + 0.5) / 1000000.0 AS po,
           floor(CAST(cross_sum AS DOUBLE) / nn / nn * 1000000.0 + 0.5)
             / 1000000.0 AS pe,
           floor((CAST(diag AS DOUBLE) / nn - CAST(cross_sum AS DOUBLE) / nn / nn)
                 / nullif(1.0 - CAST(cross_sum AS DOUBLE) / nn / nn, 0.0)
                 * 1000000.0 + 0.5) / 1000000.0 AS kappa
    FROM tot, agree, pe
    """,
)
def q_kappa_langid(spark, sf_dir):
    """Cohen's kappa between the stored language label and the n-gram
    langid heuristic — chance-corrected inter-rater agreement, the
    honest readout of a heuristic classifier on a skewed label mix
    (plain accuracy rewards majority-class guessing; kappa subtracts the
    marginal-product chance term). Scale shape: one |langs|²-cell
    contingency aggregate, then margins as two tiny aggregates joined
    back (no windows at all, no second scan of the rows). All counts
    stay BIGINT; po/pe/kappa derive from identical IEEE expressions in
    both engines, so the oracle match is exact."""
    docs = table(spark, sf_dir, "documents")
    lid = T.langid(docs).select("lang", "lang_guess")
    # cache: the expensive langid scan sits under FOUR consumers (rowm,
    # colm, tot, agree) and Spark does not dedupe common subplans — the
    # uncached form re-ran the n-gram scoring pass four times
    cells = (
        lid.groupBy("lang", "lang_guess").agg(F.count("*").alias("n")).cache()
    )
    rowm = cells.groupBy("lang").agg(F.sum("n").alias("nr"))
    colm = cells.groupBy("lang_guess").agg(F.sum("n").alias("nc"))
    tot = cells.agg(F.sum("n").cast("bigint").alias("nn"))
    agree = (
        cells.filter(F.col("lang") == F.col("lang_guess"))
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("diag"))
    )
    cross = (
        rowm.join(colm, rowm["lang"] == colm["lang_guess"])
        .agg(F.coalesce(F.sum(F.col("nr") * F.col("nc")), F.lit(0)).cast("bigint").alias("cross_sum"))
    )
    one = (
        tot.withColumn("__k", F.lit(1))
        .join(agree.withColumn("__k", F.lit(1)), "__k")
        .join(cross.withColumn("__k", F.lit(1)), "__k")
        .drop("__k")
    )
    po = F.col("diag").cast("double") / F.col("nn")
    pe = F.col("cross_sum").cast("double") / F.col("nn") / F.col("nn")
    return one.select(
        F.col("nn").alias("n"),
        F.col("diag").alias("n_agree"),
        r6p(po).alias("po"),
        r6p(pe).alias("pe"),
        r6p((po - pe) / F.nullif(F.lit(1.0) - pe, F.lit(0.0))).alias("kappa"),
    )


@q(
    "txt_quality",
    f"""
    WITH t AS (
      SELECT doc_id, length(text) AS n_chars_m,
             len({_TOK_SQL}) AS n_tokens,
             len(list_distinct({_TOK_SQL})) AS n_distinct_tokens,
             length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct
      FROM documents
    )
    SELECT doc_id, n_chars_m, n_tokens, n_distinct_tokens,
           round(CAST(n_distinct_tokens AS DOUBLE) / nullif(CAST(n_tokens AS DOUBLE), 0.0), 6) AS ttr,
           round(CAST(n_chars_m - n_tokens + 1 AS DOUBLE) / nullif(CAST(n_tokens AS DOUBLE), 0.0), 6)
             AS mean_tok_len,
           round(CAST(n_punct AS DOUBLE) / nullif(CAST(n_chars_m AS DOUBLE), 0.0), 6) AS punct_ratio
    FROM t
    """,
)
def txt_quality(spark, sf_dir):
    """Quality-scoring features: length, token counts, type-token ratio,
    mean token length, punctuation ratio — pure codegen expressions."""
    docs = T.quality_features(table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.col("n_chars_m").cast("long").alias("n_chars_m"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_distinct_tokens").cast("long").alias("n_distinct_tokens"),
        "ttr",
        "mean_tok_len",
        "punct_ratio",
    )


@q(
    "txt_fingerprint",
    """
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[.,;:!?]', '', 'g'),
                                   '\\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def txt_fingerprint(spark, sf_dir):
    """Normalization-robust document fingerprint (lowercase → strip punct →
    collapse whitespace → md5)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.fingerprint(F.col("text")).alias("fp"))


@q(
    "mm_media_features",
    """
    SELECT doc_id AS media_id, 'image' AS kind,
           33 + octet_length(encode(text)) AS n_bytes,
           CAST(1 + doc_id % 64 AS BIGINT) AS width,
           CAST(1 + doc_id % 48 AS BIGINT) AS height
    FROM documents
    """,
)
def mm_media_features(spark, sf_dir):
    """Multimodal feature extraction over binary payloads (mapInPandas,
    Arrow-batched). The payload is a PNG-shaped container (33-byte real
    signature+IHDR wrapping the text bytes, dimensions derived from
    doc_id), so width/height come from the REAL pure-python PNG header
    parse and the oracle can recompute them arithmetically; deeper pixel
    decode stays gated on the absent media libs."""
    media = documents_as_media(table(spark, sf_dir, "documents"))
    feats = extract_features(media)
    return feats.select("media_id", "kind", "n_bytes", "width", "height")


@q(
    "st_windowed_counts",
    """
    SELECT epoch_us(ts) // 3600000000 AS hour_bucket, event_type,
           count(*) AS n, round(sum(value), 6) AS sum_v
    FROM events GROUP BY 1, 2
    """,
)
def st_windowed_counts(spark, sf_dir):
    """Tumbling-window aggregation (batch form of the Structured Streaming
    windowed count in streaming/windowed.py; same logical plan)."""
    ev = events(spark, sf_dir)
    return ev.groupBy(
        F.expr("ts_us div 3600000000").alias("hour_bucket"), "event_type"
    ).agg(F.count("*").alias("n"), r6(F.sum("value")).alias("sum_v"))


@q(
    "dd_contamination",
    f"""
    WITH sh AS (SELECT DISTINCT doc_id, tok FROM ({_SHINGLE_SQL})),
    hold AS (SELECT doc_id AS h_id, tok FROM sh WHERE doc_id % 50 = 0),
    train AS (SELECT doc_id, tok FROM sh WHERE doc_id % 50 <> 0)
    SELECT t.doc_id, count(DISTINCT t.tok) AS n_shared_shingles,
           count(DISTINCT h.h_id) AS n_holdout_docs
    FROM train t JOIN hold h ON t.tok = h.tok
    GROUP BY t.doc_id
    """,
)
def dd_contamination(spark, sf_dir):
    """Benchmark decontamination: training docs sharing any 3-token
    shingle with the holdout/eval slice (doc_id % 50 == 0 stands in for
    the eval set). The holdout shingle set is small by construction →
    broadcast join against the train shingle stream; shuffle volume is
    |contaminated (doc, shingle)| only. The standard n-gram-overlap
    decontamination pass (à la GPT-3/PaLM appendix methodology)."""
    from .operators.dedup import doc_shingles

    docs = table(spark, sf_dir, "documents")
    sh = doc_shingles(docs, 3)
    hold = sh.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("h_id"), "tok"
    )
    train = sh.filter(F.col("doc_id") % 50 != 0)
    return (
        train.join(F.broadcast(hold), "tok")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("tok").alias("n_shared_shingles"),
            F.count_distinct("h_id").alias("n_holdout_docs"),
        )
    )


@q(
    "txt_repetition",
    f"""
    WITH tk AS (SELECT doc_id, {_TOK_SQL} AS toks FROM documents),
    tok AS (
      SELECT doc_id, t AS term FROM (SELECT doc_id, unnest(toks) AS t FROM tk)
    ),
    bg AS (
      SELECT doc_id, t AS term FROM (
        SELECT doc_id, unnest(
          CASE WHEN len(toks) >= 2
               THEN list_transform(generate_series(1, len(toks) - 1),
                                   i -> toks[i] || ' ' || toks[i + 1])
               ELSE [] END) AS t
        FROM tk)
    ),
    tokc AS (
      SELECT doc_id, CAST(sum(n) AS BIGINT) AS tok_total, max(n) AS tok_top_n FROM (
        SELECT doc_id, term, count(*) AS n FROM tok GROUP BY doc_id, term)
      GROUP BY doc_id
    ),
    bgc AS (
      SELECT doc_id, CAST(sum(n) AS BIGINT) AS bigram_total, max(n) AS bigram_top_n FROM (
        SELECT doc_id, term, count(*) AS n FROM bg GROUP BY doc_id, term)
      GROUP BY doc_id
    )
    SELECT t.doc_id, t.tok_total, t.tok_top_n,
           round(CAST(t.tok_top_n AS DOUBLE)
                 / nullif(CAST(t.tok_total AS DOUBLE), 0.0), 6) AS top_token_frac,
           coalesce(b.bigram_total, 0) AS bigram_total,
           coalesce(b.bigram_top_n, 0) AS bigram_top_n,
           round(CAST(b.bigram_top_n AS DOUBLE)
                 / nullif(CAST(b.bigram_total AS DOUBLE), 0.0), 6) AS top_bigram_frac
    FROM tokc t LEFT JOIN bgc b USING (doc_id)
    """,
)
def txt_repetition(spark, sf_dir):
    """Gopher-style repetition quality signals: fraction of the token
    stream consumed by the most frequent token / bigram (boilerplate and
    spam score high; pre-training filters threshold on these). Only max
    COUNTS are emitted, so term-frequency ties can't make results
    engine-dependent."""
    from .operators.text import repetition_features

    docs = table(spark, sf_dir, "documents")
    return repetition_features(docs)


@q(
    "q_interval_join",
    """
    SELECT a.event_id AS left_id, b.event_id AS right_id, a.user_id,
           epoch_us(a.ts) AS t_left, epoch_us(b.ts) AS t_right
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 600000000
     AND a.event_id <> b.event_id
    """,
)
def q_interval_join(spark, sf_dir):
    """Range join: pairs of events of the same user within ±10 minutes —
    the batch form of a watermarked stream-stream interval join. Bucketed
    by t div tol with a 3-bucket probe so the planner sees a bounded
    equi-join, never an unbounded per-key theta join
    (operators/joins.py::interval_join)."""
    from .operators.joins import interval_join

    ev = events(spark, sf_dir).select("event_id", "user_id", "ts_us")
    left = ev.select(F.col("event_id").alias("left_id"), "user_id", F.col("ts_us"))
    right = ev.select(F.col("event_id").alias("right_id"), "user_id", "ts_us")
    out = interval_join(left, right, on=["user_id"], time_col="ts_us", tol=600000000)
    return out.filter(F.col("left_id") != F.col("right_id")).select(
        "left_id",
        "right_id",
        "user_id",
        F.col("ts_us").alias("t_left"),
        F.col("ts_us_right").alias("t_right"),
    )


@q(
    "st_first_seen",
    """
    SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id, event_type ORDER BY epoch_us(ts), event_id
      ) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
)
def st_first_seen(spark, sf_dir):
    """First-seen dedup per (user, event_type) — the batch twin of the
    streaming dropDuplicatesWithinWatermark operator
    (streaming/dedup.py; equivalence pinned by
    tests/test_streaming_dedup.py). min_by with a (ts, id) struct key:
    one groupBy, map-side partial min."""
    from .streaming.dedup import first_seen

    ev = events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "ts_us", "value"
    )
    out = first_seen(ev, ["user_id", "event_type"], time_col="ts_us")
    return out.select("event_id", "user_id", "event_type", "ts_us", "value")


# ---------------------------------------------------------------------------
# Batch 4 — Spark-native relational surface (set ops, top-k, pivot) and
# composite reference-math queries
# ---------------------------------------------------------------------------


@q(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           round(sum(l_extendedprice), 4) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1-style pricing summary — the canonical multi-aggregate scan
    (Spark-native surface; exercises the same partial-agg path as grid2d)."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "2000-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (F.lit(1) + F.col("l_tax"))), 4).alias("sum_charge"),
            r6(F.avg("l_quantity")).alias("avg_qty"),
            r6(F.avg("l_extendedprice")).alias("avg_price"),
            r6(F.avg("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@q(
    "q_topk_orders",
    """
    WITH r AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
      FROM orders
    )
    SELECT rank, o_orderkey, o_custkey, o_totalprice FROM r WHERE rank <= 10
    """,
)
def q_topk_orders(spark, sf_dir):
    """Top-k with deterministic tiebreak (engine-portable ordering).

    Physical strategy: ``orderBy().limit(k)`` executes as a distributed
    TakeOrdered (per-partition top-k, then merge) — a global row_number
    window would move ALL rows to one partition. The rank column is then a
    window over the already-collected k rows (trivial)."""
    o = table(spark, sf_dir, "orders")
    top = o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc()).limit(10)
    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "o_orderkey", "o_custkey", "o_totalprice"
    )


@q(
    "q_set_ops",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
)
def q_set_ops(spark, sf_dir):
    """Set operator surface (INTERSECT; UNION/EXCEPT are the same code
    path). The reference has no set ops (SURVEY §2.5 note) — Spark-native."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    recent = o.filter(F.col("o_orderdate") >= "2000-01-01").select(
        F.col("o_custkey").alias("custkey")
    )
    rich = c.filter(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("custkey"))
    return recent.intersect(rich)


@q(
    "r2_pivot_export",
    """
    SELECT l_linenumber,
           round(avg(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 6) AS A,
           round(avg(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 6) AS N,
           round(avg(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 6) AS R
    FROM lineitem GROUP BY l_linenumber
    """,
)
def r2_pivot_export(spark, sf_dir):
    """R2 — long→wide pivot, the export-time densification (reference
    make_dataset :2029-2043 assembles wide grids; mid-pipeline stays long)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linenumber")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(r6(F.avg("l_quantity")))
    )


@q(
    "ref_vertical_integration",
    """
    WITH g AS (
      SELECT user_id, event_id, epoch_us(ts) AS tu,
             CAST(round(value * 10000.0) AS BIGINT) AS su
      FROM events
    ),
    v AS (
      SELECT user_id, event_id, su,
             sum(su) OVER (PARTITION BY user_id ORDER BY tu, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_u
      FROM g
    ),
    p AS (
      SELECT user_id, event_id, cum_u,
             count(cum_u) OVER (PARTITION BY user_id) AS n,
             sum(cum_u) OVER (PARTITION BY user_id) AS s,
             sum(su) OVER (PARTITION BY user_id) AS dac_u
      FROM v
    )
    SELECT user_id, event_id,
           CAST(cum_u * n - s + dac_u AS BIGINT) AS referenced_num,
           CAST(n * 10000 AS BIGINT) AS referenced_den
    FROM p
    """,
)
def ref_vertical_integration(spark, sf_dir):
    """Composite reference-shear math (reference reference_shear :1676-1717):
    cumulative integration of a shear proxy, per-profile demean, and a
    DAC-style reference re-add — W3+W6 in one lineage on events.

    The result is emitted as an EXACT rational (numerator, denominator) in
    BIGINT µ-units of the shear proxy — float window-aggregation order
    differs between engines, the tidy 2-decimal inputs land mid-aggregates
    exactly on round-half boundaries, and even a final round() of identical
    doubles can disagree (Spark rounds the exact decimal expansion via
    BigDecimal; DuckDB multiplies by 10^k first) — found the hard way at
    sf0.01. Integer arithmetic sidesteps the whole class."""
    ev = events(spark, sf_dir)
    ev = ev.withColumn("su", F.round(F.col("value") * 10000.0).cast("long"))
    ev = ev.withColumn("cum_u", W.cumsum("su", ["user_id"], EV_ORDER, nan_as_zero=False))
    wq = Window.partitionBy("user_id")
    n = F.count("cum_u").over(wq)
    s = F.sum("cum_u").over(wq)
    dac_u = F.sum("su").over(wq)
    return ev.select(
        "user_id",
        "event_id",
        (F.col("cum_u") * n - s + dac_u).alias("referenced_num"),
        (n * F.lit(10000)).cast("long").alias("referenced_den"),
    )


@q(
    "a2_orientation_detect",
    """
    SELECT CAST(avg(CASE WHEN event_type = 'error' THEN value END) < 50.0 AS BOOLEAN)
             AS top_mounted_analog,
           count(*) AS n
    FROM events
    """,
)
def a2_orientation_detect(spark, sf_dir):
    """A2 — the orientation-detect control-flow scalar (reference :210-213
    MagnetometerZ.mean() < 0) as a checkable aggregate."""
    ev = events(spark, sf_dir)
    return ev.agg(
        (F.avg(F.when(F.col("event_type") == "error", F.col("value"))) < 50.0)
        .cast("boolean")
        .alias("top_mounted_analog"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# Batch 5 — relational completeness (semi/anti, rollup), UDF surface,
# simhash pairs, sessionization
# ---------------------------------------------------------------------------


@q(
    "q_semi_anti_join",
    """
    SELECT 'with_orders' AS side, count(*) AS n FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'without_orders' AS side, count(*) AS n FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_semi_anti_join(spark, sf_dir):
    """Semi/anti join surface (Spark-native; the reference has no equi-joins
    at all — SURVEY §2.3 note)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").agg(F.count("*").alias("n")).select(
        F.lit("with_orders").alias("side"), "n"
    )
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(F.count("*").alias("n")).select(
        F.lit("without_orders").alias("side"), "n"
    )
    return semi.unionByName(anti)


@q(
    "q_rollup",
    """
    SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark, sf_dir):
    """Hierarchical rollup (the 'hypertable rollup' analog): subtotals per
    (flag, status), per flag, and grand total in one pass."""
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"), F.count("*").alias("n")
    )


@q(
    "udf_soundspeed_mackenzie",
    """
    SELECT l_orderkey, l_linenumber,
           round(1448.96 + 4.591 * t - 5.304e-2 * t * t + 2.374e-4 * t * t * t
                 + 1.340 * (s - 35.0) + 1.630e-2 * d + 1.675e-7 * d * d
                 - 1.025e-2 * t * (s - 35.0) - 7.139e-13 * t * d * d * d, 6) AS c_ms
    FROM (
      SELECT l_orderkey, l_linenumber, l_quantity / 2.0 AS t,
             34.0 + l_tax * 10.0 AS s, l_extendedprice / 100.0 AS d
      FROM lineitem
    )
    """,
)
def udf_soundspeed_mackenzie(spark, sf_dir):
    """UDF surface (SURVEY §2.9 / F7): Mackenzie (1981) soundspeed as an
    Arrow-batched pandas UDF — numpy double arithmetic in the same operation
    order as the SQL oracle, so results are bit-identical before rounding.
    Demonstrates the vectorized-UDF escape hatch staying oracle-checkable."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def mackenzie(t, s, d):
        return (
            1448.96
            + 4.591 * t
            - 5.304e-2 * t * t
            + 2.374e-4 * t * t * t
            + 1.340 * (s - 35.0)
            + 1.630e-2 * d
            + 1.675e-7 * d * d
            - 1.025e-2 * t * (s - 35.0)
            - 7.139e-13 * t * d * d * d
        )

    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        r6(
            mackenzie(
                F.col("l_quantity") / 2.0,
                F.lit(34.0) + F.col("l_tax") * 10.0,
                F.col("l_extendedprice") / 100.0,
            )
        ).alias("c_ms"),
    )


@q(
    "udf_trimmed_mean",
    """
    WITH v AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events WHERE value IS NOT NULL
    ),
    t AS (SELECT event_type, value FROM v
          WHERE rn > floor(n * 0.1) AND rn <= n - floor(n * 0.1))
    SELECT event_type, round(avg(value), 6) AS trimmed_mean
    FROM t GROUP BY event_type
    """,
)
def udf_trimmed_mean(spark, sf_dir):
    """§2.9 GROUPED_AGG surface (functions/grouped.py::trimmed_mean_udf):
    per-event-type 10 %-trimmed mean of value via an Arrow
    grouped-aggregate pandas UDF — the Series→scalar UDF shape, completing
    the Python-boundary family (scalar pandas_udf, grouped-map, cogrouped,
    mapInPandas, mapInArrow, UDTF, applyInPandasWithState, and now the
    pandas UDAF). Right boundary for order statistics with no
    sufficient-statistic split; the k = floor(n·trim) drop count is the
    identical IEEE double product in pandas and the oracle, so the kept
    multiset matches exactly and only the 6-dp-rounded mean is compared."""
    from .functions.grouped import group_trimmed_means

    ev = events(spark, sf_dir).filter(F.col("value").isNotNull())
    out = group_trimmed_means(ev, ["event_type"], "value", trim=0.1)
    return out.select("event_type", r6(F.col("trimmed_mean")).alias("trimmed_mean"))


@q(
    "dd_simhash_pairs",
    f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest({_TOK_SQL}) AS tok FROM documents
    ),
    th AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM toks),
    votes AS (
      SELECT doc_id, b.b, sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM th CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b) b
      GROUP BY doc_id, b.b
    ),
    sh AS (
      SELECT doc_id, CAST(sum(CASE WHEN v >= 0 THEN 1::BIGINT << b ELSE 0 END) AS BIGINT) AS simhash
      FROM votes GROUP BY doc_id
    )
    SELECT a.doc_id AS doc1, b.doc_id AS doc2,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def dd_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs: hamming distance of 32-bit fingerprints ≤ 3.

    Pair generation BLOCKS on 8-bit bands (pigeonhole: ≤ 3 differing bits
    can dirty at most 3 of the 4 bands, so every qualifying pair matches
    EXACTLY in ≥ 1 band) — the join is a hash join on (band_idx,
    band_value) with candidates bounded by Σ bucket², then the exact
    hamming filter and a distinct (a pair can collide in up to 4 bands).
    The previous all-pairs `doc1 < doc2` nested-loop formulation is the
    O(N²) trap this replaces; the oracle keeps the all-pairs SQL, so the
    driver check proves the banding loses no pairs."""
    sh = simhash32(table(spark, sf_dir, "documents")).cache()  # self-joined
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("b_idx"),
                F.shiftright(F.col("simhash"), 8 * i).bitwiseAND(F.lit(255)).alias("b_val"),
            )
            for i in range(4)
        ]
    )
    sb = sh.select("doc_id", "simhash", F.explode(bands).alias("b")).select(
        "doc_id", "simhash", F.col("b.b_idx").alias("b_idx"), F.col("b.b_val").alias("b_val")
    )
    a = sb.select(
        F.col("doc_id").alias("doc1"), F.col("simhash").alias("h1"), "b_idx", "b_val"
    )
    b = sb.select(
        F.col("doc_id").alias("doc2"), F.col("simhash").alias("h2"), "b_idx", "b_val"
    )
    cand = (
        a.join(b, ["b_idx", "b_val"])
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2", "h1", "h2")
        .distinct()
    )
    hamming = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return cand.select("doc1", "doc2", hamming.cast("long").alias("hamming")).filter(
        F.col("hamming") <= 3
    )


@q(
    "q_sessionize",
    f"""
    WITH t AS (
      SELECT user_id, event_id, epoch_us(ts) AS tu,
             epoch_us(ts) - lag(epoch_us(ts)) OVER ({_EV_W_SQL}) AS gap_us
      FROM events
    )
    SELECT user_id, event_id,
           CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END)
                OVER ({_EV_W_SQL.replace("epoch_us(ts)", "tu")}
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
    FROM t
    """,
)
def q_sessionize(spark, sf_dir):
    """Session-gap sessionization (30-min gap): the batch equivalent of a
    session_window streaming aggregation — new session whenever the gap to
    the previous event exceeds the threshold (classic cumsum-of-boundaries,
    same shape as the reference's GPS-reset W4)."""
    ev = events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(*EV_ORDER)
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    boundary = F.when(gap.isNull() | (gap > 1800000000), 1).otherwise(0)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "user_id", "event_id", F.sum(boundary).over(wc).cast("long").alias("session_id")
    )


# ---------------------------------------------------------------------------
# Batch 6 — skew-safe aggregation, JSON extraction, time-range frames
# ---------------------------------------------------------------------------

from .operators.skew import salted_sum_count  # noqa: E402


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
    from .operators.similarity import ivf_topk

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
    from .operators.dedup import jaccard_on_pairs, lsh_candidate_pairs

    docs = table(spark, sf_dir, "documents")
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
    from .operators.dedup import jaccard_on_pairs, lsh_candidate_pairs
    from .operators.graph import dup_clusters

    docs = table(spark, sf_dir, "documents")
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
    from .operators.dedup import jaccard_on_pairs, lsh_candidate_pairs
    from .operators.graph import dup_clusters

    docs = table(spark, sf_dir, "documents")
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
    from .pipeline.corpus import corpus_prep

    out = corpus_prep(table(spark, sf_dir, "documents"))
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
    from .operators.sampling import stratified_sample

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
    from .operators.sampling import reservoir_per_group

    docs = table(spark, sf_dir, "documents")
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
    docs = table(spark, sf_dir, "documents")
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
    from .operators.intervals import concurrency_profile

    iv = table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").alias("s"),
        F.expr("o_orderdate + INTERVAL 30 DAYS").alias("e"),
    )
    return concurrency_profile(iv, "s", "e")


def _rendezvous_oracle_sql() -> str:
    from .operators.placement import rendezvous_shard_sql

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
    from .operators.placement import rendezvous_shard

    docs = table(spark, sf_dir, "documents")
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
    from .operators.cogroup import interp_join_cogrouped

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
    from .operators.skyline import skyline2d

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
    from .operators.graph import triangle_counts

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
    from .operators.stats import contingency_chi2

    docs = table(spark, sf_dir, "documents")
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
    from .operators.stats import kl_from_global

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
    from .operators.stats import auc_mann_whitney

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
    from .operators.stats import welch_one_vs_rest

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
    from .operators.stats import lag_autocorr

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
    from .operators.stats import mutual_info

    docs = table(spark, sf_dir, "documents")
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
    from .operators.stats import gini_by_rank

    docs = table(spark, sf_dir, "documents")
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
    from .operators.stats import cusum_max_excursion

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
    from .operators.itemsets import association_rules

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
    from .operators.stats import winsorize

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
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
    from .operators.stats import markov_transitions

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
    from .operators.quality import benford_audit

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
    from .operators.sketches import quantile_sketch

    docs = table(spark, sf_dir, "documents")
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
    from .operators.text import pmi_bigrams

    docs = table(spark, sf_dir, "documents")
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
    from .operators.graph import two_hop_counts

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
    from .operators.stats import target_encode_loo

    ev = events(spark, sf_dir).filter(F.col("value").isNotNull())
    out = target_encode_loo(ev, "event_type", "value", smoothing=20.0)
    return out.select(
        "event_id", "event_type", "value", r6p(F.col("te_loo")).alias("te_loo")
    )


@q(
    "q_hopping_counts",
    """
    WITH hops AS (
      SELECT unnest([
               (epoch_us(ts) // 300000000) * 300000000 - 300000000,
               (epoch_us(ts) // 300000000) * 300000000
             ]) AS win_start,
             event_type, value
      FROM events
    )
    SELECT win_start, event_type,
           count(*) AS n,
           floor(SUM(value) * 1000000.0 + 0.5) / 1000000.0 AS sum_value
    FROM hops WHERE win_start >= 0 GROUP BY 1, 2
    """,
)
def q_hopping_counts(spark, sf_dir):
    """Batch hopping-window aggregate: 10-minute windows sliding every
    5 minutes, so each event lands in exactly size/slide = 2 windows
    [s1−slide, s1] with s1 = (ts div slide)·slide. The window starts are
    computed with INTEGER µs arithmetic rather than ``F.window`` so
    boundaries are session-timezone-proof (a :30/:45-offset zone shifts
    F.window's epoch alignment on TIMESTAMP inputs) and engine-exact.
    Plan: 2-element explode → ONE partial-agg exchange — the batch twin
    of streaming/windowed.py's hopping counts."""
    ev = events(spark, sf_dir)
    slide = 300000000
    s1 = (F.col("ts_us") - (F.col("ts_us") % F.lit(slide))).cast("bigint")
    out = (
        ev.withColumn("win_start", F.explode(F.array(s1 - F.lit(slide), s1)))
        .filter(F.col("win_start") >= 0)
        .groupBy("win_start", "event_type")
        .agg(
            F.count("*").alias("n"),
            r6p(F.sum("value")).alias("sum_value"),
        )
    )
    return out


@q(
    "q_l_diversity",
    """
    WITH cells AS (SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2),
    per AS (
      SELECT lang, n,
             CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS class_size,
             COUNT(*) OVER (PARTITION BY lang) AS l_distinct,
             CAST(MAX(n) OVER (PARTITION BY lang) AS BIGINT) AS max_n
      FROM cells
    )
    SELECT lang, class_size, l_distinct,
           CAST(max_n AS DOUBLE) / CAST(class_size AS DOUBLE) AS majority_share,
           floor(SUM(-(CAST(n AS DOUBLE) / CAST(class_size AS DOUBLE))
                     * ln(CAST(n AS DOUBLE) / CAST(class_size AS DOUBLE)))
                 * 1000000.0 + 0.5) / 1000000.0 AS sens_entropy
    FROM per GROUP BY lang, class_size, l_distinct, max_n
    """,
)
def q_l_diversity(spark, sf_dir):
    """l-diversity audit of source (the sensitive attribute) within each
    language class (operators/privacy.py::l_diversity_audit) — a
    k-anonymous class still leaks if everyone in it shares the sensitive
    value. Reports class size, distinct-sensitive count (the l),
    majority share, and sensitive-mix entropy. One (QI × sensitive)
    cell aggregate; margins are windows over that cell table."""
    from .operators.privacy import l_diversity_audit

    docs = table(spark, sf_dir, "documents")
    out = l_diversity_audit(docs, ["lang"], "source")
    return out.select(
        "lang",
        "class_size",
        "l_distinct",
        "majority_share",
        r6p(F.col("sens_entropy")).alias("sens_entropy"),
    )


@q(
    "q_dp_counts",
    """
    WITH counts AS (SELECT event_type, count(*) AS true_n FROM events GROUP BY 1),
    nz AS (
      SELECT event_type, true_n,
             (CAST(('0x' || substr(md5('dp' || chr(31) || event_type), 1, 12))
                   AS BIGINT) + 0.5) / 281474976710656.0 - 0.5 AS u
      FROM counts
    )
    SELECT event_type, true_n,
           floor(greatest(
                   CAST(true_n AS DOUBLE)
                   + sign(u) * (-ln(1.0 - 2.0 * abs(u)) / 1.0),
                   0.0) * 1000000.0 + 0.5) / 1000000.0 AS noisy_n
    FROM nz
    """,
)
def q_dp_counts(spark, sf_dir):
    """Laplace-mechanism noisy per-group counts (ε=1, sensitivity 1)
    with DETERMINISTIC salted-hash noise
    (operators/privacy.py::dp_noisy_counts) — the inverse-CDF transform
    −(1/ε)·sgn(u)·ln(1−2|u|) on a md5-derived uniform. Deterministic
    noise is exactly oracle-checkable and is the right property for
    TESTING the release plumbing; production swaps in a secure RNG (the
    docstring spells out that replayable noise is NOT a DP guarantee)."""
    from .operators.privacy import dp_noisy_counts

    ev = events(spark, sf_dir)
    out = dp_noisy_counts(ev, ["event_type"], epsilon=1.0, salt="dp")
    return out.select(
        "event_type", "true_n", r6p(F.col("noisy_n")).alias("noisy_n")
    )


@q(
    "txt_readability",
    f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len({_TOK_SQL}) AS DOUBLE) AS words,
             greatest(1.0, CAST(len(regexp_extract_all(text, '[.!?]+'))
                             AS DOUBLE)) AS sentences,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                  AS DOUBLE) AS syllables
      FROM documents
    )
    SELECT doc_id,
           CAST(words AS BIGINT) AS n_words,
           CAST(sentences AS BIGINT) AS n_sentences,
           CAST(syllables AS BIGINT) AS n_syllables,
           floor((206.835 - 1.015 * (words / sentences)
                  - 84.6 * (syllables / greatest(words, 1.0)))
                 * 1000000.0 + 0.5) / 1000000.0 AS flesch
    FROM t
    """,
)
def txt_readability(spark, sf_dir):
    """Flesch reading-ease per document
    (operators/text.py::readability_features) — the cheap quality signal
    corpus filters threshold on. Words/sentence-runs/vowel-group
    syllables are pure codegen regex counts (identical classes in Java
    regex and RE2); the formula is replayed verbatim in the oracle."""
    from .operators.text import readability_features

    docs = table(spark, sf_dir, "documents")
    out = readability_features(docs)
    return out.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        r6p(F.col("flesch")).alias("flesch"),
    )


@q(
    "ann_isotropy_probe",
    """
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    p AS (
      SELECT s.stride, a.emb AS va, b.emb AS vb
      FROM (VALUES (1), (7), (31)) s(stride)
      JOIN v a ON TRUE
      JOIN v b ON b.vec_id = a.vec_id + s.stride
    ),
    c AS (
      SELECT stride,
             round(list_dot_product(va, vb)
                   / (sqrt(list_dot_product(va, va))
                      * sqrt(list_dot_product(vb, vb))), 6) AS cos
      FROM p
    )
    SELECT stride, count(*) AS n_pairs,
           floor(AVG(cos) * 1000000.0 + 0.5) / 1000000.0 AS mean_cos,
           MIN(cos) AS min_cos, MAX(cos) AS max_cos
    FROM c GROUP BY stride
    """,
)
def ann_isotropy_probe(spark, sf_dir):
    """Embedding-space isotropy probe
    (operators/similarity.py::isotropy_probe): mean/extreme cosine over
    deterministic id-stride pairs (strides 1, 7, 31) — collapsed
    (anisotropic) embedding spaces show large positive mean cosine, a
    known failure mode of contrastive encoders. Each stride is ONE
    equi-join (linear volume, no crossJoin, no RNG) — the O(N) health
    check run before any ANN index build."""
    from .operators.similarity import isotropy_probe

    e = table(spark, sf_dir, "embeddings")
    out = isotropy_probe(e, strides=(1, 7, 31))
    return out.select(
        "stride",
        "n_pairs",
        r6p(F.col("mean_cos")).alias("mean_cos"),
        "min_cos",
        "max_cos",
    )


@q(
    "mm_wav_features",
    """
    SELECT doc_id AS media_id,
           44 + strlen(text) AS n_bytes,
           8000 + (doc_id % 8) * 1000 AS sample_rate,
           1 + doc_id % 2 AS channels,
           CAST(16 AS BIGINT) AS bits,
           strlen(text) // (2 * (1 + doc_id % 2)) AS n_frames,
           (strlen(text) // (2 * (1 + doc_id % 2))) * 1000
             // (8000 + (doc_id % 8) * 1000) AS duration_ms
    FROM documents
    """,
)
def mm_wav_features(spark, sf_dir):
    """Audio-metadata extraction over REAL RIFF/WAVE containers
    (operators/multimodal.py::parse_wav_header via mapInPandas): the
    adapter wraps text bytes in a spec-valid PCM WAV whose fmt fields
    derive deterministically from doc_id, so the genuinely-parsed
    sample_rate/channels/bits/frames/duration are oracle-checkable
    arithmetic. Sample DECODE stays gated on absent codec libs — this is
    the real metadata layer, the audio twin of the PNG header parse."""
    from .operators.multimodal import documents_as_audio, extract_audio_features

    media = documents_as_audio(table(spark, sf_dir, "documents"))
    return extract_audio_features(media)


def _lpa_oracle_sql(n_iter: int = 3) -> str:
    """DuckDB replay of operators/graph.py::label_propagation — the same
    deterministic synchronous rounds unrolled as CTEs (mode of neighbor
    labels, ties to the smallest label via row_number)."""
    its = [
        "it0 AS (SELECT DISTINCT u AS node, u AS label FROM adj)",
    ]
    for k in range(1, n_iter + 1):
        its.append(
            f"""it{k} AS (
      SELECT u AS node, label FROM (
        SELECT a.u, l.label, count(*) AS cnt,
               row_number() OVER (PARTITION BY a.u
                                  ORDER BY count(*) DESC, l.label ASC) AS rn
        FROM adj a JOIN it{k - 1} l ON l.node = a.v
        GROUP BY a.u, l.label
      ) WHERE rn = 1
    )"""
        )
    return (
        """
    WITH und AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    adj AS (SELECT u, v FROM und UNION SELECT v, u FROM und),
    """
        + ",\n    ".join(its)
        + f"\n    SELECT node, label FROM it{n_iter}"
    )


@q("q_label_propagation", _lpa_oracle_sql(3))
def q_label_propagation(spark, sf_dir):
    """Deterministic synchronous label propagation (3 rounds) on the
    part co-purchase graph (operators/graph.py::label_propagation) —
    community detection with mode-of-neighbors updates, ties to the
    smallest label (the reproducible LPA variant; async+random LPA can't
    be oracle-checked). Per round: one |edges| join + one (node, label)
    aggregate + one argmax — linear in edges; the oracle unrolls the
    identical rounds in SQL."""
    from .operators.graph import label_propagation

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pairs = (
        li.alias("x")
        .join(li.alias("y"), "l_orderkey")
        .filter(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b"))
    )
    return label_propagation(pairs, n_iter=3)


def _hilbert_oracle_sql(bits: int = 8) -> str:
    from .operators.hilbert import hilbert_oracle_ctes
    from .operators.zorder import quantize_sql

    qp = quantize_sql(
        "l_partkey",
        "(SELECT min(l_partkey) FROM lineitem)",
        "(SELECT max(l_partkey) FROM lineitem)",
        bits,
    )
    qs = quantize_sql(
        "l_suppkey",
        "(SELECT min(l_suppkey) FROM lineitem)",
        "(SELECT max(l_suppkey) FROM lineitem)",
        bits,
    )
    base = (
        f"SELECT {qp} AS hx, {qs} AS hy, CAST(0 AS BIGINT) AS hd, "
        "l_partkey, l_suppkey FROM lineitem"
    )
    ctes = hilbert_oracle_ctes(base, bits, keep_cols="l_partkey, l_suppkey")
    return f"""
    WITH {ctes}
    SELECT hd >> {2 * bits - 4} AS bucket, count(*) AS n,
           min(l_partkey) AS p_min, max(l_partkey) AS p_max,
           min(l_suppkey) AS s_min, max(l_suppkey) AS s_max
    FROM l0 GROUP BY 1
    """


@q("q_hilbert_layout", _hilbert_oracle_sql(8))
def q_hilbert_layout(spark, sf_dir):
    """Hilbert-curve clustering layout audit
    (operators/hilbert.py::with_hilbert_key) — the locality-superior
    alternative to Z-order: consecutive keys are spatially ADJACENT
    (unit-step property, pinned in tests), so equal key ranges cut
    tighter per-file bounding boxes than Morton's seamy ranges (measured
    119 vs 196 mean box area on unaligned buckets). Same audit shape as
    q_zorder_layout: quantize (l_partkey, l_suppkey) to 8 bits, staged
    per-level reflection/swap chain (CollapseProject keeps it linear),
    bucket by the top 4 key bits, report per-bucket extents. Integer-
    exact; the oracle replays the identical chain as per-level CTEs."""
    from .operators.hilbert import with_hilbert_key
    from .operators.zorder import quantize

    bits = 8
    li = table(spark, sf_dir, "lineitem")
    lo_hi = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).collect()[0]
    plo, phi, slo, shi = (int(v) for v in lo_hi)
    staged = li.select(
        "l_partkey",
        "l_suppkey",
        quantize("l_partkey", plo, phi, bits).alias("qx"),
        quantize("l_suppkey", slo, shi, bits).alias("qy"),
    )
    keyed = with_hilbert_key(staged, "qx", "qy", bits=bits)
    return (
        keyed.select(
            "l_partkey",
            "l_suppkey",
            F.shiftright(F.col("hkey"), 2 * bits - 4).alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("l_partkey").alias("p_min"),
            F.max("l_partkey").alias("p_max"),
            F.min("l_suppkey").alias("s_min"),
            F.max("l_suppkey").alias("s_max"),
        )
    )


@q(
    "q_embedding_dq",
    """
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    f AS (
      SELECT vec_id, len(e) AS dim,
             len(list_filter(e, x -> isnan(x))) AS n_nan,
             sqrt(list_dot_product(
               list_filter(e, x -> NOT isnan(x)),
               list_filter(e, x -> NOT isnan(x)))) AS nrm
      FROM v
    )
    SELECT count(*) AS n_vecs,
           CAST(coalesce(sum(CASE WHEN dim <> 64 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_wrong_dim,
           CAST(coalesce(sum(CASE WHEN n_nan > 0 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_with_nan,
           CAST(coalesce(sum(CASE WHEN nrm = 0.0 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_zero_norm,
           round(avg(nrm), 6) AS avg_norm
    FROM f
    """,
)
def q_embedding_dq(spark, sf_dir):
    """Embedding-health gate (the q_dq_checks pattern on the vector
    column): wrong-dimension, NaN-component, and zero-norm counts plus
    the mean L2 norm, in ONE map-side-combined aggregate over row-local
    array expressions — the pre-index sanity pass an ANN/semantic-dedup
    pipeline runs before building anything on the vectors. NaNs are
    excluded from the norm (isnan filter) so one bad component flags the
    row without poisoning the corpus-level mean."""
    e = table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("e")
    )
    clean = F.filter(F.col("e"), lambda x: ~F.isnan(x))
    nrm = F.sqrt(
        F.aggregate(clean, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    # null-guard every per-row stat: non-ANSI Spark evaluates size(NULL)
    # to -1 (which would count a NULL vector as wrong-dim) while the
    # oracle's len(NULL) is NULL — wrap in when(isNotNull) so a NULL
    # embedding row contributes to n_vecs only, in both engines and in
    # both ANSI modes
    has = F.col("e").isNotNull()
    f = e.select(
        F.when(has, F.size("e")).alias("dim"),
        F.when(
            has, F.size(F.filter(F.col("e"), lambda x: F.isnan(x)))
        ).alias("n_nan"),
        F.when(has, nrm).alias("nrm"),
    )
    return f.agg(
        F.count("*").alias("n_vecs"),
        F.coalesce(F.sum(F.when(F.col("dim") != 64, 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias("n_wrong_dim"),
        F.coalesce(F.sum(F.when(F.col("n_nan") > 0, 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias("n_with_nan"),
        F.coalesce(F.sum(F.when(F.col("nrm") == 0.0, 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias("n_zero_norm"),
        r6(F.avg("nrm")).alias("avg_norm"),
    )


@q(
    "q_join_size_estimate",
    """
    WITH a AS (SELECT user_id AS k, count(*) AS na FROM events GROUP BY 1),
    b AS (SELECT o_custkey AS k, count(*) AS nb FROM orders GROUP BY 1),
    j AS (SELECT a.k, na * nb AS prod FROM a JOIN b USING (k))
    SELECT count(*) AS n_matching_keys,
           CAST(coalesce(sum(prod), 0) AS BIGINT) AS est_rows,
           CAST(coalesce(max(prod), 0) AS BIGINT) AS max_key_product
    FROM j
    """,
)
def q_join_size_estimate(spark, sf_dir):
    """Planner-style join-size estimation WITHOUT running the join: the
    exact output cardinality of events ⋈ orders on (user_id = o_custkey)
    is Σ_k count_a(k)·count_b(k) over matching keys, computed from the
    two per-key COUNT tables — two map-side-combined aggregates plus a
    join bounded by |distinct keys|, never the fact-×-fact shuffle the
    estimate is ABOUT. max_key_product is the skew statistic the same
    planner uses to pick salting/AQE-skew handling: the single hottest
    key's contribution to the join output."""
    ev = events(spark, sf_dir)
    orders = table(spark, sf_dir, "orders")
    a = ev.groupBy(F.col("user_id").alias("k")).agg(F.count("*").alias("na"))
    b = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count("*").alias("nb")
    )
    j = a.join(b, "k").select((F.col("na") * F.col("nb")).alias("prod"))
    return j.agg(
        F.count("*").alias("n_matching_keys"),
        F.coalesce(F.sum("prod"), F.lit(0)).cast("bigint").alias("est_rows"),
        F.coalesce(F.max("prod"), F.lit(0)).cast("bigint").alias("max_key_product"),
    )


@q(
    "q_snapshot_diff",
    """
    WITH v1 AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderdate < TIMESTAMP '1996-01-01'
    ),
    v2 AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 97 = 0 THEN 'X' ELSE o_orderstatus END
               AS o_orderstatus,
             o_totalprice
      FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
    )
    SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
           CASE WHEN v1.o_orderkey IS NULL THEN 'added'
                WHEN v2.o_orderkey IS NULL THEN 'removed'
                WHEN v1.o_orderstatus <> v2.o_orderstatus
                     OR v1.o_totalprice <> v2.o_totalprice THEN 'changed'
                ELSE 'unchanged' END AS change,
           v1.o_orderstatus AS status_before,
           v2.o_orderstatus AS status_after
    FROM v1 FULL OUTER JOIN v2 USING (o_orderkey)
    WHERE v1.o_orderkey IS NULL OR v2.o_orderkey IS NULL
       OR v1.o_orderstatus <> v2.o_orderstatus
       OR v1.o_totalprice <> v2.o_totalprice
    """,
)
def q_snapshot_diff(spark, sf_dir):
    """Snapshot diff between two table versions (the data-engineering
    audit behind every backfill sign-off): full-outer join on the key,
    classify added / removed / changed (value comparison), emit only the
    delta. Versions are simulated as date-cutoff views with a
    deterministic mutation (status flip on orderkey % 97). One co-keyed
    shuffle join; at scale both sides bucket/sort by the key so the join
    is exchange-free on read."""
    orders = table(spark, sf_dir, "orders")
    v1 = orders.filter(F.col("o_orderdate") < "1996-01-01").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("s1"),
        F.col("o_totalprice").alias("p1"),
    )
    v2 = orders.filter(F.col("o_orderdate") < "1997-01-01").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 97 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("s2"),
        F.col("o_totalprice").alias("p2"),
    )
    j = v1.join(v2, "o_orderkey", "full_outer")
    change = (
        F.when(F.col("s1").isNull(), F.lit("added"))
        .when(F.col("s2").isNull(), F.lit("removed"))
        .when(
            (F.col("s1") != F.col("s2")) | (F.col("p1") != F.col("p2")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change") != "unchanged")
        .select(
            "o_orderkey",
            "change",
            F.col("s1").alias("status_before"),
            F.col("s2").alias("status_after"),
        )
    )


@q(
    "q_column_corr",
    """
    WITH s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             SUM(l_quantity) AS sq, SUM(l_quantity * l_quantity) AS sqq,
             SUM(l_extendedprice) AS se,
             SUM(l_extendedprice * l_extendedprice) AS see,
             SUM(l_discount) AS sd, SUM(l_discount * l_discount) AS sdd,
             SUM(l_quantity * l_extendedprice) AS sqe,
             SUM(l_quantity * l_discount) AS sqd,
             SUM(l_extendedprice * l_discount) AS sed
      FROM lineitem
    )
    SELECT pair, floor(num / sqrt(vx * vy) * 1000000.0 + 0.5) / 1000000.0 AS corr
    FROM (
      SELECT 'quantity~extendedprice' AS pair,
             n * sqe - sq * se AS num,
             n * sqq - sq * sq AS vx, n * see - se * se AS vy FROM s
      UNION ALL
      SELECT 'quantity~discount', n * sqd - sq * sd,
             n * sqq - sq * sq, n * sdd - sd * sd FROM s
      UNION ALL
      SELECT 'extendedprice~discount', n * sed - se * sd,
             n * see - se * se, n * sdd - sd * sd FROM s
    )
    """,
)
def q_column_corr(spark, sf_dir):
    """Pairwise Pearson correlation of three lineitem measures in ONE
    scan — the correlated-columns statistic a cost-based optimizer (and
    any feature-selection pass) needs. All 10 sufficient sums come from
    a single map-side-combined aggregate; each pair's r is closed-form
    arithmetic on that 1-row table (no per-pair rescan, no corr() UDAF
    whose internal update order differs across engines)."""
    li = table(spark, sf_dir, "lineitem")
    q, e, d = F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount")
    s = li.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(q).alias("sq"), F.sum(q * q).alias("sqq"),
        F.sum(e).alias("se"), F.sum(e * e).alias("see"),
        F.sum(d).alias("sd"), F.sum(d * d).alias("sdd"),
        F.sum(q * e).alias("sqe"), F.sum(q * d).alias("sqd"),
        F.sum(e * d).alias("sed"),
    )

    def pair(name, num, vx, vy):
        return s.select(
            F.lit(name).alias("pair"),
            r6p((num) / F.sqrt((vx) * (vy))).alias("corr"),
        )

    n = F.col("n")
    out = pair(
        "quantity~extendedprice",
        n * F.col("sqe") - F.col("sq") * F.col("se"),
        n * F.col("sqq") - F.col("sq") * F.col("sq"),
        n * F.col("see") - F.col("se") * F.col("se"),
    ).unionByName(
        pair(
            "quantity~discount",
            n * F.col("sqd") - F.col("sq") * F.col("sd"),
            n * F.col("sqq") - F.col("sq") * F.col("sq"),
            n * F.col("sdd") - F.col("sd") * F.col("sd"),
        )
    ).unionByName(
        pair(
            "extendedprice~discount",
            n * F.col("sed") - F.col("se") * F.col("sd"),
            n * F.col("see") - F.col("se") * F.col("se"),
            n * F.col("sdd") - F.col("sd") * F.col("sd"),
        )
    )
    return out


@q(
    "q_table_checksum",
    """
    SELECT count(*) AS n_rows,
           CAST(SUM(CAST(('0x' || substr(md5(
                     CAST(o_orderkey AS VARCHAR) || chr(31)
                     || o_orderstatus || chr(31)
                     || CAST(o_totalprice AS VARCHAR)), 1, 12)) AS BIGINT))
                AS DECIMAL(38, 0)) AS checksum
    FROM orders
    """,
)
def q_table_checksum(spark, sf_dir):
    """Order-insensitive table checksum — the anti-entropy primitive for
    comparing replicas/backfills without sorting or moving the data: sum
    of per-row 48-bit content hashes, accumulated in DECIMAL(38,0) so the
    sum is EXACT under any partitioning/association (a BIGINT sum could
    wrap engine-dependently; decimal can't). One map-side-combined
    aggregate; equal checksums + equal counts ⇒ replicas agree with
    2^-48-scale collision odds per differing row. Float columns are
    stringified through CAST — both engines print shortest-roundtrip
    doubles, verified by the hash match itself."""
    o = table(spark, sf_dir, "orders")
    row_str = F.concat_ws(
        "\x1f",
        F.col("o_orderkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_totalprice").cast("string"),
    )
    h = F.conv(F.substring(F.md5(row_str), 1, 12), 16, 10).cast("bigint")
    return o.agg(
        F.count("*").alias("n_rows"),
        F.sum(h.cast("decimal(38,0)")).alias("checksum"),
    )


@q(
    "q_dataset_split",
    """
    WITH h AS (
      SELECT lang,
             CAST(('0x' || substr(md5('split' || chr(31)
                                      || CAST(doc_id AS VARCHAR)), 1, 12))
                  AS BIGINT) AS hv
      FROM documents
    )
    SELECT lang,
           CASE WHEN hv % 10 < 8 THEN 'train'
                WHEN hv % 10 = 8 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n
    FROM h GROUP BY 1, 2
    """,
)
def q_dataset_split(spark, sf_dir):
    """Deterministic train/val/test split (80/10/10 by salted doc-id
    hash) with the per-language composition report — the
    reproducible-split primitive every training pipeline needs (hash
    split ⇒ membership is stable under re-runs, insertions never move an
    existing doc between splits). Pure map-side expressions + one
    aggregate; the oracle replays the identical hash arithmetic."""
    from .operators.sketches import uniform_hash48

    docs = table(spark, sf_dir, "documents")
    hv = uniform_hash48(
        F.concat_ws("\x1f", F.lit("split"), F.col("doc_id").cast("string"))
    )
    split = (
        F.when(hv % 10 < 8, F.lit("train"))
        .when(hv % 10 == 8, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n"))
    )


@q(
    "q_rfm_segments",
    """
    WITH m AS (
      SELECT user_id,
             max(epoch_us(ts)) AS last_us,
             count(*) AS frequency,
             floor(COALESCE(SUM(value), 0.0) * 1000000.0 + 0.5) / 1000000.0
               AS monetary
      FROM events GROUP BY 1
    ),
    g AS (SELECT max(last_us) AS now_us FROM m)
    SELECT user_id,
           (g.now_us - last_us) // 86400000000 AS recency_days,
           frequency, monetary,
           ntile(4) OVER (ORDER BY last_us DESC, user_id) AS r_quartile,
           ntile(4) OVER (ORDER BY frequency DESC, user_id) AS f_quartile,
           ntile(4) OVER (ORDER BY monetary DESC, user_id) AS m_quartile
    FROM m CROSS JOIN g
    """,
)
def q_rfm_segments(spark, sf_dir):
    """RFM (recency / frequency / monetary) segmentation — the classic
    behavioral-cohort readout: per user, days since last event, event
    count, value sum, and the 1-4 quartile along each axis (deterministic
    ntile semantics with user_id tiebreak; quartile 1 = best). One
    aggregate to the |users|-row table; the reference "now" and the user
    count ride a 1-row equi-join on a literal key (BroadcastHashJoin, not
    a nested loop), so results are reproducible, not wall-clock-dependent.
    The quartiles are NOT window ntiles: each axis gets an exact global
    row_number from rank.global_rank (range-partitioned, windowless) and
    the 1-4 bucket is recovered arithmetically — the first n%4 buckets
    take ceil(n/4) rows, the rest floor(n/4), which is ntile(4)'s exact
    contract — so the |users| row volume never crosses a single
    partition at any scale. The bucket arithmetic is the shared
    rank.ntile_from_rank formula (same code path global_ntile uses);
    the three ranks reuse ONE (now, count) broadcast rather than three
    global_ntile calls, whose per-call count re-derivation compounds the
    physical plan across the chained calls (measured: 198 Exchange nodes
    vs 15 here)."""
    from .operators.rank import global_rank, ntile_from_rank

    ev = events(spark, sf_dir)
    m = ev.groupBy("user_id").agg(
        F.max("ts_us").alias("last_us"),
        F.count("*").alias("frequency"),
        r6p(F.coalesce(F.sum("value"), F.lit(0.0))).alias("monetary"),
    )
    g = (
        m.agg(F.max("last_us").alias("now_us"), F.count("*").alias("n_users"))
        .withColumn("__k", F.lit(1))
    )
    out = m.withColumn("__k", F.lit(1)).join(F.broadcast(g), "__k").drop("__k")
    out = global_rank(out, [F.col("last_us").desc(), F.col("user_id")], "__rr")
    out = global_rank(out, [F.col("frequency").desc(), F.col("user_id")], "__fr")
    out = global_rank(out, [F.col("monetary").desc(), F.col("user_id")], "__mr")
    return out.select(
        "user_id",
        F.expr("(now_us - last_us) div 86400000000").alias("recency_days"),
        "frequency",
        "monetary",
        ntile_from_rank("__rr", "n_users", 4).alias("r_quartile"),
        ntile_from_rank("__fr", "n_users", 4).alias("f_quartile"),
        ntile_from_rank("__mr", "n_users", 4).alias("m_quartile"),
    )


@q(
    "q_unpivot_melt",
    """
    SELECT l_orderkey, l_linenumber, measure, round(val, 6) AS val
    FROM (
      SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
             CAST(l_quantity AS DOUBLE) AS val FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'extendedprice',
             CAST(l_extendedprice AS DOUBLE) FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount',
             CAST(l_discount AS DOUBLE) FROM lineitem
    )
    WHERE l_orderkey % 50 = 0
    """,
)
def q_unpivot_melt(spark, sf_dir):
    """Wide→long reshaping via Spark's native ``unpivot`` (melt) — the R2
    pivot's inverse, needed to feed per-measure operators (histograms,
    drift audits) from wide fact tables. Catalyst expands it with a
    single Expand node — one scan, no join, 3× rows out; the oracle is
    the equivalent UNION ALL. Filter kept pushed BELOW the expand (plan
    prunes before multiplying)."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    wide = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("quantity"),
        F.col("l_extendedprice").cast("double").alias("extendedprice"),
        F.col("l_discount").cast("double").alias("discount"),
    )
    long = wide.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["quantity", "extendedprice", "discount"],
        "measure",
        "val",
    )
    return long.select(
        "l_orderkey", "l_linenumber", "measure", r6(F.col("val")).alias("val")
    )


@q(
    "q_lttb_downsample",
    """
    WITH pts AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(ts) % 3600000000 AS bucket,
             epoch_us(ts) AS t,
             CAST(epoch_us(ts) AS DOUBLE) / 3600000000.0 AS xn,
             value AS val, event_id AS pid
      FROM events WHERE value IS NOT NULL
    ),
    means AS (
      SELECT event_type, bucket, AVG(xn) AS mx, AVG(val) AS my
      FROM pts GROUP BY 1, 2
    ),
    anch AS (
      SELECT event_type, bucket,
             COALESCE(lag(mx) OVER w, mx) AS px,
             COALESCE(lag(my) OVER w, my) AS py,
             COALESCE(lead(mx) OVER w, mx) AS nx,
             COALESCE(lead(my) OVER w, my) AS ny
      FROM means WINDOW w AS (PARTITION BY event_type ORDER BY bucket)
    ),
    scored AS (
      SELECT p.event_type, p.bucket, p.t, p.val, p.pid,
             CAST(floor(abs((a.px - a.nx) * (p.val - a.py)
                            - (a.px - p.xn) * (a.ny - a.py))
                        * 1000000.0 + 0.5) AS BIGINT) AS area_u
      FROM pts p JOIN anch a USING (event_type, bucket)
    )
    SELECT event_type, bucket, t AS ts, val
    FROM (
      SELECT *, row_number() OVER (PARTITION BY event_type, bucket
                                   ORDER BY area_u DESC, t, pid) AS rn
      FROM scored
    ) WHERE rn = 1
    """,
)
def q_lttb_downsample(spark, sf_dir):
    """Distributed LTTB-style plot downsampling
    (operators/downsample.py::lttb_mean): per (event_type, hour bucket),
    keep the point whose triangle against the neighboring buckets' means
    is largest — the shape-preserving reduction that makes plotting a
    100M-point series feasible (the engine-side answer to the
    reference's scoped-out matplotlib surface,
    /root/reference/seaexplorertools/process_adcp.py's plot_* functions).
    Area quantized to BIGINT µ-units before the argmax so the selection
    is engine-exact; one bucket aggregate + tiny anchor windows +
    broadcast back — data rows shuffle once."""
    from .operators.downsample import lttb_mean

    ev = events(spark, sf_dir).filter(F.col("value").isNotNull())
    return lttb_mean(
        ev, "ts_us", "value", bucket_us=3600000000, id_col="event_id",
        group_cols=["event_type"],
    )


@q(
    "q_session_paths",
    """
    WITH s AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS t,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS boundary
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    sess AS (
      SELECT user_id, event_id, event_type, t,
             SUM(boundary) OVER (PARTITION BY user_id
                                 ORDER BY t, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM s
    ),
    paths AS (
      SELECT user_id, session_id,
             array_to_string(
               list_slice(list(event_type ORDER BY t, event_id), 1, 5),
               '>') AS path
      FROM sess GROUP BY 1, 2
    )
    SELECT path, count(*) AS n_sessions
    FROM paths GROUP BY 1 HAVING count(*) >= 5
    """,
)
def q_session_paths(spark, sf_dir):
    """Top session paths (sequence mining): sessionize on a 30-min gap,
    reduce each session to its first-5-event type sequence, count path
    frequencies above min support — the what-do-journeys-look-like
    readout behind funnel design. The per-session sequence is built with
    sort_array(collect_list(struct)) so ordering is deterministic inside
    the aggregate (no ordered-window re-shuffle); everything else is two
    map-side-combinable aggregates."""
    ev = events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(*EV_ORDER)
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    boundary = F.when(gap.isNull() | (gap > 1800000000), 1).otherwise(0)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts_us",
        F.sum(boundary).over(wc).cast("long").alias("session_id"),
    )
    seq = F.transform(
        F.slice(
            F.sort_array(
                F.collect_list(F.struct("ts_us", "event_id", "event_type"))
            ),
            1,
            5,
        ),
        lambda st: st["event_type"],
    )
    paths = sess.groupBy("user_id", "session_id").agg(
        F.array_join(seq, ">").alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .filter(F.col("n_sessions") >= 5)
    )


@q(
    "q_weighted_quantiles",
    """
    WITH s AS (
      SELECT l_returnflag AS grp, l_extendedprice AS x,
             SUM(CAST(l_quantity AS BIGINT))
               OVER (PARTITION BY l_returnflag
                     ORDER BY l_extendedprice, l_orderkey, l_linenumber
                     ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(CAST(l_quantity AS BIGINT))
               OVER (PARTITION BY l_returnflag) AS wtot
      FROM lineitem
    )
    SELECT grp, CAST(MAX(wtot) AS BIGINT) AS w_total,
           MIN(CASE WHEN 4 * cum >= wtot THEN x END) AS p25,
           MIN(CASE WHEN 2 * cum >= wtot THEN x END) AS p50,
           MIN(CASE WHEN 10 * cum >= 9 * wtot THEN x END) AS p90
    FROM s GROUP BY grp
    """,
)
def q_weighted_quantiles(spark, sf_dir):
    """Per-returnflag QUANTITY-weighted price quantiles
    (operators/stats.py::weighted_quantiles): the smallest price whose
    cumulative quantity reaches q·W — "the median unit ships at what
    price", each row counted by its weight. Thresholds are
    cross-multiplied INTEGER comparisons (4·cum ≥ W …) over a BIGINT
    cumsum — bit-identical cross-engine, zero rounding. One ordered
    window + one aggregate."""
    from .operators.stats import weighted_quantiles

    li = table(spark, sf_dir, "lineitem").withColumn(
        "__tb", F.col("l_orderkey") * 10 + F.col("l_linenumber")
    )
    out = weighted_quantiles(
        li, "l_returnflag", "l_extendedprice", F.col("l_quantity"), "__tb"
    )
    return out.select(
        F.col("l_returnflag").alias("grp"), "w_total", "p25", "p50", "p90"
    )


@q(
    "q_best_split",
    """
    WITH cells AS (
      SELECT n_chars AS t, count(*) AS n,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos
      FROM documents GROUP BY 1
    ),
    s AS (
      SELECT t,
             CAST(SUM(n) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT) AS nl,
             CAST(SUM(pos) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pl,
             CAST(SUM(n) OVER () AS BIGINT) AS nn,
             CAST(SUM(pos) OVER () AS BIGINT) AS pp
      FROM cells
    ),
    g AS (
      SELECT t, nl,
             (CASE WHEN pp > 0 AND pp < nn
                   THEN -(CAST(pp AS DOUBLE) / nn) * ln(CAST(pp AS DOUBLE) / nn)
                   ELSE 0.0 END
              + CASE WHEN pp > 0 AND pp < nn
                     THEN -(1.0 - CAST(pp AS DOUBLE) / nn)
                          * ln(1.0 - CAST(pp AS DOUBLE) / nn)
                     ELSE 0.0 END) AS hp,
             (CASE WHEN pl > 0 AND pl < nl
                   THEN -(CAST(pl AS DOUBLE) / nl) * ln(CAST(pl AS DOUBLE) / nl)
                   ELSE 0.0 END
              + CASE WHEN pl > 0 AND pl < nl
                     THEN -(1.0 - CAST(pl AS DOUBLE) / nl)
                          * ln(1.0 - CAST(pl AS DOUBLE) / nl)
                     ELSE 0.0 END) AS hl,
             (CASE WHEN pp - pl > 0 AND pp - pl < nn - nl
                   THEN -(CAST(pp - pl AS DOUBLE) / (nn - nl))
                        * ln(CAST(pp - pl AS DOUBLE) / (nn - nl))
                   ELSE 0.0 END
              + CASE WHEN pp - pl > 0 AND pp - pl < nn - nl
                     THEN -(1.0 - CAST(pp - pl AS DOUBLE) / (nn - nl))
                          * ln(1.0 - CAST(pp - pl AS DOUBLE) / (nn - nl))
                     ELSE 0.0 END) AS hr,
             nn
      FROM s WHERE nl < nn
    ),
    scored AS (
      SELECT t, nl,
             floor((hp - (CAST(nl AS DOUBLE) / nn * hl
                          + CAST(nn - nl AS DOUBLE) / nn * hr))
                   * 1000000.0 + 0.5) / 1000000.0 AS ig,
             floor(hp * 1000000.0 + 0.5) / 1000000.0 AS parent_entropy
      FROM g
    )
    SELECT t AS split_at, ig, parent_entropy, nl AS n_left
    FROM (SELECT *, row_number() OVER (ORDER BY ig DESC, t ASC) AS rn FROM scored)
    WHERE rn = 1
    """,
)
def q_best_split(spark, sf_dir):
    """Distributed decision-tree split finding: the n_chars threshold
    that best separates lang='en' by information gain
    (operators/stats.py::best_split). ONE aggregate to the
    |distinct values| table, cumulative class counts over it, closed-form
    entropies from exact BIGINT counts, 6-dp-rounded-gain argmax with
    smallest-threshold tiebreak. The shuffle is |distinct values| — a
    tree trainer fans this out per (feature, node), never per row."""
    from .operators.stats import best_split

    docs = table(spark, sf_dir, "documents")
    return best_split(docs, "n_chars", F.col("lang") == "en")


def _pca_gram_oracle_sql(dim: int = 64, n_iter: int = 6) -> str:
    """DuckDB replay of operators/pca.py::top_component_gram — covariance
    cells in SQL, then the SAME driver-side iteration unrolled as CTEs
    (matrix-vector product per round, normalize, sign-canonicalize)."""
    its = []
    prev = "v0"
    for k in range(1, n_iter + 1):
        its.append(
            f"""y{k} AS (
      SELECT cov.i AS i, SUM(cov.c * {prev}.v) AS y
      FROM cov JOIN {prev} ON {prev}.i = cov.j GROUP BY 1
    ),
    v{k} AS (SELECT i, y / (SELECT sqrt(SUM(y * y)) FROM y{k}) AS v FROM y{k})"""
        )
        prev = f"v{k}"
    its_sql = ",\n    ".join(its)
    return f"""
    WITH x AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    idx AS (SELECT unnest(generate_series(1, {dim})) AS i),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM x),
    flat AS (SELECT vec_id, i, emb[i] AS xi FROM x CROSS JOIN idx),
    sums AS (SELECT i, SUM(xi) AS si FROM flat GROUP BY i),
    cells AS (
      SELECT a.i AS i, b.i AS j, SUM(a.xi * b.xi) AS sxx
      FROM flat a JOIN flat b USING (vec_id) GROUP BY 1, 2
    ),
    cov AS (
      SELECT cells.i, cells.j, sxx - sa.si * sb.si / n.n AS c
      FROM cells JOIN sums sa ON sa.i = cells.i
                 JOIN sums sb ON sb.i = cells.j
                 CROSS JOIN n
    ),
    v0 AS (SELECT i, 1.0 / sqrt({dim}.0) AS v FROM idx),
    {its_sql},
    sgn AS (SELECT CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS s
            FROM {prev} ORDER BY abs(v) DESC, i ASC LIMIT 1)
    SELECT CAST(i - 1 AS INTEGER) AS dim,
           floor(v * sgn.s * 1000000.0 + 0.5) / 1000000.0 AS loading
    FROM {prev} CROSS JOIN sgn
    """


@q("ann_pca_gram", _pca_gram_oracle_sql(64, 6))
def ann_pca_gram(spark, sf_dir):
    """Top principal component via the ONE-PASS Gram/covariance matrix +
    driver-side power iteration (operators/pca.py::top_component_gram) —
    the right PCA regime when dim is small enough to materialize dim²:
    one distributed aggregation total, versus one distributed pass PER
    iteration (ann_pca_top, the large-dim regime; both conventions
    identical, loadings agree to 6 dp — pinned in tests). The oracle
    computes the covariance cells in SQL and unrolls the same six
    matrix-vector rounds as CTEs."""
    from .operators.pca import top_component_gram

    e = table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    return top_component_gram(spark, e, "v", dim=64, n_iter=6)


def _pca_oracle_sql(dim: int = 64, n_iter: int = 6) -> str:
    """DuckDB replay of operators/pca.py::power_iteration_top — the SAME
    update expressions (s = x·v − μ·v; y = Σ x s − μ Σ s; normalize;
    final largest-|loading| sign fix), unrolled over fixed iterations."""
    v0 = 1.0 / math.sqrt(dim)
    parts = [
        f"""WITH cells AS MATERIALIZED (
      SELECT vec_id, r.range + 1 AS pos1,
             CAST(embedding[r.range + 1] AS DOUBLE) AS val
      FROM embeddings CROSS JOIN range({dim}) r
    ),
    mu AS MATERIALIZED (SELECT pos1, AVG(val) AS m FROM cells GROUP BY pos1),
    v0 AS (SELECT r.range + 1 AS pos1, {v0!r} AS v FROM range({dim}) r)"""
    ]
    prev = "v0"
    for t in range(1, n_iter + 1):
        parts.append(
            f"""c{t} AS MATERIALIZED (SELECT SUM(m * v) AS muv FROM mu JOIN {prev} USING (pos1)),
    s{t} AS MATERIALIZED (SELECT vec_id, SUM(val * v) - (SELECT muv FROM c{t}) AS s
             FROM cells JOIN {prev} USING (pos1) GROUP BY vec_id),
    a{t} AS MATERIALIZED (SELECT pos1, SUM(val * s) AS xy, SUM(s) AS ssum
             FROM cells JOIN s{t} USING (vec_id) GROUP BY pos1),
    y{t} AS MATERIALIZED (SELECT a{t}.pos1, xy - m * ssum AS y FROM a{t} JOIN mu USING (pos1)),
    n{t} AS MATERIALIZED (SELECT sqrt(SUM(y * y)) AS nrm FROM y{t}),
    v{t} AS MATERIALIZED (SELECT pos1, y / (SELECT nrm FROM n{t}) AS v FROM y{t})"""
        )
        prev = f"v{t}"
    parts.append(
        f"""piv AS (SELECT pos1 FROM {prev} ORDER BY abs(v) DESC, pos1 LIMIT 1),
    sgn AS (SELECT CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS s
            FROM {prev} WHERE pos1 = (SELECT pos1 FROM piv))
    SELECT pos1 - 1 AS dim, round(v * (SELECT s FROM sgn), 6) + 0.0 AS loading
    FROM {prev}"""
    )
    return ",\n    ".join(parts)


@q("ann_pca_top", _pca_oracle_sql())
def ann_pca_top(spark, sf_dir):
    """Top principal component of the centered embedding matrix by 6
    fixed power iterations (operators/pca.py) — one aggregate pass per
    iteration, scores computed row-local from the ARRAY with a literal v
    (no 64× materialization), |dim|-row driver collect per step. The
    oracle unrolls the identical update algebra in SQL; 6-dp rounding
    absorbs float-summation reordering (contraction mapping — see module
    docstring)."""
    from .operators.pca import top_component_df

    emb = table(spark, sf_dir, "embeddings")
    return top_component_df(spark, emb, "embedding", dim=64, n_iter=6)


@q(
    "q_k_anonymity",
    """
    SELECT c.c_custkey,
           CASE WHEN g0.n0 >= 10 THEN 0
                WHEN g1.n1 >= 10 THEN 1
                ELSE 2 END AS anon_level
    FROM customer c
    JOIN (SELECT c_nationkey, c_mktsegment, count(*) AS n0
          FROM customer GROUP BY 1, 2) g0
      ON c.c_nationkey = g0.c_nationkey AND c.c_mktsegment = g0.c_mktsegment
    JOIN (SELECT c_nationkey, count(*) AS n1
          FROM customer GROUP BY 1) g1
      ON c.c_nationkey = g1.c_nationkey
    """,
)
def q_k_anonymity(spark, sf_dir):
    """k-anonymity generalization audit (operators/privacy.py::
    k_anonymity_levels): every customer gets the first level of the
    (nation, segment) → (nation) → (all) ladder whose equivalence class
    reaches k=10. Class sizes are two QI-cardinality aggregates joined
    back broadcast — row volume never re-shuffles."""
    from .operators.privacy import k_anonymity_levels

    cust = table(spark, sf_dir, "customer")
    out = k_anonymity_levels(
        cust, [["c_nationkey", "c_mktsegment"], ["c_nationkey"]], k=10
    )
    return out.select("c_custkey", "anon_level")


def _zorder_oracle_sql() -> str:
    from .operators.zorder import quantize_sql, zorder_key2_sql

    qp = quantize_sql("l_partkey", "(SELECT min(l_partkey) FROM lineitem)",
                      "(SELECT max(l_partkey) FROM lineitem)")
    qs = quantize_sql("l_suppkey", "(SELECT min(l_suppkey) FROM lineitem)",
                      "(SELECT max(l_suppkey) FROM lineitem)")
    return f"""
    SELECT bucket, count(*) AS n,
           min(l_partkey) AS p_min, max(l_partkey) AS p_max,
           min(l_suppkey) AS s_min, max(l_suppkey) AS s_max
    FROM (SELECT l_partkey, l_suppkey,
                 ({zorder_key2_sql(qp, qs)} >> 24) AS bucket
          FROM lineitem)
    GROUP BY bucket
    """


@q("q_zorder_layout", _zorder_oracle_sql())
def q_zorder_layout(spark, sf_dir):
    """Z-order clustering layout audit (operators/zorder.py): quantize
    (l_partkey, l_suppkey) to 16 bits each, interleave into a 32-bit
    Morton key, bucket by its top 8 bits — the file assignment an
    OPTIMIZE ZORDER BY would produce — and report per-bucket min/max of
    BOTH dimensions. Each bucket provably spans ≤ 1/16 of each dim's
    domain (4 leading bits per dim), i.e. file-level min/max pruning
    works for predicates on either column; a single-column sort bounds
    only one. Pure integer shift/mask expressions, bit-identical to the
    oracle's chain."""
    from .operators.zorder import quantize, zorder_key2

    li = table(spark, sf_dir, "lineitem")
    lo_hi = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).collect()[0]
    plo, phi, slo, shi = (int(v) for v in lo_hi)
    zkey = zorder_key2(
        quantize("l_partkey", plo, phi), quantize("l_suppkey", slo, shi)
    )
    return (
        li.select("l_partkey", "l_suppkey", F.shiftright(zkey, 24).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("l_partkey").alias("p_min"),
            F.max("l_partkey").alias("p_max"),
            F.min("l_suppkey").alias("s_min"),
            F.max("l_suppkey").alias("s_max"),
        )
    )


@q(
    "dd_edit_distance_pairs",
    """
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.text, b.text) AS INTEGER) AS dist
    FROM documents a JOIN documents b ON a.doc_id < b.doc_id
    WHERE a.n_chars <= 300 AND b.n_chars <= 300
      AND abs(length(a.text) - length(b.text)) <= 4
      AND levenshtein(a.text, b.text) <= 4
    """,
)
def dd_edit_distance_pairs(spark, sf_dir):
    """Typo-level near-dup pairs: exact Levenshtein-distance self-join at
    ed ≤ 4 via pigeonhole segment blocking (operators/editdist.py::
    edit_distance_join — candidates from a (length, segment, substring-
    hash) equi-join, verified with banded levenshtein; no N² stage). The
    oracle IS the N² formulation, so every hash-match certifies zero lost
    pairs. Bounded to n_chars ≤ 300 to keep the oracle's quadratic cost
    sane — the Spark path has no such need."""
    from .operators.editdist import edit_distance_join

    docs = table(spark, sf_dir, "documents").filter(F.col("n_chars") <= 300)
    return edit_distance_join(docs, "doc_id", "text", max_dist=4)


@q(
    "dd_substring_spans",
    """
    WITH g AS (
      SELECT doc_id,
             CAST(unnest(generate_series(1, length(text) - 31)) AS INTEGER) AS pos,
             text
      FROM documents WHERE length(text) >= 32
    ),
    gs AS (SELECT doc_id, pos, substr(text, pos, 32) AS gram FROM g),
    d AS (SELECT doc_id, pos FROM (
            SELECT doc_id, pos, count(*) OVER (PARTITION BY gram) AS n_occ
            FROM gs)
          WHERE n_occ >= 2),
    i AS (SELECT doc_id, pos, pos + 31 AS e,
                 CASE WHEN pos > coalesce(max(pos + 31) OVER (
                          PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1) + 1
                      THEN 1 ELSE 0 END AS ni
          FROM d),
    s AS (SELECT doc_id, pos, e,
                 sum(ni) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS island
          FROM i)
    SELECT doc_id, min(pos) AS span_start, max(e) AS span_end,
           max(e) - min(pos) + 1 AS span_len
    FROM s GROUP BY doc_id, island
    """,
)
def dd_substring_spans(spark, sf_dir):
    """Exact duplicated-substring spans (operators/dedup.py::
    duplicate_substring_spans, k=32): maximal per-doc char ranges covered
    by 32-grams occurring ≥ 2 times anywhere in the corpus — the
    character-level dedup of Lee et al. 2022, completing the dedup family
    (exact doc / MinHash-LSH / SimHash / shingle-Jaccard / embedding /
    winnowing-containment / THIS). One gram groupKey shuffle
    (|bytes|·k — winnowing fingerprints are the bounded scale path when
    that is too much) + per-doc gaps-and-islands interval merge."""
    from .operators.dedup import duplicate_substring_spans

    docs = table(spark, sf_dir, "documents")
    # parallelism-only round-robin repartition, guarded on under-
    # partitioning (the st_bloom_decontam pattern): the gram explode is
    # CPU-dense and the local fixture arrives as ONE split (3.3 → 1.1 s
    # at sf0.1); a many-split production input makes this a no-op
    parts = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < parts:
        docs = docs.repartition(parts)
    return duplicate_substring_spans(docs, k=32)


@q(
    "dd_substring_dedup_apply",
    f"""
    WITH spans AS ({ORACLES["dd_substring_spans"]}),
    segs AS (
      SELECT doc_id,
             coalesce(lag(span_end) OVER (PARTITION BY doc_id
                                          ORDER BY span_start) + 1, 1)
               AS seg_start,
             span_start - 1 AS seg_end
      FROM spans
      UNION ALL
      SELECT doc_id, max(span_end) + 1 AS seg_start,
             CAST(NULL AS INTEGER) AS seg_end
      FROM spans GROUP BY doc_id
    ),
    pieces AS (
      SELECT s.doc_id, s.seg_start,
             substr(d.text, s.seg_start,
                    coalesce(s.seg_end, length(d.text)) - s.seg_start + 1)
               AS piece
      FROM segs s JOIN documents d USING (doc_id)
    ),
    cl AS (
      SELECT doc_id,
             coalesce(string_agg(piece, '' ORDER BY seg_start), '') AS cleaned
      FROM pieces GROUP BY doc_id
    ),
    rm AS (SELECT doc_id,
                  CAST(sum(span_end - span_start + 1) AS BIGINT) AS n_removed
           FROM spans GROUP BY doc_id)
    SELECT cl.doc_id, cl.cleaned, rm.n_removed FROM cl JOIN rm USING (doc_id)
    UNION ALL
    SELECT d.doc_id, d.text AS cleaned, CAST(0 AS BIGINT) AS n_removed
    FROM documents d WHERE d.doc_id NOT IN (SELECT doc_id FROM spans)
    """,
)
def dd_substring_dedup_apply(spark, sf_dir):
    """The TRANSFORMATION half of substring dedup (operators/dedup.py::
    cut_spans): cut every duplicated span out of the text, pass span-free
    docs through, report chars removed. Kept segments are the gaps
    between consecutive spans (lag window over the doc's FEW span rows —
    never over corpus rows) and concatenate with in-aggregate
    deterministic ordering, so no corpus-wide ordered window exists
    anywhere in the plan."""
    from .operators.dedup import cut_spans, duplicate_substring_spans

    docs = table(spark, sf_dir, "documents")
    parts = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < parts:
        docs = docs.repartition(parts)
    spans = duplicate_substring_spans(docs, k=32)
    return cut_spans(docs, spans)


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
    from .operators.sampling import weighted_sample_per_group

    docs = table(spark, sf_dir, "documents")
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
    from .operators.sampling import top_k_per_group

    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
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
    from .operators.text import tfidf

    docs = table(spark, sf_dir, "documents")
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
    from .operators.text import bpe_ish_token_count, token_count

    docs = table(spark, sf_dir, "documents")
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
    from .operators.multimodal import documents_as_media, resize_images, sample_frames

    media = documents_as_media(table(spark, sf_dir, "documents"))
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
    from .operators.text import pii_redact

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
    from .operators.text import token_entropy

    return token_entropy(table(spark, sf_dir, "documents"))


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
    d = table(spark, sf_dir, "documents")
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
    from .operators.similarity import quantize_int8

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
    from .operators.skew import salted_join

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
    from .operators.clustering import assign_clusters

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
    from .operators.clustering import kmeans_lloyd

    e = table(spark, sf_dir, "embeddings")
    assign, _, _ = kmeans_lloyd(e, k=8, n_iter=3)
    return assign.groupBy("cluster").agg(
        F.count("*").alias("n"), r6(F.sum("d2")).alias("sse")
    )


@q("txt_bpe_train")  # iterative (driver-looped) — no single SQL oracle; rows-only
def txt_bpe_train(spark, sf_dir):
    """Distributed BPE tokenizer training over the documents corpus
    (operators/bpe.py::train_bpe): 16 merge rules learned on the weighted
    distinct-word table (corpus-size-independent inner loop), pair counts
    and greedy scan-merges all in JVM codegen, 4 symbol-disjoint merges
    batched per round. Iterative driver-coordinated algorithm ⇒ rows-only
    driver check; tests/test_bpe.py pins the merge sequence EXACTLY
    against a pure-python classic-BPE reference (merges_per_round=1) plus
    encode-path equivalence. LLM-pipeline surface (SURVEY §6) — the
    trainer behind bpe_ish_token_count's fixed tokenizer."""
    from .operators.bpe import merge_table, train_bpe

    docs = table(spark, sf_dir, "documents")
    return merge_table(spark, train_bpe(docs, n_merges=16, merges_per_round=4))


@q("txt_bpe_encode")
def txt_bpe_encode(spark, sf_dir):
    """Train-then-apply tokenizer loop: the 16 rules learned by
    txt_bpe_train replayed over every document as chained JVM scan-merges
    (operators/bpe.py::bpe_encode), emitting per-doc token counts.
    Iterative trainer ⇒ rows-only driver check; tests/test_bpe.py pins
    the encode path EXACTLY against a pure-python replay and pins the
    JVM-expression path ≡ the mapInPandas path."""
    from .operators.bpe import bpe_encode, train_bpe

    docs = table(spark, sf_dir, "documents")
    merges = train_bpe(docs, n_merges=16, merges_per_round=4)
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
    from .operators.bpe import bpe_encode

    docs = table(spark, sf_dir, "documents")
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
    from .operators.packing import pack_manifest

    return pack_manifest(
        table(spark, sf_dir, "documents"), capacity=2048, n_shards=8
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
    docs = table(spark, sf_dir, "documents")
    from .operators.dedup import tokens as _tokens

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
    from .operators.text import normalize_text

    docs = table(spark, sf_dir, "documents")
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
    from .pipeline.pretrain import pretrain_prep

    return pretrain_prep(table(spark, sf_dir, "documents"))


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
    from .operators.graph import pagerank

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
    from .operators.similarity import semdedup_pairs

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
    from .operators.lm import score_cross_entropy, train_bigram_lm

    docs = table(spark, sf_dir, "documents")
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
    from .operators.lm import score_cross_entropy, train_bigram_lm

    docs = table(spark, sf_dir, "documents")
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
    from .operators.sampling import hash_uniform

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
    from .operators.dedup import doc_tokens

    docs = table(spark, sf_dir, "documents")
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
    from .operators.dedup import doc_tokens

    docs = table(spark, sf_dir, "documents")
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
    from .operators.sampling import hash_uniform

    docs = table(spark, sf_dir, "documents")
    from .operators.dedup import tokens as _tokens

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
    from .operators.rank import global_ntile

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
    from .operators.sketches import hll_estimate, hll_registers

    li = table(spark, sf_dir, "lineitem")
    # parallelism-only round-robin repartition of ONLY the md5-dense HLL
    # branch (see st_bloom_decontam), guarded on under-partitioning: the
    # local fixture arrives as 3 splits (2.8 -> 1.9 s at sf0.1), while
    # the exact-stats branch does no hashing and keeps running shuffle-
    # free off the scan; on a many-split production input the guard makes
    # this a no-op rather than a parallelism-REDUCING full-table shuffle
    parts = spark.sparkContext.defaultParallelism
    li_hll = li.repartition(parts) if li.rdd.getNumPartitions() < parts else li
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
    stacked = li_hll.select(
        F.expr(f"stack({len(_PROFILE_COLS)}, {stack_v}) AS (column_name, v)")
    ).where(F.col("v").isNotNull())
    quant = stacked.select(
        "column_name",
        F.floor(F.col("v") * F.lit(1000000.0) + F.lit(0.5)).cast("bigint").alias("qv"),
    )
    regs = hll_registers(quant, "qv", ["column_name"], p=8)
    est = hll_estimate(regs, ["column_name"], p=8).select("column_name", "est_distinct")
    return exact.join(F.broadcast(est), "column_name").select(
        "column_name", "n_rows", "n_null", "est_distinct", "min_v", "max_v", "mean_v"
    )


# ---------------------------------------------------------------------------
# Warehouse / product-analytics operators (engine additions beyond the
# reference): CDC log-compaction snapshot, SCD2 history build, conversion
# funnel, cohort retention, Spark-native session windows, grid-bucketed
# spatial ε-join, TPC-H Q3, per-language top n-grams. All are the query
# shapes a lakehouse user runs daily; each has an exact DuckDB oracle.
# ---------------------------------------------------------------------------


@q(
    "q_cdc_snapshot",
    """
    WITH t AS (
      SELECT user_id, event_type, value, epoch_us(ts) AS tu,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_type AS last_op, round(value, 6) AS value,
           tu AS last_ts_us
    FROM t WHERE rn = 1 AND event_type <> 'error'
    """,
)
def q_cdc_snapshot(spark, sf_dir):
    """CDC changelog apply (log compaction): latest row per key wins; a
    terminal tombstone ('error') drops the key from the snapshot. One hash
    exchange keyed on user_id; the window top-1 reduces each key to a
    single row, so at 100 TB the output (and everything downstream) is
    |keys|-sized — the standard upsert-materialization shape."""
    ev = events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("event_type").alias("last_op"),
            r6(F.col("value")).alias("value"),
            F.col("ts_us").alias("last_ts_us"),
        )
    )


@q(
    "q_scd2_intervals",
    f"""
    WITH t AS (
      SELECT user_id, event_type, epoch_us(ts) AS tu, event_id,
             CASE WHEN lag(event_type) OVER ({_EV_W_SQL})
                       IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
      FROM events
    ),
    isl AS (
      SELECT user_id, event_type, tu,
             sum(chg) OVER (PARTITION BY user_id ORDER BY tu, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM t
    ),
    iv AS (
      SELECT user_id, min(event_type) AS attr, min(tu) AS valid_from,
             count(*) AS n_rows
      FROM isl GROUP BY user_id, island
    )
    SELECT user_id, attr, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
             AS valid_to,
           n_rows
    FROM iv
    """,
)
def q_scd2_intervals(spark, sf_dir):
    """SCD2 history build: compress the per-key event stream into
    [valid_from, valid_to) attribute intervals (gaps-and-islands — the
    same boundary-cumsum as W4/sessionize, then one groupBy and a lead()
    to close each interval). valid_to IS NULL marks the current row.
    Scale: everything is keyed on user_id — one exchange, three sorts
    reused on the same partitioning."""
    return _scd2_intervals(events(spark, sf_dir))


def _scd2_intervals(ev):
    w = Window.partitionBy("user_id").orderBy(*EV_ORDER)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    isl = (
        ev.select("user_id", "event_type", "ts_us", "event_id")
        .withColumn(
            "chg",
            F.when(
                ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
            ).otherwise(0),
        )
        .withColumn("island", F.sum("chg").over(wc))
    )
    iv = isl.groupBy("user_id", "island").agg(
        F.min("event_type").alias("attr"),
        F.min("ts_us").alias("valid_from"),
        F.count("*").alias("n_rows"),
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    return iv.select(
        "user_id",
        "attr",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_rows",
    )


@q(
    "q_pit_join",
    f"""
    WITH t AS (
      SELECT user_id, event_type, epoch_us(ts) AS tu, event_id,
             CASE WHEN lag(event_type) OVER ({_EV_W_SQL})
                       IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
      FROM events
    ),
    isl AS (
      SELECT user_id, event_type, tu,
             sum(chg) OVER (PARTITION BY user_id ORDER BY tu, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM t
    ),
    iv AS (
      SELECT user_id, min(event_type) AS attr, min(tu) AS valid_from
      FROM isl GROUP BY user_id, island
    ),
    dim AS (
      SELECT user_id, attr, valid_from,
             lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
               AS valid_to
      FROM iv
    ),
    f AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'purchase'
    )
    SELECT f.event_id, f.user_id, f.ts_us,
           d.attr AS attr_at_ts, d.valid_from AS dim_valid_from
    FROM f JOIN dim d
      ON f.user_id = d.user_id
     AND d.valid_from <= f.ts_us
     AND (d.valid_to IS NULL OR f.ts_us < d.valid_to)
     AND (d.valid_to IS NULL OR d.valid_to > d.valid_from)
    """,
)
def q_pit_join(spark, sf_dir):
    """Point-in-time dimension join: each purchase fact picks the SCD2
    attribute version valid AT its timestamp. The warehouse-standard
    formulation is an interval-containment theta join (the oracle does
    exactly that); the Spark-first scale path recognizes PIT == BACKWARD
    AS-OF against interval starts and reuses the J2 union+window machinery
    (operators/joins.py::asof_join, cast_values=False carries the STRING
    attribute natively) — one shuffle on user_id, no per-key cross
    product, same exchange as every other user-keyed stage. Degenerate
    zero-width versions (possible only under same-microsecond attribute
    flips) are dropped on both sides so fact instants resolve to the
    surviving interval identically."""
    ev = events(spark, sf_dir)
    dim = _scd2_intervals(ev).filter(
        F.col("valid_to").isNull() | (F.col("valid_to") > F.col("valid_from"))
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    samples = dim.select(
        "user_id",
        F.col("valid_from").alias("ts_us"),
        F.col("attr"),
        F.col("valid_from").alias("dim_valid_from"),
    )
    from .operators.joins import asof_join

    res = asof_join(
        samples,
        facts,
        on="ts_us",
        values=["attr", "dim_valid_from"],
        partition_by=["user_id"],
        direction="backward",
        cast_values=False,
    )
    return res.select(
        "event_id",
        "user_id",
        "ts_us",
        F.col("attr").alias("attr_at_ts"),
        "dim_valid_from",
    )


@q(
    "q_funnel_conversion",
    """
    WITH s1 AS (
      SELECT user_id, epoch_us(ts) AS tu, event_type,
             min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
               OVER (PARTITION BY user_id) AS t1
      FROM events
    ),
    s2 AS (
      SELECT user_id, tu, event_type, t1,
             min(CASE WHEN event_type = 'click' AND tu > t1 THEN tu END)
               OVER (PARTITION BY user_id) AS t2
      FROM s1
    ),
    s3 AS (
      SELECT user_id, t1, t2,
             min(CASE WHEN event_type = 'purchase' AND tu > t2 THEN tu END)
               OVER (PARTITION BY user_id) AS t3
      FROM s2
    ),
    u AS (
      SELECT user_id, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3
      FROM s3 GROUP BY user_id
    )
    SELECT count(CASE WHEN t1 IS NOT NULL THEN 1 END) AS step_view,
           count(CASE WHEN t2 IS NOT NULL THEN 1 END) AS step_click,
           count(CASE WHEN t3 IS NOT NULL THEN 1 END) AS step_purchase,
           round(CAST(sum(CASE WHEN t3 IS NOT NULL THEN t3 - t1 END) AS DOUBLE)
                 / nullif(count(CASE WHEN t3 IS NOT NULL THEN 1 END), 0), 6)
             AS avg_convert_us
    FROM u
    """,
)
def q_funnel_conversion(spark, sf_dir):
    """Ordered conversion funnel view → click → purchase: t1 = first view,
    t2 = first click AFTER t1, t3 = first purchase AFTER t2 (strict
    ordering, the product-analytics definition). Three per-key window mins
    chained on ONE user_id exchange, then a global 1-row rollup.
    avg_convert_us divides an exact integer-µs sum by an exact count, so
    the double quotient is engine-identical."""
    ev = events(spark, sf_dir)
    wu = Window.partitionBy("user_id")
    s = ev.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "view", F.col("ts_us"))).over(wu)
    )
    s = s.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts_us") > F.col("t1")),
                F.col("ts_us"),
            )
        ).over(wu),
    )
    s = s.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts_us") > F.col("t2")),
                F.col("ts_us"),
            )
        ).over(wu),
    )
    u = s.groupBy("user_id").agg(
        F.min("t1").alias("t1"), F.min("t2").alias("t2"), F.min("t3").alias("t3")
    )
    converted = F.when(F.col("t3").isNotNull(), 1)
    return u.agg(
        F.count(F.when(F.col("t1").isNotNull(), 1)).alias("step_view"),
        F.count(F.when(F.col("t2").isNotNull(), 1)).alias("step_click"),
        F.count(converted).alias("step_purchase"),
        F.round(
            F.sum(F.when(F.col("t3").isNotNull(), F.col("t3") - F.col("t1"))).cast(
                "double"
            )
            / F.nullif(F.count(converted), F.lit(0)),
            6,
        ).alias("avg_convert_us"),
    )


@q(
    "q_cohort_retention",
    """
    WITH t AS (
      SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events
    ),
    c AS (
      SELECT user_id, wk, min(wk) OVER (PARTITION BY user_id) AS cohort_wk
      FROM t
    )
    SELECT cohort_wk, wk - cohort_wk AS week_offset,
           count(DISTINCT user_id) AS active_users
    FROM c GROUP BY cohort_wk, week_offset
    """,
)
def q_cohort_retention(spark, sf_dir):
    """Cohort retention triangle: cohort = first-seen epoch-week per user
    (integer µs division — no calendar/tz functions, engine-identical),
    cell = distinct active users at each week offset. Scale: one user_id
    exchange for the cohort window, then a (cohort, offset)-keyed
    count-distinct whose partial aggregation dedupes (key, user) map-side."""
    ev = events(spark, sf_dir).select(
        "user_id", F.expr("ts_us div 604800000000").alias("wk")
    )
    c = ev.withColumn("cohort_wk", F.min("wk").over(Window.partitionBy("user_id")))
    return c.groupBy(
        "cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("week_offset")
    ).agg(F.count_distinct("user_id").alias("active_users"))


@q(
    "q_session_window_native",
    f"""
    WITH t AS (
      SELECT user_id, event_id, epoch_us(ts) AS tu,
             epoch_us(ts) - lag(epoch_us(ts)) OVER ({_EV_W_SQL}) AS gap_us
      FROM events
    ),
    s AS (
      SELECT user_id, tu,
             sum(CASE WHEN gap_us IS NULL OR gap_us >= 1800000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY tu, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM t
    )
    SELECT user_id, min(tu) AS session_start_us,
           max(tu) + 1800000000 AS session_end_us,
           count(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def q_session_window_native(spark, sf_dir):
    """Spark-native session windows (F.session_window, 30-min gap) run in
    BATCH mode — the same operator the streaming engine uses for stateful
    session aggregation, here oracle-checked against the gaps-and-islands
    formulation (session windows are half-open [t, t+gap), so a gap of
    exactly 30 min STARTS a new session — hence `>=` in the oracle, vs
    `>` in q_sessionize's keep-together convention). µs → timestamp via
    timestamp_micros and back via unix_micros, both tz-independent."""
    ev = events(spark, sf_dir).withColumn("t", F.timestamp_micros(F.col("ts_us")))
    return (
        ev.groupBy("user_id", F.session_window("t", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
            "n_events",
        )
    )


@q(
    "q_spatial_eps_join",
    """
    WITH p AS (
      SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
             CAST(embedding[2] AS DOUBLE) AS y
      FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)), 6) AS dist
    FROM p a JOIN p b
      ON a.vec_id < b.vec_id
     AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) < 0.0625 * 0.0625
    """,
)
def q_spatial_eps_join(spark, sf_dir):
    """ε-neighborhood spatial self-join via grid-cell bucketing (ε=2⁻⁴,
    exactly representable): each point keys to its ⌊coord/ε⌋ cell, one
    side fans out to the 3×3 neighbor cells, the join runs on the cell
    key, and the exact distance predicate filters candidates. Cell width
    = ε guarantees every true pair shares a (possibly neighboring) cell,
    and each pair is produced exactly once (the probe side sits in one
    cell). The oracle is the all-pairs formulation; the Spark plan is a
    hash join on (cx, cy) — at 100 TB each point shuffles ≤10 rows
    instead of the |N|² crossJoin, and skew is bounded by the physical
    point density of an ε-cell."""
    emb = table(spark, sf_dir, "embeddings")
    p = emb.select(
        "vec_id",
        F.col("embedding")[0].cast("double").alias("x"),
        F.col("embedding")[1].cast("double").alias("y"),
    )
    eps = F.lit(0.0625)
    three = F.array([F.lit(i) for i in (-1, 0, 1)])
    offs = (
        spark.range(1)
        .select(F.explode(three).alias("dx"))
        .select("dx", F.explode(three).alias("dy"))
    )
    a = p.crossJoin(F.broadcast(offs)).select(
        F.col("vec_id").alias("vec_a"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        (F.floor(F.col("x") / eps) + F.col("dx")).alias("cx"),
        (F.floor(F.col("y") / eps) + F.col("dy")).alias("cy"),
    )
    b = p.select(
        F.col("vec_id").alias("vec_b"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.floor(F.col("x") / eps).alias("cx"),
        F.floor(F.col("y") / eps).alias("cy"),
    )
    dx = F.col("ax") - F.col("bx")
    dy = F.col("ay") - F.col("by")
    d2 = dx * dx + dy * dy
    return (
        a.join(b, ["cx", "cy"])
        .filter((F.col("vec_a") < F.col("vec_b")) & (d2 < F.lit(0.0625 * 0.0625)))
        .select("vec_a", "vec_b", r6(F.sqrt(d2)).alias("dist"))
    )


@q(
    "q_tpch_q3",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark, sf_dir):
    """TPC-H Q3 shipping priority: selective dim filter broadcast into a
    fact-fact join, grouped revenue, distributed top-10 (TakeOrdered —
    no global sort materialization). The customer side is broadcast
    (post-filter it is a fraction of an already-small dim); orders and
    lineitem co-shuffle on the order key. Ties at the limit boundary are
    broken on l_orderkey over the ROUNDED revenue, so the cut is
    engine-deterministic."""
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@q(
    "txt_top_ngrams",
    """
    WITH toks AS (
      SELECT doc_id, lang, regexp_split_to_array(text, '\\s+') AS t
      FROM documents
    ),
    bg AS (
      SELECT lang, t[i-1] || ' ' || t[i] AS bigram
      FROM toks, unnest(range(2, len(t) + 1)) AS u(i)
    ),
    c AS (SELECT lang, bigram, count(*) AS cnt FROM bg GROUP BY lang, bigram)
    SELECT lang, bigram, cnt FROM (
      SELECT lang, bigram, cnt,
             row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, bigram) AS rn
      FROM c) WHERE rn <= 5
    """,
)
def txt_top_ngrams(spark, sf_dir):
    """Per-language top-5 bigrams: whitespace tokenization, JVM-side
    transform/explode (no Python), count, windowed rank with a
    deterministic (cnt DESC, bigram) tiebreak. Scale: the explode is
    O(tokens) but the shuffle after partial aggregation is |distinct
    (lang, bigram)| — corpus-vocabulary-sized, not corpus-sized; the
    rank exchange is |langs|-keyed."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("lang", F.split("text", r"\s+").alias("t"))
    bg = toks.select(
        "lang",
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 2 THEN transform(sequence(1, size(t) - 1), "
                "i -> concat(t[i-1], ' ', t[i])) ELSE array() END"
            )
        ).alias("bigram"),
    )
    c = bg.groupBy("lang", "bigram").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), "bigram")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("lang", "bigram", "cnt")
    )


# ---------------------------------------------------------------------------
# Round-3 additions: multi-granularity aggregation, distribution windows,
# robust-statistics QC, explicit bloom semi-join reduction, chunk-level
# dedup, PQ ANN, stream-static enrichment (batch twin)
# ---------------------------------------------------------------------------


@q(
    "q_grouping_sets",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS rflag,
           coalesce(l_linestatus, 'ALL') AS lstatus,
           round(sum(l_quantity), 6) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def q_grouping_sets(spark, sf_dir):
    """Multi-granularity aggregation in ONE pass: GROUPING SETS computes
    the (flag, status), (flag) and grand-total granularities from a single
    scan + single Expand-fed shuffle instead of three scans unioned —
    at 100 TB that is the difference between reading the fact table once
    and three times. NULL group keys are coalesced to 'ALL' on both sides
    so the hash compare is sentinel-stable."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(r6(F.sum("l_quantity")).alias("sum_qty"), F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("lstatus"),
            "sum_qty",
            "n",
        )
    )


@q(
    "q_window_distribution",
    """
    SELECT event_id, event_type,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cume
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
)
def q_window_distribution(spark, sf_dir):
    """Distribution window functions (ntile / percent_rank / cume_dist)
    per event_type — the quantile-bucketing shape used for curriculum
    binning and score calibration. The event_id tiebreak removes ORDER BY
    peers, making all three functions engine-deterministic. One exchange
    keyed by event_type; the sort is per-partition."""
    ev = events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        F.ntile(4).over(w).alias("quartile"),
        r6(F.percent_rank().over(w)).alias("pct_rank"),
        r6(F.cume_dist().over(w)).alias("cume"),
    )


@q(
    "q_mad_outliers",
    """
    WITH med AS (
      SELECT event_type, median(value) AS m FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type, any_value(m) AS m,
             median(abs(e.value - m)) AS mad
      FROM events e JOIN med USING (event_type) GROUP BY e.event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           round((e.value - m) / nullif(1.4826 * mad, 0.0), 6) AS robust_z
    FROM events e JOIN mad USING (event_type)
    WHERE abs(round((e.value - m) / nullif(1.4826 * mad, 0.0), 6)) > 3.0
    """,
)
def q_mad_outliers(spark, sf_dir):
    """Robust outlier detection via median absolute deviation — the QC
    filter that survives the heavy tails that break mean/stddev z-scores
    (reference masks on fixed thresholds, process_adcp.py:419-447; MAD is
    the data-driven generalization). Two grouped exact medians over a
    |event_type|-sized key space, each result broadcast back — the fact
    table is never shuffled, only scanned. The outlier cut compares the
    ROUNDED robust z on both engines so the boundary is deterministic."""
    ev = events(spark, sf_dir).select("event_id", "event_type", "value")
    med = ev.groupBy("event_type").agg(F.median("value").alias("m"))
    dev = ev.join(F.broadcast(med), "event_type")
    mad = (
        dev.groupBy("event_type")
        .agg(F.any_value("m").alias("m"), F.median(F.abs(F.col("value") - F.col("m"))).alias("mad"))
    )
    rz = r6((F.col("value") - F.col("m")) / F.nullif(F.lit(1.4826) * F.col("mad"), F.lit(0.0)))
    return (
        ev.join(F.broadcast(mad), "event_type")
        .withColumn("robust_z", rz)
        .filter(F.abs(F.col("robust_z")) > 3.0)
        .select("event_id", "event_type", "value", "robust_z")
    )


@q(
    "q_bloom_semi_reduction",
    """
    SELECT l_returnflag, count(*) AS n,
           round(sum(l_extendedprice), 4) AS sum_price
    FROM lineitem
    WHERE l_orderkey IN
          (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
    GROUP BY l_returnflag
    """,
)
def q_bloom_semi_reduction(spark, sf_dir):
    """Explicit bloom-filter semi-join reduction (operators/bloomjoin.py):
    the urgent-order keys aggregate into a 32 KiB bitmap (one narrow
    shuffle, n_words rows), cross the driver once as a scalar broadcast,
    and re-enter as a literal-array codegen predicate that drops
    non-matching lineitem rows AT THE SCAN — before any exchange. The
    exact semi join then removes bloom false positives, so results equal
    the plain semi join while the fact-side shuffle carries only
    matches + fpr. This is the reduction AQE's runtime bloom filter
    injects for eligible shapes, made explicit and plan-independent."""
    from .operators.bloomjoin import bloom_semi_join

    li = table(spark, sf_dir, "lineitem")
    urgent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    hits = bloom_semi_join(li, urgent, "l_orderkey", "o_orderkey")
    return hits.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
    )


@q(
    "txt_chunk_dedup",
    f"""
    WITH tk AS (SELECT doc_id, {_TOK_SQL} AS toks FROM documents),
    n AS (SELECT doc_id, toks, len(toks) AS nt FROM tk WHERE len(toks) > 0),
    c AS (SELECT doc_id, toks, nt,
                 unnest(generate_series(0, CAST(ceil(nt / 24.0) AS BIGINT) - 1)) AS k
          FROM n),
    chunks AS (
      SELECT doc_id, k AS chunk_id,
             array_to_string(toks[k*24 + 1 : least(k*24 + 32, nt)], ' ') AS chunk_text,
             least(k*24 + 32, nt) - k*24 AS chunk_len
      FROM c WHERE k*24 < nt)
    SELECT doc_id, chunk_id, chunk_len, n_copies FROM (
      SELECT doc_id, chunk_id, chunk_len,
             row_number() OVER (PARTITION BY chunk_text ORDER BY doc_id, chunk_id) AS rn,
             count(*)    OVER (PARTITION BY chunk_text) AS n_copies
      FROM chunks) WHERE rn = 1
    """,
)
def txt_chunk_dedup(spark, sf_dir):
    """Sequence-level exact dedup over the context-window chunks — the
    pretraining step between chunking and packing: duplicated training
    sequences (boilerplate, templates, cross-doc copies) are collapsed to
    their first occurrence (min doc_id, chunk_id) with a survivor
    duplicate count. One shuffle keyed by chunk text; at 100 TB key on
    the chunk digest instead (same semantics, 16-byte keys) and the skew
    bound is the largest duplicate cluster."""
    chunks = txt_chunk(spark, sf_dir)
    w = Window.partitionBy("chunk_text").orderBy("doc_id", "chunk_id")
    return (
        chunks.withColumn("rn", F.row_number().over(w))
        .withColumn("n_copies", F.count("*").over(Window.partitionBy("chunk_text")))
        .filter(F.col("rn") == 1)
        .select("doc_id", "chunk_id", "chunk_len", "n_copies")
    )


def _pq_oracle_sql(
    n_sub: int = 16, n_cent: int = 16, k: int = 5, shortlist: int = 100,
    dim: int = 64, sample_n: int = 512, iters: int = 8,
) -> str:
    """DuckDB replay of similarity.pq_topk INCLUDING the per-subspace
    codebook training: md5-ordered sample, lowest-id init, ``iters``
    Lloyd rounds on 6-dp rounded subspace distances. All 16 subspaces
    ride ONE CTE chain keyed (sub, c_id) — the unroll is over Lloyd
    rounds only, not subspaces. ADC lookup sums and the cosine re-rank
    compare on 6-dp rounded values exactly like the engine (upgraded
    from rows-only in round 5)."""
    d_sub = dim // n_sub
    parts = [f"""WITH cells AS MATERIALIZED (
      SELECT vec_id, r.range + 1 AS pos1,
             CAST(embedding[r.range + 1] AS DOUBLE) AS val
      FROM embeddings CROSS JOIN range({dim}) r
    ),
    sp AS MATERIALIZED (
      SELECT vec_id, CAST((pos1 - 1) // {d_sub} AS BIGINT) AS sub,
             ((pos1 - 1) % {d_sub}) + 1 AS spos, val
      FROM cells
    ),
    samp AS MATERIALIZED (
      SELECT vec_id FROM (
        SELECT vec_id, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
        FROM embeddings
      ) WHERE rk <= {sample_n}
    ),
    ps AS MATERIALIZED (
      SELECT sp.vec_id AS id, sp.sub, sp.spos, sp.val
      FROM sp JOIN samp s ON s.vec_id = sp.vec_id
    ),
    cent0 AS MATERIALIZED (
      SELECT CAST(dense_rank() OVER (ORDER BY id) - 1 AS BIGINT) AS c_id, sub, spos, val AS cval
      FROM ps WHERE id IN (SELECT id FROM (SELECT DISTINCT id FROM ps) ORDER BY id LIMIT {n_cent})
    )"""]
    prev = "cent0"
    for t in range(1, iters + 1):
        parts.append(f"""asg{t} AS MATERIALIZED (
      SELECT id, sub, c_id FROM (
        SELECT ps.id, ps.sub, p.c_id,
               row_number() OVER (
                 PARTITION BY ps.id, ps.sub
                 ORDER BY round(SUM((ps.val - p.cval) * (ps.val - p.cval)), 6), p.c_id
               ) AS rn
        FROM ps JOIN {prev} p ON p.sub = ps.sub AND p.spos = ps.spos
        GROUP BY ps.id, ps.sub, p.c_id
      ) WHERE rn = 1
    ),
    mean{t} AS MATERIALIZED (
      SELECT a.sub, a.c_id, ps.spos, AVG(ps.val) AS cval
      FROM asg{t} a JOIN ps ON ps.id = a.id AND ps.sub = a.sub
      GROUP BY 1, 2, 3
    ),
    cent{t} AS MATERIALIZED (
      SELECT p.c_id, p.sub, p.spos, COALESCE(m.cval, p.cval) AS cval
      FROM {prev} p LEFT JOIN mean{t} m
        ON m.c_id = p.c_id AND m.sub = p.sub AND m.spos = p.spos
    )""")
        prev = f"cent{t}"
    parts.append(f"""codes AS MATERIALIZED (
      SELECT vec_id, sub, c_id FROM (
        SELECT sp.vec_id, sp.sub, p.c_id,
               row_number() OVER (
                 PARTITION BY sp.vec_id, sp.sub
                 ORDER BY round(SUM((sp.val - p.cval) * (sp.val - p.cval)), 6), p.c_id
               ) AS rn
        FROM sp JOIN {prev} p ON p.sub = sp.sub AND p.spos = sp.spos
        GROUP BY sp.vec_id, sp.sub, p.c_id
      ) WHERE rn = 1
    ),
    luts AS MATERIALIZED (
      SELECT sp.vec_id AS query_id, sp.sub, p.c_id,
             SUM((sp.val - p.cval) * (sp.val - p.cval)) AS d2q
      FROM sp JOIN {prev} p ON p.sub = sp.sub AND p.spos = sp.spos
      WHERE sp.vec_id < 10
      GROUP BY 1, 2, 3
    ),
    short AS MATERIALIZED (
      SELECT query_id, nbr_id FROM (
        SELECT l.query_id, c.vec_id AS nbr_id,
               row_number() OVER (
                 PARTITION BY l.query_id
                 ORDER BY round(SUM(l.d2q), 6), c.vec_id
               ) AS rn
        FROM codes c JOIN luts l ON l.sub = c.sub AND l.c_id = c.c_id
        WHERE c.vec_id <> l.query_id
        GROUP BY l.query_id, c.vec_id
      ) WHERE rn <= {shortlist}
    ),
    ev AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scored AS MATERIALIZED (
      SELECT s.query_id, s.nbr_id,
             round(list_dot_product(a.v, b.v)
                   / nullif(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)), 0.0),
                   6) AS sim
      FROM short s JOIN ev a ON a.vec_id = s.query_id JOIN ev b ON b.vec_id = s.nbr_id
    )
    SELECT query_id, CAST(rn AS INTEGER) AS rank, nbr_id, sim FROM (
      SELECT query_id, nbr_id, sim,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, nbr_id) AS rn
      FROM scored
    ) WHERE rn <= {k}""")
    return ",\n    ".join(parts)


@q("ann_topk_pq", _pq_oracle_sql())
def ann_topk_pq(spark, sf_dir):
    """Product-quantization ANN with ADC shortlist + exact re-rank
    (operators/similarity.py::pq_topk): vectors compress 16x into
    16-byte codes, candidate scoring reads ONLY codes + per-query literal
    lookup tables, and just |queries| x shortlist full vectors are touched
    for the re-rank. The third scale path beside banded-LSH and IVF;
    recall@5 pinned vs brute force in tests/test_similarity_recall.py.
    With the md5 sample, lowest-id init and 6-dp rounded code/ADC
    comparisons the quantizer is deterministic and portable, so the
    oracle replays training + encoding + shortlist + re-rank EXACTLY —
    upgraded from rows-only in round 5."""
    from .operators.similarity import pq_topk

    e = table(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq_topk(e, qs, n_sub=16, n_cent=16, k=5, shortlist=100)


@q(
    "st_enrich_static",
    """
    WITH dim(event_type, weight, family) AS (VALUES
      ('view', 1.0, 'passive'), ('click', 2.0, 'active'),
      ('signup', 5.0, 'active'), ('purchase', 10.0, 'active'),
      ('error', 0.0, 'ops')
    )
    SELECT epoch_us(ts) // 3600000000 AS hour_bucket, family,
           count(*) AS n, round(sum(value * weight), 6) AS weighted_v
    FROM events JOIN dim USING (event_type)
    GROUP BY 1, 2
    """,
)
def st_enrich_static(spark, sf_dir):
    """Stream-static enrichment (batch twin of the Structured Streaming
    broadcast join in streaming/enrich.py, same logical plan): every
    micro-batch of the unbounded side joins a small static dimension via
    broadcast — no state store, no watermark, the canonical streaming
    feature-enrichment shape. The dim is inline VALUES on both engines."""
    dim = spark.createDataFrame(
        [
            ("view", 1.0, "passive"),
            ("click", 2.0, "active"),
            ("signup", 5.0, "active"),
            ("purchase", 10.0, "active"),
            ("error", 0.0, "ops"),
        ],
        "event_type string, weight double, family string",
    )
    ev = events(spark, sf_dir)
    return (
        ev.join(F.broadcast(dim), "event_type")
        .groupBy(F.expr("ts_us div 3600000000").alias("hour_bucket"), "family")
        .agg(F.count("*").alias("n"), r6(F.sum(F.col("value") * F.col("weight"))).alias("weighted_v"))
    )


# ---------------------------------------------------------------------------
# Round 3 — deeper OLAP join coverage (TPC-H Q5/Q10/Q14/Q18/Q19 shapes on
# the available columns), KMV distinct sketch, winnowing fingerprints,
# Python UDTF surface, OHLC downsampling, time-decayed aggregates.
# ---------------------------------------------------------------------------


@q(
    "q_tpch_q5",
    """
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN supplier ON s_suppkey = l_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = n_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5 (local supplier volume): 6-table join where customer and
    supplier nation must MATCH — the classic snowflake probe with a
    non-hierarchical cross-dimension equality. Plan: lineitem⋈orders is the
    only big-big shuffle; customer/supplier/nation/region all broadcast
    (AQE picks this below the 10 MB default at any SF; at 100 TB customer
    outgrows broadcast and AQE falls back to a shuffle join on o_custkey —
    both fine, no plan rewrite needed). Date filter pushed to the orders
    scan."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(
            F.broadcast(s),
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy("n_name")
        .agg(r6(F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))).alias("revenue"))
    )


@q(
    "q_tpch_q10",
    """
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation   ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark, sf_dir):
    """TPC-H Q10 (returned-item reporting): who returned the most revenue
    in a quarter+ window. Returnflag filter pushed to the lineitem scan,
    date filter to orders; customer/nation broadcast; top-20 runs as a
    distributed TakeOrdered (no global sort materialization). c_custkey
    tiebreak makes the LIMIT deterministic for the oracle compare."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(r6(F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@q(
    "q_tpch_q14",
    """
    SELECT date_trunc('month', l_shipdate) AS ship_month,
           round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_pct,
           count(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def q_tpch_q14(spark, sf_dir):
    """TPC-H Q14 (promotion effect), per month: conditional-aggregate ratio
    over a fact⋈dim join. part broadcasts; one shuffle on the month key;
    the CASE folds into the same partial aggregate as the denominator, so
    the ratio costs one pass."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    p = table(spark, sf_dir, "part")
    net = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", net).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.date_trunc("month", F.col("l_shipdate")).alias("ship_month"))
        .agg(
            r6(F.lit(100.0) * F.sum(promo) / F.sum(net)).alias("promo_pct"),
            F.count("*").alias("n_items"),
        )
    )


@q(
    "q_tpch_q18",
    """
    SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
           round(sum(l_quantity), 6) AS total_qty
    FROM orders
      JOIN customer ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 180
    )
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def q_tpch_q18(spark, sf_dir):
    """TPC-H Q18 (large-volume customer): HAVING-subquery membership
    expressed as an aggregate→semi-join. The qualifying-order set is the
    output of a map-side-combined groupBy (tiny vs lineitem), so it
    broadcast-left-semi-joins back into the fact; no correlated per-row
    subquery execution exists anywhere in the plan."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 180)
        .select("l_orderkey")
    )
    return (
        o.join(F.broadcast(big), F.col("o_orderkey") == big.l_orderkey, "left_semi")
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(r6(F.sum("l_quantity")).alias("total_qty"))
    )


@q(
    "q_tpch_q19",
    """
    SELECT p_brand, round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1  AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 30 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
    GROUP BY p_brand
    """,
)
def q_tpch_q19(spark, sf_dir):
    """TPC-H Q19 (discounted revenue, disjunctive predicates): three
    AND-clauses OR'd across join sides. Catalyst splits the disjunction:
    the part-only part (brand ∈ {1,2,3}) and lineitem-only part (quantity
    ∈ [1,50]) push to their scans as PushedFilters, the mixed residual
    evaluates post-join — the textbook test that pushdown survives
    disjunctions rather than giving up."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2") & F.col("p_size").between(5, 30) & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 50)
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .groupBy("p_brand")
        .agg(
            r6(F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@q(
    "q_kmv_distinct",
    """
    WITH h AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5(user_id::VARCHAR), 1, 12))::BIGINT AS h
      FROM events WHERE user_id IS NOT NULL
    ),
    r AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM h
    )
    SELECT event_type, count(*) AS n_kept, max(h) AS kth_hash,
           round(CASE WHEN count(*) < 64 THEN count(*)::DOUBLE
                      ELSE 63.0::DOUBLE * 281474976710656.0::DOUBLE / max(h) END, 6) AS est_distinct
    FROM r WHERE rn <= 64
    GROUP BY event_type
    """,
)
def q_kmv_distinct(spark, sf_dir):
    """KMV distinct-count sketch per event_type
    (operators/sketches.py::kmv_distinct): keep the 64 smallest md5-derived
    48-bit hashes, estimate distinct = 63/u_64. Unlike Spark's HLL
    (hll_sketch_agg — tested separately, estimates implementation-defined),
    KMV is deterministic given the hash, so this approximate operator gets
    an EXACT cross-engine oracle — a falsifiable sketch. Mergeable across
    shards (union → re-min, tests/test_sketches.py); bounded memory at any
    cardinality. Reference A6 distinct-days (process_adcp.py:1246-1252) is
    the exact twin."""
    from .operators.sketches import kmv_distinct

    return kmv_distinct(events(spark, sf_dir), "user_id", ["event_type"], k=64)


@q(
    "q_hll_distinct",
    """
    WITH h AS (
      SELECT event_type,
             ('0x' || substr(md5(user_id::VARCHAR), 1, 12))::BIGINT AS h
      FROM events WHERE user_id IS NOT NULL
    ),
    b AS (
      SELECT event_type, h >> 40 AS idx, h % 1099511627776 AS w FROM h
    ),
    r AS (
      SELECT event_type, idx,
             max(CASE WHEN w = 0 THEN 41 ELSE 41 - length(bin(w)) END) AS m_rho
      FROM b GROUP BY event_type, idx
    ),
    s AS (
      SELECT event_type, sum(power(2.0, -m_rho)) AS s_nz, count(*) AS nz
      FROM r GROUP BY event_type
    )
    SELECT event_type,
           (256 - nz)::BIGINT AS n_zero_regs,
           round(CASE WHEN ((0.7213 / (1 + 1.079 / 256.0)) * 256.0) * 256.0
                             / (s_nz + (256 - nz)) <= 640.0
                       AND nz < 256
                      THEN 256.0 * ln(256.0 / (256 - nz))
                      ELSE ((0.7213 / (1 + 1.079 / 256.0)) * 256.0) * 256.0
                             / (s_nz + (256 - nz)) END, 2) AS est_distinct
    FROM s
    """,
)
def q_hll_distinct(spark, sf_dir):
    """From-scratch HyperLogLog distinct-count per event_type
    (operators/sketches.py::hll_registers/hll_estimate): p=8 → 256
    registers from the top bits of the md5-derived 48-bit hash, register =
    max leading-zero rank of the 40-bit suffix, Flajolet-2007 estimator
    with the linear-counting small-range correction. Every arithmetic step
    (exact powers of two summing inside 52 mantissa bits, shared md5 hash)
    is engine-portable, so this APPROXIMATE sketch has an EXACT DuckDB
    oracle — same falsifiability bar as q_kmv_distinct, completing the
    sketch family (KMV, Count-Min, HLL). Registers merge by elementwise
    max (hll_merge — the 100 TB shard-combine path, law-tested in
    tests/test_sketches.py). Reference A6 distinct-days
    (process_adcp.py:1246-1252) is the exact-count twin."""
    from .operators.sketches import hll_estimate, hll_registers

    regs = hll_registers(events(spark, sf_dir), "user_id", ["event_type"], p=8)
    return hll_estimate(regs, ["event_type"], p=8)


@q(
    "txt_winnow",
    """
    WITH t AS (SELECT doc_id, {tok} AS tk FROM documents),
    g AS (
      SELECT doc_id, s.n AS pos, len(tk) - 3 AS n_grams,
             ('0x' || substr(md5(array_to_string(tk[s.n:s.n+3], ' ')), 1, 12))::BIGINT AS h
      FROM t, LATERAL (SELECT unnest(generate_series(1, greatest(len(tk) - 3, 0))) AS n) s
    ),
    w AS (
      SELECT doc_id, pos, n_grams,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fp
      FROM g
    )
    SELECT DISTINCT doc_id, fp FROM w WHERE pos <= n_grams - 4
    """,
)
def txt_winnow(spark, sf_dir):
    """Winnowing fingerprints (MOSS; Schleimer et al., SIGMOD 2003) over
    4-token shingles with window 5: any shared run of ≥ 8 tokens between
    two documents is guaranteed a shared fingerprint — the
    position-robust excerpt-level contamination detector, complementing
    dd_contamination's exact 8-gram join. All JVM expressions
    (operators/text.py::winnow_fingerprints); shuffle = one per-doc
    window pass over shingle hashes."""
    from .operators.text import winnow_fingerprints

    return winnow_fingerprints(table(spark, sf_dir, "documents"), k=4, window=5)


@q(
    "udtf_sentences",
    """
    SELECT doc_id, s.n - 1 AS sent_id, trim(a[s.n]) AS sentence
    FROM (SELECT doc_id, regexp_split_to_array(text, '[.!?]+\\s+') AS a FROM documents) d,
         LATERAL (SELECT unnest(generate_series(1, len(a))) AS n) s
    WHERE length(trim(a[s.n])) > 0
    """,
)
def udtf_sentences(spark, sf_dir):
    """Python UDTF surface (SURVEY §2.9; Spark 4 ``@udtf``): one input doc
    row → N sentence rows via LATERAL, the table-function shape the
    reference has no equivalent for (its pandas code reshapes in-memory).
    The split regex sticks to the Java/RE2/Python-identical subset so the
    DuckDB oracle is exact. Arrow-optimized UDTF eval
    (spark.sql.execution.pythonUDTF.arrow.enabled — set in
    session.py) keeps the Python boundary batched; for bulk production use
    the equivalent pure-JVM split+posexplode is the fast path — this entry
    exists to keep the UDTF machinery itself under oracle test."""
    from .functions.udtfs import register_udtfs

    register_udtfs(spark)
    table(spark, sf_dir, "documents").createOrReplaceTempView("__docs_udtf")
    return spark.sql(
        "SELECT s.doc_id, s.sent_id, s.sentence "
        "FROM __docs_udtf, LATERAL split_sentences(doc_id, text) s"
    )


@q(
    "q_tumbling_ohlc",
    """
    WITH b AS (
      SELECT event_type, epoch_us(ts) // 600000000 AS bucket, value,
             epoch_us(ts) AS ts_us, event_id
      FROM events
    ),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY event_type, bucket ORDER BY ts_us, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, bucket ORDER BY ts_us DESC, event_id DESC) AS rn_d
      FROM b
    )
    SELECT event_type, bucket,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high, min(value) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           count(*) AS volume
    FROM r GROUP BY event_type, bucket
    """,
)
def q_tumbling_ohlc(spark, sf_dir):
    """OHLC downsampling: 10-minute tumbling bars per event_type via
    ``min_by``/``max_by`` over a (ts, event_id) ordering struct — open and
    close come out of the SAME single-shuffle aggregate as high/low/volume;
    no window pass, no self-join, map-side partials everywhere. The
    (ts_us, event_id) tiebreak makes first/last deterministic (the oracle
    reproduces it with two row_numbers). This is the reference's per-bin
    first/last pattern (A8, min_by/max_by) composed with time bucketing."""
    ev = events(spark, sf_dir)
    key = F.struct(F.col("ts_us"), F.col("event_id"))
    return (
        ev.groupBy("event_type", F.expr("ts_us div 600000000").alias("bucket"))
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count("*").alias("volume"),
        )
    )


@q(
    "q_decayed_agg",
    """
    WITH m AS (SELECT max(epoch_us(ts)) AS tmax FROM events),
    w AS (
      SELECT event_type, value,
             round(exp(-((tmax - epoch_us(ts)) / 604800000000.0)), 9) AS w
      FROM events CROSS JOIN m
    )
    SELECT event_type,
           round(sum(value * w), 6) AS decayed_sum,
           round(sum(w), 6) AS total_w,
           round(sum(value * w) / sum(w), 6) AS decayed_mean
    FROM w GROUP BY event_type
    """,
)
def q_decayed_agg(spark, sf_dir):
    """Exponential time-decay aggregation (half-life feature-store shape):
    weight = exp(-Δt/τ), τ = 7 days, anchored at the stream's max
    timestamp. The anchor is a 1-row agg cross-joined in (broadcast NL
    join of a scalar — the J5 pattern, no collect in the plan); weights
    round to 9 dp so both engines sum identical doubles and the 6-dp
    output is summation-order-proof. One shuffle, map-side partials."""
    ev = events(spark, sf_dir)
    tmax = ev.agg(F.max("ts_us").alias("tmax"))
    w = F.round(F.exp(-((F.col("tmax") - F.col("ts_us")) / F.lit(604800000000.0))), 9)
    return (
        ev.crossJoin(F.broadcast(tmax))
        .withColumn("w", w)
        .groupBy("event_type")
        .agg(
            r6(F.sum(F.col("value") * F.col("w"))).alias("decayed_sum"),
            r6(F.sum("w")).alias("total_w"),
            r6(F.sum(F.col("value") * F.col("w")) / F.sum("w")).alias("decayed_mean"),
        )
    )


@q(
    "dd_winnow_containment",
    """
    WITH t AS (SELECT doc_id, {tok} AS tk FROM documents),
    g AS (
      SELECT doc_id, s.n AS pos, len(tk) - 3 AS n_grams,
             ('0x' || substr(md5(array_to_string(tk[s.n:s.n+3], ' ')), 1, 12))::BIGINT AS h
      FROM t, LATERAL (SELECT unnest(generate_series(1, greatest(len(tk) - 3, 0))) AS n) s
    ),
    w AS (
      SELECT doc_id, pos, n_grams,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fp
      FROM g
    ),
    fps AS (SELECT DISTINCT doc_id, fp FROM w WHERE pos <= n_grams - 4),
    rare AS (
      SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 20
    ),
    fpr AS (SELECT doc_id, fp FROM fps JOIN rare USING (fp)),
    sizes AS (SELECT doc_id, count(*) AS n_fp FROM fps GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS shared
      FROM fpr a JOIN fpr b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc1, doc2, shared,
           round(shared / least(s1.n_fp, s2.n_fp)::DOUBLE, 6) AS containment
    FROM pairs
      JOIN sizes s1 ON s1.doc_id = doc1
      JOIN sizes s2 ON s2.doc_id = doc2
    WHERE shared >= 3
    """,
)
def dd_winnow_containment(spark, sf_dir):
    """Excerpt-containment scoring over winnowing fingerprints: doc pairs
    sharing ≥ 3 selected fingerprints, scored shared/min(|fp|) — the MOSS
    aggregation step, catching partial-overlap/quotation duplicates that
    whole-doc MinHash misses (a copied paragraph in an otherwise-unique
    doc still pairs). Scale posture: the pair join is keyed on fingerprint
    with a document-frequency cap (fp in ≤ 20 docs) exactly like the
    LSH-band df bound — a boilerplate fingerprint shared by a million
    docs is dropped, not joined, so pair volume is Σ df² over RARE
    fingerprints only."""
    from .operators.text import winnow_fingerprints

    # the fingerprint set feeds three consumers (df-cap, pair join, sizes) —
    # cache the staging boundary so winnowing runs once, not three times
    fps = winnow_fingerprints(table(spark, sf_dir, "documents"), k=4, window=5).cache()
    rare = fps.groupBy("fp").agg(F.count("*").alias("df")).filter(F.col("df") <= 20).select("fp")
    fpr = fps.join(rare, "fp")
    sizes = fps.groupBy("doc_id").agg(F.count("*").alias("n_fp"))
    a = fpr.select(F.col("doc_id").alias("doc1"), "fp")
    b = fpr.select(F.col("doc_id").alias("doc2"), "fp")
    pairs = (
        a.join(b, "fp")
        .filter(F.col("doc1") < F.col("doc2"))
        .groupBy("doc1", "doc2")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= 3)
    )
    s1 = sizes.select(F.col("doc_id").alias("doc1"), F.col("n_fp").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("doc2"), F.col("n_fp").alias("n2"))
    return (
        pairs.join(s1, "doc1")
        .join(s2, "doc2")
        .select(
            "doc1",
            "doc2",
            "shared",
            r6(F.col("shared") / F.least("n1", "n2").cast("double")).alias("containment"),
        )
    )


@q(
    "q_curriculum_order",
    """
    SELECT doc_id, n_chars,
           row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rank
    FROM documents
    """,
)
def q_curriculum_order(spark, sf_dir):
    """Curriculum ordering: exact global rank of every document under a
    quality ordering (here n_chars DESC with doc_id tiebreak) WITHOUT the
    single-partition global window — operators/rank.py::global_rank runs a
    range repartition + per-partition local row_number + tiny offset
    broadcast, so the same plan ranks a 100 TB corpus. The oracle is the
    naive global row_number (identical result by construction: rank
    depends only on the total order)."""
    from .operators.rank import global_rank

    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return global_rank(docs, [F.col("n_chars").desc(), F.col("doc_id")], "rank")


@q(
    "q_bm25_search",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOK_SQL}) AS tok FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
      SELECT count(*) AS n_docs, avg(dl)::DOUBLE AS avgdl
      FROM dl
    ),
    tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM toks
      WHERE tok IN ('spark', 'data', 'window') GROUP BY doc_id, tok
    ),
    dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok)
    SELECT doc_id,
           round(sum(
             ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
             * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
           ), 6) AS bm25
    FROM tf JOIN dfreq USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats
    GROUP BY doc_id
    """,
)
def q_bm25_search(spark, sf_dir):
    """BM25 ranked retrieval (k1=1.2, b=0.75) for a 3-term query over the
    token stream: Robertson/Spärck-Jones idf × length-normalized tf. Plan:
    the term filter prunes the exploded stream BEFORE any shuffle (only
    matching-term rows move), per-term df and the corpus (N, avgdl)
    scalars are dim-sized broadcasts — the standard serving decomposition
    of a BM25 index build, no UDFs, exact oracle."""
    from .operators.dedup import tokens as tok_fn

    terms = ["spark", "data", "window"]
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tok_fn(F.col("text"))).alias("tok"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").cast("double").alias("avgdl")
    )
    tf = (
        toks.filter(F.col("tok").isin(terms))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + F.lit(1.0)
    )
    score = idf * F.col("tf") * F.lit(2.2) / (
        F.col("tf") + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(r6(F.sum(score)).alias("bm25"))
    )


@q(
    "q_tpch_q4",
    """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4(spark, sf_dir):
    """TPC-H Q4 (order-priority checking) on the available columns: orders
    in a quarter with ≥ 1 slow lineitem (shipped > 60 days after the order
    date — the snapshot has no commit/receipt dates; same correlated-EXISTS
    shape). Spark plan: the correlated EXISTS decorrelates to a left-semi
    join on l_orderkey with the date comparison as join condition — no
    per-row subquery execution."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@q(
    "q_tpch_q6",
    """
    SELECT round(sum(l_extendedprice * l_discount), 6) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6 (forecast revenue change): pure scan-side conjunctive
    range predicates + single global aggregate — every filter lands in
    PushedFilters, the aggregate is map-side partial + 1-row final; the
    canonical 'is your scan path efficient' probe."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        r6(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"),
        F.count("*").alias("n_items"),
    )


@q(
    "q_tpch_q12",
    """
    SELECT year(l_shipdate) AS ship_year,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1999-01-01'
    GROUP BY 1
    """,
)
def q_tpch_q12(spark, sf_dir):
    """TPC-H Q12 (shipping-priority split; ship-year stands in for the
    absent l_shipmode): fact⋈fact equi-join with conditional-count
    aggregation — both CASE branches fold into ONE partial aggregate."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1999-01-01")
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@q(
    "q_tpch_q16",
    """
    SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (5, 10, 15, 20)
    GROUP BY p_brand, p_type
    """,
)
def q_tpch_q16(spark, sf_dir):
    """TPC-H Q16 (supplier-count by part attributes; lineitem stands in
    for the absent partsupp): negated + IN-list predicates pushed to the
    part scan, distinct-count via Spark's two-stage expand-aggregate
    (partial distinct per mapper, exact merge) — no collect, no
    dropDuplicates shuffle beyond the agg's own."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(5, 10, 15, 20)
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@q(
    "q_first_touch",
    """
    WITH firsts AS (
      SELECT user_id, event_type AS first_touch FROM (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id) AS rn
        FROM events) WHERE rn = 1
    ),
    conv AS (
      SELECT user_id, count(*) AS n_purchases,
             round(sum(value), 6) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT first_touch, count(*) AS n_users,
           sum(coalesce(n_purchases, 0))::BIGINT AS purchases,
           round(sum(coalesce(purchase_value, 0.0)), 6) AS revenue
    FROM firsts LEFT JOIN conv USING (user_id)
    GROUP BY first_touch
    """,
)
def q_first_touch(spark, sf_dir):
    """First-touch attribution: each user's earliest event (deterministic
    (ts, event_id) tiebreak) is the acquisition channel; purchases and
    revenue roll up per channel. Two map-side-combined aggregates keyed by
    user_id + one channel-keyed rollup — min_by pulls the first touch out
    of the same shuffle that counts, no window pass over the event
    stream."""
    ev = events(spark, sf_dir)
    key = F.struct(F.col("ts_us"), F.col("event_id"))
    firsts = ev.groupBy("user_id").agg(F.min_by("event_type", key).alias("first_touch"))
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_purchases"), r6(F.sum("value")).alias("purchase_value"))
    )
    return (
        firsts.join(conv, "user_id", "left")
        .groupBy("first_touch")
        .agg(
            F.count("*").alias("n_users"),
            F.sum(F.coalesce(F.col("n_purchases"), F.lit(0))).alias("purchases"),
            r6(F.sum(F.coalesce(F.col("purchase_value"), F.lit(0.0)))).alias("revenue"),
        )
    )


def _recall_report_oracle_sql() -> str:
    """Exact oracle for the recall report: each leg is the SAME replay
    SQL that gates its own query (brute truth, banded-LSH, IVF-with-
    trained-quantizer, PQ-ADC), nested as subqueries (DuckDB allows WITH
    inside a derived table); recall = |top5 ∩ truth| / |truth| rounded
    like the engine. Upgraded from rows-only in round 5 — every
    approximate path is now deterministic + portable, so the report is
    an exact-hash gate, not just a standing measurement."""
    return f"""
    WITH truth AS MATERIALIZED (
      SELECT query_id, nbr_id FROM ({_brute_oracle_sql()}) tb
    ),
    lsh5 AS MATERIALIZED (SELECT query_id, nbr_id FROM ({_lsh_oracle_sql()}) tl),
    ivf5 AS MATERIALIZED (SELECT query_id, nbr_id FROM ({_ivf_oracle_sql()}) ti),
    pq5 AS MATERIALIZED (SELECT query_id, nbr_id FROM ({_pq_oracle_sql()}) tp),
    nt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM truth)
    SELECT 'lsh_banded' AS method,
           round((SELECT count(*) FROM lsh5 JOIN truth USING (query_id, nbr_id)) / (SELECT n FROM nt), 6) AS recall_at_5
    UNION ALL
    SELECT 'ivf_nprobe6',
           round((SELECT count(*) FROM ivf5 JOIN truth USING (query_id, nbr_id)) / (SELECT n FROM nt), 6)
    UNION ALL
    SELECT 'pq_adc',
           round((SELECT count(*) FROM pq5 JOIN truth USING (query_id, nbr_id)) / (SELECT n FROM nt), 6)
    """


@q("ann_recall_report", _recall_report_oracle_sql())
def ann_recall_report(spark, sf_dir):
    """Recall@5 of every approximate ANN path (banded-LSH, IVF nprobe=6,
    PQ-ADC) against the exact brute-force top-5, computed IN-ENGINE as a
    DataFrame — one row per method. An approximate operator without a
    measured recall is unfalsifiable (round-1 verdict); this makes the
    measurement a standing driver-recorded artifact, not just a pytest —
    and since round 5 every leg is deterministic + SQL-replayable
    (trained IVF/PQ quantizers included), it is an EXACT-oracle gate.
    The overlap join is (query_id, nbr_id)-keyed; truth and approx sets
    are both |queries|×5, so the whole check is dim-sized."""
    from .operators.similarity import brute_force_topk, ivf_topk, lsh_topk, pq_topk

    e = table(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = brute_force_topk(e, qs, k=5).select("query_id", "nbr_id").cache()
    n_truth = truth.count()

    def rec(df, method):
        hits = df.select("query_id", "nbr_id").join(truth, ["query_id", "nbr_id"]).count()
        return (method, round(hits / n_truth, 6))

    rows = [
        rec(lsh_topk(e, qs, dim=64, k=5), "lsh_banded"),
        rec(ivf_topk(e, qs, n_cells=8, nprobe=6, k=5), "ivf_nprobe6"),
        rec(pq_topk(e, qs, n_sub=16, n_cent=16, k=5, shortlist=100), "pq_adc"),
    ]
    return spark.createDataFrame(rows, "method string, recall_at_5 double")


@q(
    "q_tpch_q7",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_q7(spark, sf_dir):
    """TPC-H Q7 (volume shipping): bidirectional nation-pair trade flow —
    the same dim (nation) joins TWICE under different roles, with a
    cross-role disjunctive filter evaluated post-join. Both nation copies
    broadcast; the (supp,cust) pair predicate cannot push to either scan
    alone, the per-role IN('NATION_1','NATION_2') residuals can (and do)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(r6(F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))).alias("revenue"))
    )


@q(
    "q_tpch_q8",
    """
    SELECT year(o_orderdate) AS o_year,
           round(sum(CASE WHEN n1.n_name = 'NATION_3'
                          THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN part     ON p_partkey = l_partkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = n2.n_regionkey
    WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    GROUP BY 1
    """,
)
def q_tpch_q8(spark, sf_dir):
    """TPC-H Q8 (national market share): 8-table snowflake where the share
    numerator is a conditional slice of the SAME aggregate — one pass, no
    self-join; region filter prunes through the customer-side nation role
    only (the supplier-side nation stays unfiltered for the CASE)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    net = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n2_region"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            r6(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", net).otherwise(F.lit(0.0)))
                / F.sum(net)
            ).alias("mkt_share")
        )
    )


@q(
    "q_tpch_q13",
    """
    SELECT c_count, count(*)::BIGINT AS custdist FROM (
      SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) GROUP BY c_count
    """,
)
def q_tpch_q13(spark, sf_dir):
    """TPC-H Q13 (customer distribution): LEFT join with a non-key join
    condition (the filter belongs to the JOIN, not a WHERE — moving it
    would drop zero-order customers), two-level aggregate; count(col)
    null-skipping keeps the zero bucket."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT").select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@q(
    "q_tpch_q15",
    """
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 6) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q_tpch_q15(spark, sf_dir):
    """TPC-H Q15 (top supplier): aggregate → scalar-max subquery → filter.
    The revenue CTE is computed once and cached; the max is a 1-row
    broadcast joined back (J5 pattern) — no second lineitem scan, no
    collect. Ties (if any) return every top supplier, same as the spec."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    s = table(spark, sf_dir, "supplier")
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(r6(F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))).alias("total_revenue"))
        .cache()
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        s.join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@q(
    "q_tpch_q17",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 6) AS avg_yearly,
           count(*)::BIGINT AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#5'
      AND l_quantity < (
        SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
)
def q_tpch_q17(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue): correlated per-part
    average decorrelated into a groupBy-aggregate broadcast back onto the
    fact — each part's 0.2·avg threshold computed once, not per row; the
    brand filter prunes the part side before both joins."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5").select("p_partkey")
    thresh = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(thresh), F.col("t_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            r6(F.sum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


# The driver snapshot has no partsupp table; Q2/Q9/Q11/Q20 run over a
# DERIVED supply table — distinct (part, supplier) pairs from lineitem with
# min unit price as supplycost and total shipped quantity as availqty.
# Deterministic, so the shapes stay exactly oracle-checkable. supplycost
# uses tie-proof r6p: price/qty lands on the decimal grid, where Spark's
# HALF_UP and DuckDB's rounding disagree on exact .5 ties.
_PS_SQL = """
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             floor(min(l_extendedprice / l_quantity) * 1000000.0 + 0.5) / 1000000.0
               AS ps_supplycost,
             round(sum(l_quantity), 6) AS ps_availqty
      FROM lineitem GROUP BY 1, 2
"""


def _derived_ps(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(
        r6p(F.min(F.col("l_extendedprice") / F.col("l_quantity"))).alias("ps_supplycost"),
        r6(F.sum("l_quantity")).alias("ps_availqty"),
    )


@q(
    "q_tpch_q2",
    f"""
    WITH ps AS ({_PS_SQL}),
    eu AS (
      SELECT ps_partkey, ps_suppkey, ps_supplycost, s_acctbal, s_name, n_name
      FROM ps
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        JOIN region   ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'
    ),
    mincost AS (SELECT ps_partkey, min(ps_supplycost) AS mc FROM eu GROUP BY ps_partkey)
    SELECT s_acctbal, s_name, n_name, p_partkey, ps_supplycost
    FROM part
      JOIN eu ON ps_partkey = p_partkey
      JOIN mincost ON mincost.ps_partkey = p_partkey AND ps_supplycost = mc
    WHERE p_size = 15 AND p_type = 'LARGE'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 20
    """,
)
def q_tpch_q2(spark, sf_dir):
    """TPC-H Q2 (minimum-cost supplier) over the derived supply table: the
    correlated min-subquery decorrelates to a per-part min aggregate
    joined back (computed on the region-filtered slice ONCE — not per
    part-row); supplier/nation/region broadcast; top-20 is a distributed
    TakeOrdered with a (acctbal, nation, supplier, part) total order."""
    ps = _derived_ps(spark, sf_dir)
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    eu = (
        ps.join(F.broadcast(s), F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("ps_partkey", "ps_supplycost", "s_acctbal", "s_name", "n_name")
    )
    mincost = eu.groupBy(F.col("ps_partkey").alias("m_partkey")).agg(
        F.min("ps_supplycost").alias("mc")
    )
    return (
        p.join(eu, F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            mincost,
            (F.col("m_partkey") == F.col("p_partkey")) & (F.col("ps_supplycost") == F.col("mc")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "ps_supplycost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


@q(
    "q_tpch_q9",
    f"""
    WITH ps AS ({_PS_SQL})
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           round(sum(floor((l_extendedprice * (1 - l_discount)
                            - ps_supplycost * l_quantity) * 1000000.0 + 0.5)
                     / 1000000.0), 6) AS profit
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      JOIN part     ON p_partkey = l_partkey
      JOIN ps       ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    WHERE p_type = 'STANDARD'
    GROUP BY 1, 2
    """,
)
def q_tpch_q9(spark, sf_dir):
    """TPC-H Q9 (product-type profit) over the derived supply table: the
    profit term has CANCELLATION (revenue − cost), so each term is rounded
    to 6 dp with the tie-proof floor-based r6p BEFORE the sum (money-grid
    products land on exact .5 ties where HALF_UP and HALF_EVEN disagree —
    measured 3.2e-5 drift with plain round) — both engines then add
    identical doubles and the outer rounding only removes
    summation-order noise. The ps join is
    a composite-key (part, supp) shuffle join against the fact — the one
    join here that stays big-big at 100 TB; bucketing both sides on
    l_partkey would co-locate it (tests/test_bucketing.py shows the
    layout)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD").select("p_partkey")
    ps = _derived_ps(spark, sf_dir)
    term = r6p(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        - F.col("ps_supplycost") * F.col("l_quantity")
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            ps,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(r6(F.sum(term)).alias("profit"))
    )


@q(
    "q_tpch_q11",
    f"""
    WITH ps AS ({_PS_SQL}),
    j AS (
      SELECT ps_partkey, ps_supplycost * ps_availqty AS val
      FROM ps JOIN supplier ON s_suppkey = ps_suppkey
              JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_5'
    )
    SELECT ps_partkey, round(sum(val), 6) AS value
    FROM j GROUP BY ps_partkey
    HAVING sum(val) > (SELECT sum(val) * 0.001 FROM j)
    """,
)
def q_tpch_q11(spark, sf_dir):
    """TPC-H Q11 (important stock) over the derived supply table: per-part
    value filtered against a fraction of the GLOBAL value — the scalar
    total is a 1-row broadcast from the same cached slice, so the data is
    scanned once, not once per side of the HAVING."""
    ps = _derived_ps(spark, sf_dir)
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    j = (
        ps.join(F.broadcast(s), F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("ps_partkey", (F.col("ps_supplycost") * F.col("ps_availqty")).alias("val"))
        .cache()
    )
    total = j.agg((F.sum("val") * F.lit(0.001)).alias("thresh"))
    return (
        j.groupBy("ps_partkey")
        .agg(F.sum("val").alias("raw_value"))
        .join(F.broadcast(total))
        .filter(F.col("raw_value") > F.col("thresh"))
        .select("ps_partkey", r6(F.col("raw_value")).alias("value"))
    )


@q(
    "q_tpch_q20",
    f"""
    WITH ps AS ({_PS_SQL}),
    shipped AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty97
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1, 2
    )
    SELECT DISTINCT s_suppkey, s_name
    FROM supplier
      JOIN ps ON ps_suppkey = s_suppkey
      JOIN part ON p_partkey = ps_partkey AND p_type = 'PROMO'
      LEFT JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
    WHERE ps_availqty > 0.5 * coalesce(qty97, 0)
    """,
)
def q_tpch_q20(spark, sf_dir):
    """TPC-H Q20 (excess-stock suppliers) over the derived supply table:
    availability vs half the year's shipments per (part, supplier) — the
    nested IN-subquery chain decorrelates to aggregate + left join +
    distinct project; part filter broadcasts into the supply slice."""
    ps = _derived_ps(spark, sf_dir)
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    shipped = li.groupBy(
        F.col("l_partkey").alias("sh_partkey"), F.col("l_suppkey").alias("sh_suppkey")
    ).agg(F.sum("l_quantity").alias("qty97"))
    return (
        ps.join(F.broadcast(s), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("ps_partkey"))
        .join(
            shipped,
            (F.col("sh_partkey") == F.col("ps_partkey"))
            & (F.col("sh_suppkey") == F.col("ps_suppkey")),
            "left",
        )
        .filter(F.col("ps_availqty") > F.lit(0.5) * F.coalesce(F.col("qty97"), F.lit(0.0)))
        .select("s_suppkey", "s_name")
        .distinct()
    )


@q(
    "q_tpch_q21",
    """
    WITH l AS (
      SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    w AS (
      SELECT DISTINCT l1.l_orderkey, l1.l_suppkey FROM l l1
      WHERE l1.l_shipdate > l1.o_orderdate + INTERVAL 80 DAY
        AND EXISTS (SELECT 1 FROM l l2
                    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM l l3
                        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > l3.o_orderdate + INTERVAL 80 DAY)
    )
    SELECT s_name, count(*)::BIGINT AS numwait
    FROM w JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY s_name
    """,
)
def q_tpch_q21(spark, sf_dir):
    """TPC-H Q21 (suppliers who kept orders waiting; lateness = shipped
    > 80 days after order date, standing in for the absent receipt/commit
    dates): the EXISTS + NOT-EXISTS pair over the same fact decorrelates
    to ONE per-order aggregate — n_suppliers and n_late_suppliers — and
    the qualifying pairs are late rows where n_suppliers > 1 AND
    n_late_suppliers = 1. One shuffle on l_orderkey instead of three
    correlated rescans; the oracle keeps the textbook EXISTS formulation,
    so the driver check proves the decorrelation equivalence."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    l = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).withColumn(
        "late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 80 DAY")
    )
    # two-stage aggregate instead of count_distinct×2: the distinct pairs
    # reduce first, then a plain count — same answer, same local wall time
    # (overhead-bound at these SFs), but WITHOUT the Expand operator that
    # duplicates every fact row once per distinct-aggregate at scale
    per_pair = l.groupBy("l_orderkey", "l_suppkey").agg(F.max("late").alias("late"))
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum(F.col("late").cast("int")).alias("n_late_supp"),
    )
    w = (
        per_pair.filter(F.col("late"))
        .join(per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)), "l_orderkey")
        .select("l_orderkey", "l_suppkey")
    )
    return (
        w.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@q(
    "q_tpch_q22",
    """
    SELECT c_mktsegment, count(*)::BIGINT AS numcust,
           round(sum(c_acctbal), 6) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
)
def q_tpch_q22(spark, sf_dir):
    """TPC-H Q22 (global-sales opportunity; market segment stands in for
    the absent phone country code, and 'no URGENT orders' for 'no orders'
    — every synthetic customer has orders, which would make the textbook
    predicate vacuous): scalar-avg broadcast + broadcast LEFT ANTI join
    against the urgent-order custkeys, then a segment rollup."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(F.broadcast(o), F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("numcust"), r6(F.sum("c_acctbal")).alias("totacctbal"))
    )


@q(
    "q_countmin_tokens",
    f"""
    WITH toks AS (SELECT unnest({{tok}}) AS tok FROM documents),
    rs AS (SELECT unnest(generate_series(0, 3)) AS r),
    cms AS (
      SELECT r, ('0x' || substr(md5(r::VARCHAR || ':' || tok), 1, 12))::BIGINT % 256 AS c,
             count(*) AS cnt
      FROM toks CROSS JOIN rs GROUP BY 1, 2
    ),
    true_counts AS (SELECT tok, count(*)::BIGINT AS true_count FROM toks GROUP BY tok),
    top AS (SELECT tok, true_count FROM true_counts ORDER BY true_count DESC, tok LIMIT 20),
    probes AS (
      SELECT tok, true_count, r,
             ('0x' || substr(md5(r::VARCHAR || ':' || tok), 1, 12))::BIGINT % 256 AS c
      FROM top CROSS JOIN rs
    )
    SELECT tok, true_count, min(coalesce(cnt, 0))::BIGINT AS est_count
    FROM probes LEFT JOIN cms USING (r, c) GROUP BY 1, 2
    """,
)
def q_countmin_tokens(spark, sf_dir):
    """Count-Min sketch (operators/sketches.py::countmin_table/estimate):
    4×256 counters over the corpus token stream, probed for the 20 most
    frequent tokens next to their true counts. Like KMV, the md5 hashing
    makes this approximate structure fully deterministic — the oracle
    rebuilds the identical counter table, and the CMS guarantee
    (est ≥ true, overshoot bounded by collisions) is visible in the
    output rows. The sketch is a constant-size, merge-by-addition partial
    aggregate — the heavy-hitter primitive for unbounded streams."""
    from .operators.dedup import tokens as tok_fn
    from .operators.sketches import countmin_estimate, countmin_table

    toks = table(spark, sf_dir, "documents").select(
        F.explode(tok_fn(F.col("text"))).alias("tok")
    )
    cms = countmin_table(toks, "tok", depth=4, width=256)
    top = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("true_count"))
        .orderBy(F.col("true_count").desc(), F.col("tok"))
        .limit(20)
    )
    est = countmin_estimate(cms, top.select("tok"), "tok", depth=4, width=256)
    return top.join(est, "tok").select("tok", "true_count", "est_count")


@q(
    "q_dq_checks",
    """
    WITH wide AS (
      SELECT
        sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS nn,
        sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') OR o_orderstatus IS NULL
                 THEN 1 ELSE 0 END)::BIGINT AS av,
        sum(CASE WHEN NOT (o_totalprice BETWEEN 0 AND 1000000) OR o_totalprice IS NULL
                 THEN 1 ELSE 0 END)::BIGINT AS rng
      FROM orders
    ),
    uniq AS (
      SELECT sum(n - 1)::BIGINT AS u FROM (
        SELECT count(*) AS n FROM orders GROUP BY o_orderkey)
    ),
    refi AS (
      SELECT count(*)::BIGINT AS r FROM orders
      WHERE o_custkey IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
    )
    SELECT 'not_null:o_custkey' AS "check", nn AS n_violations FROM wide
    UNION ALL SELECT 'accepted_values:o_orderstatus', av FROM wide
    UNION ALL SELECT 'in_range:o_totalprice', rng FROM wide
    UNION ALL SELECT 'unique:o_orderkey', u FROM uniq
    UNION ALL SELECT 'referential:o_custkey->c_custkey', r FROM refi
    """,
)
def q_dq_checks(spark, sf_dir):
    """Declarative data-quality suite (operators/quality.py — the
    dbt-tests/Deequ shape): not-null, accepted-values, range, uniqueness,
    and referential integrity over orders, reported as one
    (check, n_violations) table. The column-predicate checks compile into
    ONE conditional-sum aggregate (one scan for the whole suite — N
    separate filter().count() actions would scan N times); uniqueness is
    a keyed aggregate and the FK check a broadcast anti-join count."""
    from .operators.quality import (
        accepted_values,
        in_range,
        not_null,
        referential_check,
        run_checks,
        unique_check,
    )

    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    scans = run_checks(
        o,
        [
            not_null("o_custkey"),
            accepted_values("o_orderstatus", ["O", "F", "P"]),
            in_range("o_totalprice", 0, 1_000_000),
        ],
    )
    return scans.unionAll(unique_check(o, ["o_orderkey"])).unionAll(
        referential_check(o, "o_custkey", c, "c_custkey")
    )


@q(
    "q_label_centroids",
    """
    SELECT label, s.n - 1 AS dim,
           round(avg(embedding[s.n]::DOUBLE), 6) AS centroid,
           round(stddev_pop(embedding[s.n]::DOUBLE), 6) AS spread,
           count(*)::BIGINT AS n_vecs
    FROM embeddings,
         LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS n) s
    GROUP BY label, s.n
    """,
)
def q_label_centroids(spark, sf_dir):
    """Per-label embedding centroid + dispersion, per dimension — the
    cluster-quality report behind SemDeDup/IVF tuning. posexplode turns
    the vector column into (label, dim, value) rows and ONE map-side-
    combined aggregate produces mean and population-stddev for all
    (label, dim) cells; no UDF, no driver collect. Shuffle volume is
    |labels|×|dims| partial states per task regardless of row count —
    the same plan summarizes a 100 TB embedding store."""
    e = table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(
            r6(F.avg(F.col("v").cast("double"))).alias("centroid"),
            r6(F.stddev_pop(F.col("v").cast("double"))).alias("spread"),
            F.count("*").alias("n_vecs"),
        )
    )


@q(
    "q_corpus_shuffle",
    """
    SELECT doc_id,
           row_number() OVER (ORDER BY md5('ep1:' || doc_id::VARCHAR), doc_id) AS shuffle_pos
    FROM documents
    """,
)
def q_corpus_shuffle(spark, sf_dir):
    """Deterministic corpus shuffle: global training order = rank under a
    salted hash of the id — reproducible across runs/engines (seed = the
    salt string, here epoch 'ep1'), with none of the
    single-partition-window trap (operators/rank.py::global_rank). Change
    the salt per epoch for fresh orders; ranks stay exact, so resuming a
    run mid-epoch is a WHERE on shuffle_pos."""
    from .operators.rank import global_rank

    docs = table(spark, sf_dir, "documents").select("doc_id")
    key = F.md5(F.concat(F.lit("ep1:"), F.col("doc_id").cast("string")))
    return global_rank(
        docs.withColumn("__k", key), [F.col("__k"), F.col("doc_id")], "shuffle_pos"
    ).select("doc_id", "shuffle_pos")


@q(
    "q_hybrid_rrf",
    f"""
    WITH base AS (
      SELECT vec_id AS doc_id, list_transform(embedding, x -> x::DOUBLE) AS ed
      FROM embeddings WHERE vec_id < 500
    ),
    qv AS (SELECT ed AS q FROM base WHERE doc_id = 0),
    dense AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY
               list_dot_product(ed, q)
               / (sqrt(list_dot_product(ed, ed)) * sqrt(list_dot_product(q, q)))
               DESC, doc_id) AS r_dense
      FROM base, qv
    ),
    toks AS (SELECT doc_id, unnest({{tok}}) AS tok FROM documents),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM toks
      WHERE tok IN ('spark', 'data', 'window') GROUP BY doc_id, tok
    ),
    dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
    bm25 AS (
      SELECT doc_id,
             round(sum(
               ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
               * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
             ), 6) AS bm25
      FROM tf JOIN dfreq USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats
      GROUP BY doc_id
    ),
    sparse AS (
      SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_sparse
      FROM bm25
    )
    SELECT doc_id, r_dense, r_sparse,
           round(1.0 / (60 + r_dense)
                 + coalesce(1.0 / (60 + r_sparse), 0.0), 6) AS rrf
    FROM dense LEFT JOIN sparse USING (doc_id)
    ORDER BY rrf DESC, doc_id LIMIT 20
    """,
)
def q_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval: reciprocal-rank fusion (k=60) of the dense rank
    (cosine vs the doc-0 embedding) and the sparse rank (BM25, 3-term
    query). Both ranks avoid the single-partition global window via
    operators/rank.py::global_rank. Cross-engine determinism: embeddings
    are cast float→double BEFORE the dot products, which makes Spark's
    ``zip_with``/``aggregate`` chain bit-identical to DuckDB's
    ``list_dot_product`` (verified 500/500 exact; the float32 path
    differs at ~1e-7 and would make ranks engine-dependent), and the BM25
    side ranks on its 6-dp-rounded oracle-matched score. At scale the
    dense rank's crossJoin is replaced by the ANN shortlist — the fusion
    stage is unchanged."""
    from .operators.rank import global_rank
    from .operators.similarity import dot

    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    base = e.select(
        F.col("vec_id").alias("doc_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("ed"),
    )
    qv = base.filter(F.col("doc_id") == 0).select(F.col("ed").alias("q"))
    ed, q_ = F.col("ed"), F.col("q")
    cos = dot(ed, q_) / (F.sqrt(dot(ed, ed)) * F.sqrt(dot(q_, q_)))
    dense = global_rank(
        base.crossJoin(F.broadcast(qv)).select("doc_id", cos.alias("c")),
        [F.col("c").desc(), F.col("doc_id")],
        "r_dense",
    ).select("doc_id", "r_dense")
    sparse = global_rank(
        q_bm25_search(spark, sf_dir),
        [F.col("bm25").desc(), F.col("doc_id")],
        "r_sparse",
    ).select("doc_id", "r_sparse")
    rrf = F.round(
        F.lit(1.0) / (F.lit(60) + F.col("r_dense"))
        + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("r_sparse")), F.lit(0.0)),
        6,
    )
    return (
        dense.join(sparse, "doc_id", "left")
        .select("doc_id", "r_dense", "r_sparse", rrf.alias("rrf"))
        .orderBy(F.col("rrf").desc(), F.col("doc_id"))
        .limit(20)
    )


@q(
    "q_incremental_agg",
    """
    SELECT event_type, count(*) AS n, round(sum(value), 6) AS total,
           round(sum(value) / count(*), 6) AS mean
    FROM events GROUP BY event_type
    """,
)
def q_incremental_agg(spark, sf_dir):
    """Incremental materialized-view maintenance: the per-type rollup is
    maintained as (count, sum) partial states; a new day of events merges
    via delta-aggregate + full-outer coalesce-add — NO rescan of the base.
    The oracle is the full recompute, so the driver check IS the
    incremental==full equivalence proof. At 100 TB this is the difference
    between touching one day and touching the decade; derived metrics
    (mean) come from the merged states, which is why the state is
    (count, sum), not (mean)."""
    ev = events(spark, sf_dir)
    cutoff = 25 * 86400_000_000 + 1704067200000000  # 2024-01-26 (µs)
    base = (
        ev.filter(F.col("ts_us") < cutoff)
        .groupBy("event_type")
        .agg(F.count("*").alias("n0"), F.sum("value").alias("s0"))
    )
    delta = (
        ev.filter(F.col("ts_us") >= cutoff)
        .groupBy("event_type")
        .agg(F.count("*").alias("n1"), F.sum("value").alias("s1"))
    )
    merged = base.join(delta, "event_type", "full_outer").select(
        "event_type",
        (F.coalesce(F.col("n0"), F.lit(0)) + F.coalesce(F.col("n1"), F.lit(0))).alias("n"),
        (
            F.coalesce(F.col("s0"), F.lit(0.0)) + F.coalesce(F.col("s1"), F.lit(0.0))
        ).alias("s"),
    )
    return merged.select(
        "event_type",
        "n",
        r6(F.col("s")).alias("total"),
        r6(F.col("s") / F.col("n")).alias("mean"),
    )


QUERIES["j1_cogrouped_twin"] = _j1_cogrouped_twin
ORACLES["j1_cogrouped_twin"] = ORACLES["j1_interp_join"]

ORACLES["txt_winnow"] = ORACLES["txt_winnow"].format(tok=_TOK_SQL)
ORACLES["dd_winnow_containment"] = ORACLES["dd_winnow_containment"].format(tok=_TOK_SQL)
ORACLES["q_hybrid_rrf"] = ORACLES["q_hybrid_rrf"].format(tok=_TOK_SQL)
ORACLES["q_countmin_tokens"] = ORACLES["q_countmin_tokens"].format(tok=_TOK_SQL)


@q(
    "q_dsir_selection",
    f"""
    WITH tk AS (SELECT doc_id, source, {_TOK_SQL} AS toks FROM documents),
    feats AS (
      SELECT doc_id, source, unnest(list_concat(toks,
        CASE WHEN len(toks) >= 2
             THEN list_transform(generate_series(1, len(toks) - 1),
                                 i -> toks[i] || ' ' || toks[i + 1])
             ELSE [] END)) AS f
      FROM tk),
    fb AS (SELECT doc_id, source,
                  ('0x' || substr(md5(f), 1, 8))::BIGINT % 1024 AS bucket,
                  count(*) AS c
           FROM feats GROUP BY 1, 2, 3),
    raw AS (SELECT bucket, sum(c) AS cr FROM fb GROUP BY 1),
    tgt AS (SELECT bucket, sum(c) AS ct FROM fb WHERE source = 'src0' GROUP BY 1),
    nr AS (SELECT sum(cr) AS v FROM raw),
    nt AS (SELECT coalesce(sum(ct), 0) AS v FROM tgt),
    lam AS (
      SELECT r.bucket,
             CAST(floor((ln((coalesce(t.ct, 0) + 1.0) / (nt.v + 1024.0))
                         - ln((r.cr + 1.0) / (nr.v + 1024.0)))
                        * 1000000.0 + 0.5) AS BIGINT) AS lam_micro
      FROM raw r LEFT JOIN tgt t USING (bucket) CROSS JOIN nr CROSS JOIN nt),
    scores AS (
      SELECT fb.doc_id,
             CAST(sum(fb.c * coalesce(l.lam_micro, 0)) AS BIGINT) AS score_micro
      FROM fb LEFT JOIN lam l USING (bucket) GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM scores)
    SELECT doc_id, score_micro,
           row_number() OVER (ORDER BY score_micro DESC, doc_id)
             <= CAST(ceil(0.25 * n.n_docs) AS BIGINT) AS selected
    FROM scores CROSS JOIN n
    """,
)
def q_dsir_selection(spark, sf_dir):
    """DSIR data selection (Xie et al. 2023): score every document by its
    hashed-n-gram importance log-weight under a target-vs-raw bucket
    model (target = the 'src0' slice standing in for a curated corpus)
    and keep the top quarter (operators/selection.py::dsir_select).
    Model tables are 1 024 rows → broadcast; scoring is map-side; the
    top-slice flag is the windowless global_rank. Scores are exact
    integer micro-nats (quantized log-ratios), so the oracle matches
    bit-for-bit. Engine addition — the reference (process_adcp.py) has
    no text/selection ops."""
    from .operators.selection import dsir_select

    # parallelism-only round-robin repartition, guarded on under-
    # partitioning (the dd_substring_spans pattern): the local fixture is
    # a single split and the md5 feature-explode is CPU-dense (3.7 ->
    # 2.1 s at sf0.1); on a many-split production input the guard makes
    # this a no-op rather than a parallelism-REDUCING full-table shuffle
    docs = table(spark, sf_dir, "documents")
    parts = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < parts:
        docs = docs.repartition(parts)
    return dsir_select(docs, F.col("source") == "src0", keep_fraction=0.25)


@q(
    "dd_bloom_decontaminate",
    f"""
    WITH sh AS (SELECT DISTINCT doc_id, tok FROM ({_SHINGLE_SQL})),
    hold AS (SELECT DISTINCT tok FROM sh WHERE doc_id % 50 = 0),
    hp AS (SELECT ('0x' || substr(md5(CAST(j.j AS VARCHAR) || ':' || tok), 1, 12))::BIGINT
                    % 65536 AS pos
           FROM hold CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) j),
    bloom AS (SELECT pos // 32 AS word_idx,
                     bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS word
              FROM hp GROUP BY 1),
    tr AS (SELECT doc_id, tok FROM sh WHERE doc_id % 50 <> 0),
    pp AS (SELECT doc_id, tok,
                  ('0x' || substr(md5(CAST(j.j AS VARCHAR) || ':' || tok), 1, 12))::BIGINT
                    % 65536 AS pos
           FROM tr CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) j),
    hit AS (SELECT doc_id, tok,
                   min(CASE WHEN (coalesce(b.word, 0)
                                  & (1::BIGINT << CAST(pos % 32 AS INT))) <> 0
                            THEN 1 ELSE 0 END) AS all_hit
            FROM pp LEFT JOIN bloom b ON pp.pos // 32 = b.word_idx
            GROUP BY doc_id, tok)
    SELECT doc_id, count(*) AS n_shingles,
           CAST(sum(all_hit) AS BIGINT) AS n_flagged,
           {R6P_SQL.format("sum(all_hit) / CAST(count(*) AS DOUBLE)")}
             AS contamination_rate
    FROM hit GROUP BY doc_id
    """,
)
def dd_bloom_decontaminate(spark, sf_dir):
    """Decontamination against a BLOOM FILTER of the holdout 3-shingle
    set (doc_id % 50 == 0 stands in for the eval benchmark, as in
    dd_contamination): the holdout n-grams compress to a 64 Kbit / k=3
    bitset built in one pass (operators/selection.py::bloom_build), the
    filter broadcasts (2 048 words), and the probe over the training
    pool is a map-side lookup — the 100 TB posture where the exact-join
    formulation (dd_contamination) would shuffle the pool keyed on
    n-grams. False-positive rate at these sizes ≈ (1−e^{{-kn/m}})^k;
    the filter is hash-deterministic, so the DuckDB oracle rebuilds the
    identical bitset and the per-doc flag counts match exactly."""
    from .operators.dedup import doc_shingles
    from .operators.selection import bloom_build, bloom_probe

    docs = table(spark, sf_dir, "documents")
    sh = doc_shingles(docs, 3).distinct()
    hold = sh.filter(F.col("doc_id") % 50 == 0).select("tok").distinct()
    bloom = bloom_build(hold, "tok", m_bits=65536, k=3)
    probed = bloom_probe(
        sh.filter(F.col("doc_id") % 50 != 0), "tok", bloom, m_bits=65536, k=3
    )
    flagged = F.col("maybe_member").cast("int")
    return probed.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"),
        F.sum(flagged).cast("bigint").alias("n_flagged"),
        r6p(F.sum(flagged) / F.count("*").cast("double")).alias(
            "contamination_rate"
        ),
    )


def _jl_oracle_sql(d_in: int = 64, d_out: int = 16) -> str:
    """DuckDB replay of similarity.py::jl_project — the SAME ±1 sign
    matrix (generated by the same jl_sign function at import time) and
    the SAME left-associated addition order, so the projected doubles are
    bit-identical and the compare needs no rounding."""
    from .operators.similarity import jl_sign

    scale = 1.0 / (d_out ** 0.5)
    cols = []
    for j in range(d_out):
        terms = " + ".join(
            f"CAST(embedding[{i + 1}] AS DOUBLE) * {jl_sign(i, j)}.0"
            for i in range(d_in)
        )
        cols.append(f"({terms}) * {scale!r} AS proj_{j:02d}")
    sel = ",\n           ".join(cols)
    return f"SELECT vec_id, {sel} FROM embeddings"


@q("ann_jl_project", _jl_oracle_sql())
def ann_jl_project(spark, sf_dir):
    """Johnson–Lindenstrauss ±1 random projection 64 → 16 dims
    (operators/similarity.py::jl_project) — the dimensionality-reduction
    stage a 100 TB ANN pipeline runs before LSH/IVF so every downstream
    dot product and shuffle shrinks 4×, with pairwise distances kept to
    (1±ε). Pure map (no shuffle, no UDF); left-associated IEEE sums and
    a power-of-two scale make the oracle match bit-exact with no
    rounding. Engine addition — the reference (process_adcp.py) has no
    embedding ops."""
    from .operators.similarity import jl_project

    emb = table(spark, sf_dir, "embeddings")
    return jl_project(emb, "embedding", d_in=64, d_out=16, id_cols=["vec_id"])


_LR_FEATS = ["x0", "x1", "x2", "x3"]
_LR_POS_SOURCES = "('src0', 'src1', 'src2', 'src3', 'src4')"


def _lr_oracle_sql(n_iter: int = 3, lr: float = 1.0) -> str:
    """DuckDB replay of operators/classifier.py::logistic_train — the
    full-batch GD recurrence unrolled as g_k/w_k CTE pairs (one gradient
    aggregate + one 1-row weight update per iteration, weights starting
    at 0), then the per-doc σ(w·x) scoring pass. Weight trajectories in
    the two engines differ only by float-summation ulps; the final 6-dp
    rounding absorbs them (the PCA-oracle precedent)."""
    fs = _LR_FEATS

    def zexpr(wref: str | None) -> str:
        if wref is None:
            return " + ".join(f"0.0 * {f}" for f in fs)
        return " + ".join(f"{wref}.w{j} * {f}" for j, f in enumerate(fs))

    its = []
    prev = None
    for k in range(1, n_iter + 1):
        sig = f"1.0 / (1.0 + exp(-({zexpr(prev)})))"
        gsel = ", ".join(
            f"avg(({sig} - y) * {f}) AS g{j}" for j, f in enumerate(fs)
        )
        src = "f" if prev is None else f"f CROSS JOIN {prev}"
        wprev = "0.0" if prev is None else None
        wsel = ", ".join(
            (f"0.0 - {lr!r} * g{j} AS w{j}")
            if prev is None
            else (f"{prev}.w{j} - {lr!r} * g{j} AS w{j}")
            for j in range(len(fs))
        )
        gsrc = f"g{k}" if prev is None else f"g{k} CROSS JOIN {prev}"
        its.append(f"g{k} AS (SELECT {gsel} FROM {src})")
        its.append(f"w{k} AS (SELECT {wsel} FROM {gsrc})")
        prev = f"w{k}"
    its_sql = ",\n    ".join(its)
    return f"""
    WITH f AS (
      SELECT doc_id,
             1.0 AS x0,
             n_chars / 1000.0 AS x1,
             len(toks) / 100.0 AS x2,
             len(list_distinct(toks)) / CAST(nullif(len(toks), 0) AS DOUBLE) AS x3,
             CASE WHEN source IN {_LR_POS_SOURCES} THEN 1.0 ELSE 0.0 END AS y
      FROM (SELECT doc_id, source, n_chars, {_TOK_SQL} AS toks FROM documents)),
    {its_sql}
    SELECT doc_id, y, 1.0 / (1.0 + exp(-({zexpr(prev)}))) AS p
    FROM f CROSS JOIN {prev}
    """


def _lr_scored(spark, sf_dir):
    """Shared trainer+scorer for the LR queries: features from document
    stats, 3 full-batch GD iterations (driver-scalar weights, one
    4-value aggregate per iteration), σ(w·x) scoring as a pure map.
    Returns (doc_id, y, p) at full precision."""
    from .operators.classifier import logistic_score, logistic_train
    from .operators.dedup import tokens as _tokens

    docs = table(spark, sf_dir, "documents")
    nt = F.size(F.col("__toks"))
    f = docs.withColumn("__toks", _tokens(F.col("text"))).select(
        "doc_id",
        F.lit(1.0).alias("x0"),
        (F.col("n_chars") / F.lit(1000.0)).alias("x1"),
        (nt / F.lit(100.0)).alias("x2"),
        (
            F.size(F.array_distinct(F.col("__toks")))
            / F.nullif(nt, F.lit(0)).cast("double")
        ).alias("x3"),
        F.col("source")
        .isin("src0", "src1", "src2", "src3", "src4")
        .cast("double")
        .alias("y"),
    )
    # PERF: the feature frame feeds 3 gradient aggregates + the scoring
    # pass; cache once (cache-boundary rule: 3+ consumers)
    f = f.cache()
    w = logistic_train(f, _LR_FEATS, "y", n_iter=3, lr=1.0)
    return logistic_score(f, _LR_FEATS, w, "p").select("doc_id", "y", "p")


@q(
    "q_lr_quality_train",
    f"""
    SELECT doc_id, CAST(y AS INTEGER) AS label, round(p, 6) AS p_quality
    FROM ({_lr_oracle_sql(3, 1.0)})
    """,
)
def q_lr_quality_train(spark, sf_dir):
    """Learned quality filter (CCNet/fastText-style): train a logistic
    regression on document stats (bias, chars, tokens, type–token
    ratio; label = the curated source slice) by 3 full-batch GD
    iterations (operators/classifier.py::logistic_train — one
    |features|-row aggregate per iteration, weights as driver scalars),
    then score every document map-side. The oracle unrolls the same
    recurrence as CTEs; features are bit-identical across engines and
    weights match to well under the 6-dp rounding. Engine addition —
    the reference has no model ops."""
    scored = _lr_scored(spark, sf_dir)
    return scored.select(
        "doc_id",
        F.col("y").cast("int").alias("label"),
        r6(F.col("p")).alias("p_quality"),
    )


@q(
    "q_calibration_bins",
    f"""
    SELECT CAST(least(floor(p * 10), 9) AS INTEGER) AS bin,
           count(*) AS n,
           round(avg(p), 6) AS avg_conf,
           round(avg(y), 6) AS frac_pos,
           round(abs(avg(p) - avg(y)), 6) AS gap
    FROM ({_lr_oracle_sql(3, 1.0)})
    GROUP BY 1
    """,
)
def q_calibration_bins(spark, sf_dir):
    """Classifier calibration audit (reliability-diagram bins): the
    trained quality filter's scores bucketed into 10 equal-width
    confidence bins with per-bin observed positive rate and |conf − acc|
    gap — the per-bin terms of expected calibration error. One
    10-group aggregate over the scored frame; composes with
    q_lr_quality_train's shared trainer. The gap column is what a
    pipeline thresholds before trusting filter scores as keep
    probabilities."""
    scored = _lr_scored(spark, sf_dir)
    b = F.least(F.floor(F.col("p") * 10), F.lit(9)).cast("int")
    return (
        scored.groupBy(b.alias("bin"))
        .agg(
            F.count("*").alias("n"),
            r6(F.avg("p")).alias("avg_conf"),
            r6(F.avg("y")).alias("frac_pos"),
            r6(F.abs(F.avg("p") - F.avg("y"))).alias("gap"),
        )
    )


@q(
    "q_zipf_fit",
    f"""
    WITH tok AS (SELECT unnest({_TOK_SQL}) AS tok FROM documents),
    cnt AS (SELECT tok, count(*) AS c FROM tok GROUP BY 1),
    rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rank FROM cnt),
    pts AS (SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
            FROM rk),
    s AS (SELECT CAST(count(*) AS DOUBLE) AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
          FROM pts)
    SELECT CAST(n AS BIGINT) AS n_terms,
           {R6P_SQL.format("(n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0)")}
             AS slope,
           {R6P_SQL.format(
               "(sy - (n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0) * sx) / n"
           )} AS intercept,
           {R6P_SQL.format(
               "((n * sxy - sx * sy) * (n * sxy - sx * sy)) "
               "/ nullif((n * sxx - sx * sx) * (n * syy - sy * sy), 0.0)"
           )} AS r2
    FROM s
    """,
)
def q_zipf_fit(spark, sf_dir):
    """Zipf's-law fit of the corpus token-frequency spectrum: OLS of
    ln(count) on ln(rank) — slope ≈ −1 on natural language; a corpus
    whose slope drifts far from −1 is template/spam-heavy, which makes
    this a standard corpus-health diagnostic. Ranks come from the
    windowless rank.global_rank over the |vocab|-row count table (tie
    break on token so the rank is a deterministic total order); the fit
    itself is one sufficient-statistics aggregate — nothing row-scale
    ever crosses a single partition."""
    from .operators.dedup import tokens as _tokens
    from .operators.rank import global_rank

    docs = table(spark, sf_dir, "documents")
    cnt = (
        docs.select(F.explode(_tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    rk = global_rank(cnt, [F.col("c").desc(), F.col("tok")], "rank")
    pts = rk.select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    s = pts.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.nullif(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0)
    )
    slope = num / den
    return s.select(
        F.col("n").cast("bigint").alias("n_terms"),
        r6p(slope).alias("slope"),
        r6p((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias("intercept"),
        r6p(
            (num * num)
            / F.nullif(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")),
                F.lit(0.0),
            )
        ).alias("r2"),
    )


@q(
    "st_bloom_decontam",
    f"""
    WITH sh AS (SELECT DISTINCT doc_id, tok FROM ({_SHINGLE_SQL})),
    hold AS (SELECT DISTINCT tok FROM sh WHERE doc_id % 50 = 0),
    hp AS (SELECT ('0x' || substr(md5(CAST(j.j AS VARCHAR) || ':' || tok), 1, 12))::BIGINT
                    % 65536 AS pos
           FROM hold CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) j),
    bloom AS (SELECT pos // 32 AS word_idx,
                     bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS word
              FROM hp GROUP BY 1),
    tr AS (SELECT doc_id, tok FROM sh WHERE doc_id % 50 <> 0),
    pp AS (SELECT doc_id, tok,
                  ('0x' || substr(md5(CAST(j.j AS VARCHAR) || ':' || tok), 1, 12))::BIGINT
                    % 65536 AS pos
           FROM tr CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) j),
    hit AS (SELECT doc_id, tok,
                   min(CASE WHEN (coalesce(b.word, 0)
                                  & (1::BIGINT << CAST(pos % 32 AS INT))) <> 0
                            THEN 1 ELSE 0 END) AS all_hit
            FROM pp LEFT JOIN bloom b ON pp.pos // 32 = b.word_idx
            GROUP BY doc_id, tok)
    SELECT doc_id, count(*) AS n_shingles,
           CAST(sum(all_hit) AS BIGINT) AS n_flagged,
           CAST(sum(all_hit) > 0 AS BOOLEAN) AS is_contaminated
    FROM hit GROUP BY doc_id
    """,
)
def st_bloom_decontam(spark, sf_dir):
    """Batch twin of the STREAMING Bloom decontaminator
    (streaming/decontam.py): the holdout bitset collapses to a literal
    2 048-long array and the per-doc verdict is a stateless projection —
    ZERO exchanges, so the identical plan runs under readStream in
    append mode with no watermark and no state. Same math as
    dd_bloom_decontaminate (which keeps the filter as a broadcast table
    and pays one verdict shuffle); the oracle rebuilds the identical
    bitset, so the two designs are pinned to agree exactly.

    The up-front round-robin repartition is PARALLELISM-ONLY, not a
    semantic shuffle: the local fixture parquet arrives as a single
    split, which would put the md5-dense probe on one core (measured
    9.5 → 0.9 s at sf0.1 with 32). At 100 TB the input already has
    thousands of splits and the repartition is a no-op to delete; the
    operator itself stays zero-exchange (the streaming form never
    shuffles). Round-robin is layout-independent here — every verdict
    is per-row — so no cross-branch cache is needed."""
    from .operators.dedup import doc_shingles
    from .operators.selection import bloom_build
    from .streaming.decontam import bitmap_from_words, decontaminate_flags

    docs = table(spark, sf_dir, "documents")
    # guarded parallelism-only repartition (see dd_substring_spans): a
    # no-op on many-split production inputs, a fan-out on the 1-split
    # local fixture where the shingle explode is the bottleneck
    parts = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < parts:
        docs = docs.repartition(parts)
    hold = (
        doc_shingles(docs.filter(F.col("doc_id") % 50 == 0), 3)
        .select("tok")
        .distinct()
    )
    bm = bitmap_from_words(bloom_build(hold, "tok", 65536, 3), 65536)
    return decontaminate_flags(
        docs.filter(F.col("doc_id") % 50 != 0), bm, 65536, 3
    )


@q(
    "q_mixture_upsample",
    f"""
    WITH w(source, wt) AS (VALUES
        ('src0', CAST(0.4 AS DOUBLE)), ('src1', CAST(0.3 AS DOUBLE)),
        ('src2', CAST(0.2 AS DOUBLE)), ('src3', CAST(0.1 AS DOUBLE))),
    n AS (SELECT source, count(*) AS n_s FROM documents GROUP BY source),
    t AS (SELECT count(*) AS total FROM documents
          WHERE source IN ('src0', 'src1', 'src2', 'src3')),
    r AS (SELECT d.doc_id, d.source,
                 CAST(3 * t.total AS DOUBLE) * w.wt / n.n_s AS rep,
                 ('0x' || substr(md5('up' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u
          FROM documents d JOIN w USING (source) JOIN n USING (source)
          CROSS JOIN t),
    c AS (SELECT doc_id, source,
                 CAST(floor(rep) AS BIGINT)
                   + (CASE WHEN u < rep - floor(rep) THEN 1 ELSE 0 END) AS reps
          FROM r)
    SELECT doc_id, source,
           CAST(unnest(generate_series(1, reps)) AS BIGINT) AS copy_id
    FROM c WHERE reps >= 1
    """,
)
def q_mixture_upsample(spark, sf_dir):
    """Epoch construction by UPSAMPLING (operators/sampling.py::
    upsample_by_repeats): a 3-epoch budget over the weighted slice gives
    stratum repeat factors r_s = 3·total·w_s / n_s (src0 → ×4.8: 4
    guaranteed copies + an 80 %-probability 5th via the stable hash
    draw) — the duplication half of domain mixing that
    q_mixture_resample (keep/drop only) cannot express; GPT-3's "books
    ×2.9" table is exactly this shape. Per-source counts are a
    dim-sized driver collect (the J4/J5 small-side pattern); the
    emission itself is a literal-map lookup + sequence-explode, pure
    map-side. Repeat factors are proportion-invariant, so the expansion
    is identical at every SF."""
    from .operators.sampling import upsample_by_repeats

    docs = table(spark, sf_dir, "documents")
    counts = {
        r["source"]: r["n"]
        for r in docs.filter(F.col("source").isin(*_MIX_WEIGHTS))
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    total = sum(counts.values())
    reps = {s: (3 * total) * w / counts[s] for s, w in _MIX_WEIGHTS.items() if s in counts}
    return upsample_by_repeats(docs, "source", "doc_id", reps, salt="up").select(
        "doc_id", "source", "copy_id"
    )


def _ndcg_oracle_sql(d_out: int = 16) -> str:
    """DuckDB replay of q_search_ndcg: exact-cosine ground truth (the
    ann_topk_bruteforce conventions — round-6 sims, vec_id tie break) vs
    the same retrieval run in JL space, scored with NDCG@10 / MRR. The
    JL projections come from _jl_oracle_sql's bit-exact CTE."""
    plist = ", ".join(f"proj_{j:02d}" for j in range(d_out))
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS vq FROM e WHERE vec_id < 10),
    cgt AS (
      SELECT q.query_id, e.vec_id AS nbr_id,
             round(list_dot_product(q.vq, e.v)
                   / nullif(sqrt(list_dot_product(q.vq, q.vq))
                            * sqrt(list_dot_product(e.v, e.v)), 0.0), 6) AS sim
      FROM q CROSS JOIN e WHERE e.vec_id <> q.query_id),
    gt AS (SELECT query_id, nbr_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, nbr_id ASC) AS rank_gt
           FROM cgt QUALIFY rank_gt <= 10),
    rel AS (SELECT query_id, nbr_id, CAST(11 - rank_gt AS DOUBLE) AS rel,
                   rank_gt FROM gt),
    p AS (SELECT vec_id, [{plist}] AS pv FROM ({_jl_oracle_sql()})),
    pq AS (SELECT vec_id AS query_id, pv AS pvq FROM p WHERE vec_id < 10),
    csys AS (
      SELECT pq.query_id, p.vec_id AS nbr_id,
             round(list_dot_product(pq.pvq, p.pv)
                   / nullif(sqrt(list_dot_product(pq.pvq, pq.pvq))
                            * sqrt(list_dot_product(p.pv, p.pv)), 0.0), 6) AS sim
      FROM pq CROSS JOIN p WHERE p.vec_id <> pq.query_id),
    sys AS (SELECT query_id, nbr_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, nbr_id ASC) AS rank_sys
            FROM csys QUALIFY rank_sys <= 10),
    idcg AS (SELECT query_id, SUM(rel / log2(rank_gt + 1.0)) AS idcg
             FROM rel GROUP BY query_id),
    dcg AS (
      SELECT s.query_id,
             SUM(coalesce(r.rel, 0.0) / log2(s.rank_sys + 1.0)) AS dcg,
             MAX(CASE WHEN r.rel IS NOT NULL
                      THEN 1.0 / s.rank_sys ELSE 0.0 END) AS mrr
      FROM sys s
      LEFT JOIN rel r ON r.query_id = s.query_id AND r.nbr_id = s.nbr_id
      GROUP BY s.query_id)
    SELECT d.query_id,
           {R6P_SQL.format("d.dcg / i.idcg")} AS ndcg10,
           {R6P_SQL.format("d.mrr")} AS mrr
    FROM dcg d JOIN idcg i USING (query_id)
    """


@q("q_search_ndcg", _ndcg_oracle_sql())
def q_search_ndcg(spark, sf_dir):
    """Retrieval-quality evaluation: NDCG@10 and MRR of JL-projected
    (64 → 16 dim) cosine retrieval against the exact full-dim cosine
    ground truth, per query (MRR = reciprocal rank of the first
    RELEVANT result, relevance = ground-truth top-10 membership) — the
    standard ranking-eval pass any search
    or RAG pipeline runs before trusting a cheaper index (here it
    quantifies exactly what the JL reduction trades away; the recall
    twin is tests' distortion suite). Graded relevance = 11 − exact
    rank. Both rankings use the repo's deterministic conventions
    (round-6 sims, vec_id tie break), projections are bit-exact across
    engines, so the oracle matches at 6 dp. Candidate volume is the
    declared-exact |queries|-bounded crossJoin of the ANN baselines."""
    from .operators.similarity import brute_force_topk, jl_project

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    gt = brute_force_topk(emb, queries, k=10, query_id_col="query_id")
    rel = gt.select(
        "query_id",
        "nbr_id",
        (F.lit(11) - F.col("rank")).cast("double").alias("rel"),
        F.col("rank").alias("rank_gt"),
    )
    parr = F.array(*[F.col(f"proj_{j:02d}") for j in range(16)])
    proj = jl_project(emb, "embedding", 64, 16, id_cols=["vec_id"]).select(
        "vec_id", parr.alias("embedding")
    )
    pqueries = proj.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    sys = brute_force_topk(proj, pqueries, k=10, query_id_col="query_id").select(
        "query_id", "nbr_id", F.col("rank").alias("rank_sys")
    )
    idcg = rel.groupBy("query_id").agg(
        F.sum(F.col("rel") / F.log2(F.col("rank_gt") + F.lit(1.0))).alias("idcg")
    )
    j = sys.join(
        rel.select("query_id", "nbr_id", "rel"), ["query_id", "nbr_id"], "left"
    )
    dcg = j.groupBy("query_id").agg(
        F.sum(
            F.coalesce(F.col("rel"), F.lit(0.0))
            / F.log2(F.col("rank_sys") + F.lit(1.0))
        ).alias("dcg"),
        F.max(
            F.when(F.col("rel").isNotNull(), 1.0 / F.col("rank_sys")).otherwise(0.0)
        ).alias("mrr"),
    )
    return dcg.join(F.broadcast(idcg), "query_id").select(
        "query_id",
        r6p(F.col("dcg") / F.col("idcg")).alias("ndcg10"),
        r6p(F.col("mrr")).alias("mrr"),
    )


@q(
    "q_vocab_coverage",
    f"""
    WITH tok AS (SELECT unnest({_TOK_SQL}) AS tok FROM documents),
    cnt AS (SELECT tok, count(*) AS c FROM tok GROUP BY 1),
    t AS (SELECT CAST(SUM(c) AS DOUBLE) AS total FROM cnt),
    rk AS (SELECT tok, c,
                  row_number() OVER (ORDER BY c DESC, tok) AS rank,
                  SUM(c) OVER (ORDER BY c DESC, tok
                               ROWS UNBOUNDED PRECEDING) AS cum_mass
           FROM cnt)
    SELECT rank AS k, CAST(cum_mass AS BIGINT) AS cum_mass,
           {R6P_SQL.format("cum_mass / t.total")} AS coverage
    FROM rk CROSS JOIN t
    WHERE rank IN (1, 3, 10, 30, 100, 1000)
    """,
)
def q_vocab_coverage(spark, sf_dir):
    """Token-mass coverage curve for vocabulary sizing: what fraction of
    the corpus token stream the top-k most frequent terms cover, sampled
    at k ∈ {{1, 3, 10, 30, 100, 1000}} (clipped to \\|vocab\\|) — the
    number a tokenizer designer reads before fixing a vocab budget, and
    the Zipf fit's (q_zipf_fit) cumulative companion. Rank AND running
    mass come from ONE windowless rank.global_cumsum pass (cumsum of
    [c, 1] under the same total order — no `row_number() OVER ()` global
    window anywhere); the total rides a 1-row broadcast."""
    from .operators.dedup import tokens as _tokens
    from .operators.rank import global_cumsum

    docs = table(spark, sf_dir, "documents")
    cnt = (
        docs.select(F.explode(_tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
        .withColumn("one", F.lit(1).cast("bigint"))
    )
    cum = global_cumsum(
        cnt,
        [F.col("c").desc(), F.col("tok")],
        ["c", "one"],
        ["cum_mass", "k"],
    )
    # total mass == the last rank's inclusive cum_mass — aggregate the
    # cumsum output (rides global_cumsum's internal consistency cache)
    # instead of re-scanning + re-shuffling the corpus token counts
    t = cum.agg(F.max("cum_mass").cast("double").alias("total")).withColumn(
        "__k", F.lit(1)
    )
    return (
        cum.filter(F.col("k").isin(1, 3, 10, 30, 100, 1000))
        .withColumn("__k", F.lit(1))
        .join(F.broadcast(t), "__k")
        .select(
            F.col("k").cast("bigint").alias("k"),
            F.col("cum_mass").cast("bigint").alias("cum_mass"),
            r6p(F.col("cum_mass") / F.col("total")).alias("coverage"),
        )
    )


@q(
    "dd_incremental_dedup",
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
      SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id
      FROM bands a JOIN bands b ON a.band = b.band AND a.bsig = b.bsig
      WHERE a.doc_id % 10 = 7 AND b.doc_id % 10 <> 7
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
    inter AS (
      SELECT c.new_id, c.corpus_id, count(*) AS n_inter
      FROM cand c JOIN toks ta ON ta.doc_id = c.new_id JOIN toks tb
        ON tb.doc_id = c.corpus_id AND tb.tok = ta.tok
      GROUP BY c.new_id, c.corpus_id
    )
    SELECT c.new_id, c.corpus_id,
           {R6P_SQL.format(
               "(CAST(coalesce(i.n_inter, 0) AS DOUBLE) "
               "/ nullif(CAST(sa.sz + sb.sz - coalesce(i.n_inter, 0) AS DOUBLE), 0.0))"
           )} AS jaccard,
           (CAST(coalesce(i.n_inter, 0) AS DOUBLE)
            / nullif(CAST(sa.sz + sb.sz - coalesce(i.n_inter, 0) AS DOUBLE), 0.0)) >= 0.8
             AS reject
    FROM cand c
    LEFT JOIN inter i ON i.new_id = c.new_id AND i.corpus_id = c.corpus_id
    JOIN sizes sa ON sa.doc_id = c.new_id
    JOIN sizes sb ON sb.doc_id = c.corpus_id
    """,
)
def dd_incremental_dedup(spark, sf_dir):
    """INCREMENTAL near-dedup — the nightly-ingest shape: a new batch
    (doc_id % 10 == 7 stands in for today's crawl) is checked against
    the existing corpus via a cross-side LSH band join
    (operators/dedup.py::lsh_cross_pairs), then exact shingle-Jaccard
    verification rejects true near-dups before admission. Differs from
    dd_dedup_pipeline (whole-corpus self-join): per-ingest cost is
    bounded by the batch — in production the corpus band_table is
    persisted bucketed by (band, bsig) and only batch bands are
    computed per run; candidate volume is band collisions, never
    \\|batch\\|×\\|corpus\\|. Recomputed here so the oracle replays the
    identical state. The corpus is shingled ONCE (one cached shingle
    table feeds both sides' band tables AND the exact-Jaccard verify
    stage via ``token_df`` — not once per consumer)."""
    from .operators.dedup import (
        doc_shingles,
        jaccard_on_pairs,
        lsh_cross_pairs,
    )

    docs = table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 10 == 7)
    corpus = docs.filter(F.col("doc_id") % 10 != 7)
    toks = doc_shingles(docs, 3).cache()  # 3 consumers below
    cand = lsh_cross_pairs(
        batch,
        corpus,
        k=16,
        band_rows=4,
        new_token_df=toks.filter(F.col("doc_id") % 10 == 7),
        corpus_token_df=toks.filter(F.col("doc_id") % 10 != 7),
    )
    pairs = cand.select(
        F.col("new_id").alias("doc1"), F.col("corpus_id").alias("doc2")
    )
    out = jaccard_on_pairs(docs, pairs, use_shingles=True, token_df=toks)
    return out.select(
        F.col("doc1").alias("new_id"),
        F.col("doc2").alias("corpus_id"),
        r6p(F.col("jaccard")).alias("jaccard"),
        (F.col("jaccard") >= 0.8).alias("reject"),
    )


# ---------------------------------------------------------------------------
# Driver-coverage rotation: the per-round correctness harness checks queries
# in registration order with a finite cap (round 1 recorded exactly the first
# 50). Queries WITHOUT a green CORRECTNESS_r* row yet are moved to the front
# so every query accumulates a driver-verified row across rounds. Rotate this
# list as rounds land.
# ---------------------------------------------------------------------------

_DRIVER_FIRST = [
    # The 50 names the round-3 driver sampled (CORRECTNESS_r03.json) all
    # came back green and moved to the back of the registration order.
    # What remains up front is the never-driver-sampled tail (71 queries
    # after round 3 — every one locally oracle-verified at sf0.01 AND
    # sf0.1 by scripts/check_contract.py), oldest debt first, followed by
    # queries newly registered in round 4. With the driver's 50-per-round
    # cap, ~50 get official rows in round 4 and the remainder is
    # explicitly queued for round 5.
    "q_tpch_q16", "q_first_touch",
    "q_incremental_agg", "ann_recall_report", "q_hybrid_rrf", "q_corpus_shuffle",
    "q_tpch_q7", "q_tpch_q8", "q_tpch_q13", "q_tpch_q15", "q_tpch_q17",
    "q_tpch_q2", "q_tpch_q9", "q_tpch_q11", "q_tpch_q20", "q_tpch_q21", "q_tpch_q22",
    "q_label_centroids", "q_countmin_tokens", "q_dq_checks", "q_hll_distinct",
    "txt_bpe_train", "q_pit_join", "q_reservoir_sample", "q_weighted_sample",
    "dd_edit_distance_pairs", "q_zorder_layout", "q_k_anonymity", "ann_pca_top",
    "q_chi2_independence", "q_kl_drift", "q_graph_triangles", "q_skyline_frontier",
    "txt_bpe_encode", "j1_cogrouped_twin", "q_rendezvous_shards",
    "q_peak_concurrency", "q_group_ols", "q_quantile_transform",
    "q_welch_ttest", "q_lag_autocorr", "q_mutual_info",
    "q_gini_concentration", "q_cusum_drift", "q_assoc_rules", "q_winsorize",
    "q_markov_transitions", "q_benford_audit", "q_quantile_sketch",
    "txt_pmi_bigrams", "q_two_hop_reach", "q_target_encode", "q_hopping_counts",
    "q_l_diversity", "q_dp_counts", "txt_readability", "ann_isotropy_probe",
    "mm_wav_features", "q_label_propagation", "q_hilbert_layout",
    "q_snapshot_diff", "q_column_corr", "q_table_checksum", "ann_pca_gram",
    "q_dataset_split", "q_rfm_segments", "q_unpivot_melt", "q_lttb_downsample",
    "q_session_paths", "q_weighted_quantiles", "q_best_split",
    # new in round 4 — appended behind the older debt
    "q_profile_table_approx", "q_auc_scores", "dd_jaccard_prefix_pairs",
    "q_kappa_langid", "q_equidepth_histogram", "dd_lsh_recall_report",
    "q_dsir_selection", "dd_bloom_decontaminate", "ann_jl_project",
    "q_lr_quality_train", "q_calibration_bins", "q_zipf_fit",
    "st_bloom_decontam", "q_mixture_upsample", "q_search_ndcg",
    "q_vocab_coverage", "dd_incremental_dedup",
]


def _rotate_for_driver_coverage() -> None:
    for d in (QUERIES, ORACLES):
        ordered = {k: d[k] for k in _DRIVER_FIRST if k in d}
        ordered.update({k: v for k, v in d.items() if k not in ordered})
        d.clear()
        d.update(ordered)


_finalize_pretrain_oracle()
_rotate_for_driver_coverage()
