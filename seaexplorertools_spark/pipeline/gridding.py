"""Stage 2 — ``grid_shear`` parity (reference process_adcp.py:2060-2064).

The reference calls grid2d once per variable (~15 separate pd.cut+groupby
passes over the same axes, :1820-1851). Here the same result is THREE
shuffles total — one multi-aggregate groupBy per source granularity:

  1. gridded cells (x=profile, y=bin_depth):  Sh_E/Sh_N/Sh_U means
  2. pings         (x=profile, y=pressure):   heading/pitch/roll/lat/lon/…
  3. glider        (x=profile, y=pressure):   every numeric column (mean),
                                              salinity (exact median)

Axes (reference grid_shear_data :1651-1653): x = profile number (width 1),
y = depth bins of ``y_res`` metres. Output is the long gridded table keyed
(profile_num, depth_bin); densify only at export.

Grid domain (reference parity — options["grid_domain"]):

The reference's ``grid2d`` (:117-134) cuts onto EXPLICIT edge arrays with
``pd.cut`` — right-closed intervals, both edge arrays derived from the
GLIDER: xaxis = the unique profile numbers (:1652), yaxis =
``arange(0, max(ceil(pressure)), y_res)`` (:1651). Three consequences the
engine must reproduce for parity (they leak into every global reduction —
per-profile demeans, the SpB σ clip, the bias fit):

- the FIRST profile is dropped (equal to the first edge, excluded);
- depths beyond the last yaxis edge are dropped — the analysis is capped
  at the glider's max pressure even where the ADCP sees deeper;
- bins are right-closed: a value exactly on an edge belongs to the bin
  ABOVE it, and y == 0 is dropped.

``grid_domain="reference"`` (default) applies exactly that domain via a
broadcast-joined per-profile dim table (one tiny glider aggregate — no
driver collect, scale-free). ``"full"`` keeps every profile and depth with
left-closed floor bins — the engine extension that wastes no data, for
users who prefer coverage over reference parity. Deviation kept under
"reference": a *fabricated* profile id (round() of an interp crossing a
gap in the glider's profile set) is DROPPED rather than polluting the
next-higher profile's column as pd.cut would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.grid import bucket

GLIDER_EXCLUDE = {
    "time_us", "DeadReckoning", "NAV_RESOURCE", "declination",
}


def domain_table(glider: DataFrame, y_res: float, mission_part: list[str]) -> DataFrame:
    """Per-profile grid-domain dim table: (profile_num, __jmax) with the
    first profile of each mission EXCLUDED and __jmax = index of the last
    valid depth bin (= len(arange(0, ceil(max pressure), y_res)) − 2,
    reference :1651). Profiles are mission-unique by convention, so the
    table is keyed by profile alone; |rows| = |profiles| (dim-sized,
    broadcastable at any corpus scale)."""
    y_res = float(y_res)
    bounds = glider.groupBy(*mission_part).agg(
        F.min("profile_number").cast("long").alias("__p_min"),
        (F.ceil(F.ceil(F.max("pressure")) / F.lit(y_res)) - F.lit(2))
        .cast("long")
        .alias("__jmax"),
    )
    profs = glider.select(
        *mission_part, F.col("profile_number").cast("long").alias("profile_num")
    ).distinct()
    joined = profs.join(bounds, mission_part) if mission_part else profs.crossJoin(bounds)
    return joined.filter(F.col("profile_num") > F.col("__p_min")).select(
        "profile_num", "__jmax"
    )


def with_grid_keys(
    df: DataFrame, x, y, y_res: float, domain: DataFrame | None
) -> DataFrame:
    """Add (profile_num, depth_bin) keys and, when ``domain`` is given,
    restrict to the reference's pd.cut domain (right-closed depth bins,
    0 ≤ depth_bin ≤ __jmax, profiles from the domain table)."""
    y_res = float(y_res)
    df = df.withColumn("profile_num", bucket(x, 0.0, 1.0))
    if domain is None:
        return df.withColumn("depth_bin", bucket(y, 0.0, y_res))
    df = df.withColumn("depth_bin", bucket(y, 0.0, y_res, closed="right"))
    return (
        df.join(F.broadcast(domain), "profile_num")
        .filter((F.col("depth_bin") >= 0) & (F.col("depth_bin") <= F.col("__jmax")))
        .drop("__jmax")
    )


def grid_cells(
    gridded_cells: DataFrame, y_res: float = 1.0, domain: DataFrame | None = None
) -> DataFrame:
    aggs = [F.avg(f"sh_{c}").alias(f"Sh_{c.upper()}") for c in ("e", "n", "u")]
    aggs += [F.avg(c).alias(c) for c in ("e", "n", "u")]
    keyed = with_grid_keys(
        gridded_cells, F.col("profile_number"), F.col("bin_depth"), y_res, domain
    )
    return keyed.groupBy("profile_num", "depth_bin").agg(*aggs)


def grid_pings(
    ping_aug: DataFrame, y_res: float = 1.0, domain: DataFrame | None = None
) -> DataFrame:
    cols = {
        "Heading": "heading",
        "Pitch": "pitch",
        "Roll": "roll",
        "latitude": "latitude",
        "longitude": "longitude",
        "profile_number": "profile_number",
        "Pressure": "pressure",
    }
    aggs = [F.avg(src).alias(out) for out, src in cols.items()]
    keyed = with_grid_keys(
        ping_aug, F.col("profile_number").cast("double"), F.col("pressure"), y_res, domain
    )
    return keyed.groupBy("profile_num", "depth_bin").agg(*aggs)


def grid_glider(
    glider: DataFrame,
    y_res: float = 1.0,
    extra_exclude: set | None = None,
    domain: DataFrame | None = None,
) -> DataFrame:
    """Generic numeric-column gridding (reference _grid_glider_data
    :1797-1817 iterates columns minus an exclusion list). salinity uses the
    exact median (reference reference_shear :1702)."""
    exclude = GLIDER_EXCLUDE | (extra_exclude or set())
    numeric = [
        f.name
        for f in glider.schema.fields
        if f.name not in exclude and f.dataType.typeName() in ("double", "float", "long", "integer")
    ]
    aggs = [F.avg(c).alias(c) for c in numeric if c != "salinity"]
    if "salinity" in glider.columns:
        aggs.append(F.median("salinity").alias("salinity"))
    # per-profile mean time for the profile_datetime axis (reference :2042)
    aggs.append(F.avg(F.col("time_us").cast("double")).alias("date_float_us"))
    keyed = with_grid_keys(
        glider, F.col("profile_number").cast("double"), F.col("pressure"), y_res, domain
    )
    return keyed.groupBy("profile_num", "depth_bin").agg(*aggs)


def resolve_domain(glider: DataFrame, options: dict) -> DataFrame | None:
    """The per-profile domain dim for options["grid_domain"] (default
    "reference"); None under "full"."""
    mode = options.get("grid_domain", "reference")
    if mode == "full":
        return None
    if mode != "reference":
        raise ValueError(f"grid_domain must be 'reference' or 'full', got {mode!r}")
    part = [options["mission_col"]] if options.get("mission_col") else []
    return domain_table(glider, float(options.get("y_res", 1.0)), part)


def grid_shear(
    gridded_cells: DataFrame, ping_aug: DataFrame, glider: DataFrame, options: dict
) -> DataFrame:
    """Entry point 2 (reference grid_shear :2060-2064): full gridded dataset
    keyed (profile_num, depth_bin)."""
    y_res = float(options.get("y_res", 1.0))
    domain = resolve_domain(glider, options)
    g_cells = grid_cells(gridded_cells, y_res, domain)
    g_ping = grid_pings(ping_aug, y_res, domain)
    g_glider = grid_glider(
        glider, y_res, extra_exclude={"profile_number"}, domain=domain
    )
    out = g_cells.join(g_ping, ["profile_num", "depth_bin"], "full").join(
        g_glider, ["profile_num", "depth_bin"], "full"
    )
    return out
