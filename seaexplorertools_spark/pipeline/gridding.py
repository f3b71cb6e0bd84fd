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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.grid import bucket

GLIDER_EXCLUDE = {
    "time_us", "DeadReckoning", "NAV_RESOURCE", "declination",
}


def _keys(x, y, y_res: float):
    return [
        bucket(x, 0.0, 1.0).alias("profile_num"),
        bucket(y, 0.0, float(y_res)).alias("depth_bin"),
    ]


def grid_cells(gridded_cells: DataFrame, y_res: float = 1.0) -> DataFrame:
    aggs = [F.avg(f"sh_{c}").alias(f"Sh_{c.upper()}") for c in ("e", "n", "u")]
    aggs += [F.avg(c).alias(c) for c in ("e", "n", "u")]
    return (
        gridded_cells.groupBy(*_keys(F.col("profile_number"), F.col("bin_depth"), y_res))
        .agg(*aggs)
    )


def grid_pings(ping_aug: DataFrame, y_res: float = 1.0) -> DataFrame:
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
    return (
        ping_aug.groupBy(*_keys(F.col("profile_number").cast("double"), F.col("pressure"), y_res))
        .agg(*aggs)
    )


def grid_glider(glider: DataFrame, y_res: float = 1.0, extra_exclude: set | None = None) -> DataFrame:
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
    return (
        glider.groupBy(*_keys(F.col("profile_number").cast("double"), F.col("pressure"), y_res))
        .agg(*aggs)
    )


def grid_shear(
    gridded_cells: DataFrame, ping_aug: DataFrame, glider: DataFrame, options: dict
) -> DataFrame:
    """Entry point 2 (reference grid_shear :2060-2064): full gridded dataset
    keyed (profile_num, depth_bin)."""
    y_res = float(options.get("y_res", 1.0))
    g_cells = grid_cells(gridded_cells, y_res)
    g_ping = grid_pings(ping_aug, y_res)
    g_glider = grid_glider(
        glider, y_res, extra_exclude={"profile_number"}
    )
    out = g_cells.join(g_ping, ["profile_num", "depth_bin"], "full").join(
        g_glider, ["profile_num", "depth_bin"], "full"
    )
    return out
