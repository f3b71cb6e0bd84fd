"""Diagnostic verifications — reference ``verify_depth_bias``
(process_adcp.py:1859-1951) re-expressed as DataFrames instead of plots.

The reference histograms referenced velocities by travel direction
(northward/southward, from the latitude gradient along the profile axis)
and depth class, to expose compass/attitude biases as north-south
asymmetry. Here the same statistics come back as a long table the caller
can assert on, plot, or write — A10 (histogram), W2 (gradient), W8
(parity) composed over the gridded output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import windows as W
from ..operators.grid import bucket


def depth_bias_stats(
    grid: DataFrame,
    vars_: tuple[str, ...] = ("ADCP_E", "ADCP_N"),
    n_depth_classes: int = 20,
    max_depth_bin: float | None = None,
) -> DataFrame:
    """Per (variable, travel direction, depth class): mean, std, stderr and
    finite count of the gridded velocity (reference :1884-1907). Travel
    direction = sign of d(latitude)/d(profile) (central difference over the
    profile axis, reference :1860-1861 np.gradient axis=1)."""
    prof_lat = grid.groupBy("profile_num").agg(F.avg("latitude").alias("lat"))
    dlat = W.central_diff("lat", F.col("profile_num").cast("double"), [], ["profile_num"])
    direction = (
        prof_lat.withColumn("dlat", dlat)
        .withColumn(
            "direction",
            F.when(F.col("dlat") > 0, F.lit("north")).when(F.col("dlat") < 0, F.lit("south")),
        )
        .select("profile_num", "direction")
    )
    g = grid.join(F.broadcast(direction), "profile_num", "left")

    if max_depth_bin is None:
        max_depth_bin = g.agg(F.max("depth_bin")).first()[0] or n_depth_classes
    width = max(float(max_depth_bin) / n_depth_classes, 1.0)
    g = g.withColumn("depth_class", bucket(F.col("depth_bin").cast("double"), 0.0, width))

    out = None
    for v in vars_:
        stats = (
            g.filter(F.col(v).isNotNull() & F.col("direction").isNotNull())
            .groupBy("direction", "depth_class")
            .agg(
                F.avg(v).alias("mean_v"),
                F.stddev(v).alias("std_v"),
                F.count(v).alias("n"),
            )
            .withColumn("stderr_v", F.col("std_v") / F.sqrt(F.col("n").cast("double")))
            .withColumn("variable", F.lit(v))
        )
        out = stats if out is None else out.unionByName(stats)
    return out.select("variable", "direction", "depth_class", "mean_v", "std_v", "stderr_v", "n")


def depth_bias_asymmetry(grid: DataFrame, vars_: tuple[str, ...] = ("ADCP_E", "ADCP_N")) -> DataFrame:
    """One row per (variable, depth_class): north-minus-south mean gap in
    units of the combined standard error — the scalar the reference's plot
    asks the human to eyeball; |z| >> 2 across many depths indicates a
    heading/depth bias."""
    stats = depth_bias_stats(grid, vars_)
    north = stats.filter(F.col("direction") == "north").select(
        "variable", "depth_class",
        F.col("mean_v").alias("mean_n"), F.col("stderr_v").alias("se_n"),
    )
    south = stats.filter(F.col("direction") == "south").select(
        "variable", "depth_class",
        F.col("mean_v").alias("mean_s"), F.col("stderr_v").alias("se_s"),
    )
    joined = north.join(south, ["variable", "depth_class"])
    z = (F.col("mean_n") - F.col("mean_s")) / F.nullif(
        F.sqrt(F.col("se_n") * F.col("se_n") + F.col("se_s") * F.col("se_s")), F.lit(0.0)
    )
    return joined.withColumn("asymmetry_z", z)
