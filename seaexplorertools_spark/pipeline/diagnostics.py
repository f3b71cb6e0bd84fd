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


def enu_sign_check(
    cells: DataFrame,
    min_depth: float = 20.0,
    mission_col: str | None = None,
) -> DataFrame:
    """Reference ``verify_calcENUfromXYZ`` first figure
    (process_adcp.py:1263-1287) as a table instead of histograms: the
    physics says a forward-flying glider sees relative X negative in both
    cast directions, and relative vertical velocity U positive while
    diving (pitch < 0) and negative while climbing (pitch > 0), below
    ``min_depth``. One row per (variable, regime) with the finite count,
    mean, and the fraction matching the expected sign — a fraction near
    0.5 or a mean on the wrong side flags a beam-mapping or rotation
    error the way the reference asks a human to eyeball it. Single
    groupBy over the cell table; scales with no global stage."""
    regime = (
        F.when((F.col("pitch") < 0) & (F.col("depth") > min_depth), F.lit("dive"))
        .when((F.col("pitch") > 0) & (F.col("depth") > min_depth), F.lit("climb"))
    )
    base = cells.withColumn("regime", regime).filter(F.col("regime").isNotNull())
    out = None
    # expected sign: (variable, regime) -> +1 / -1 multiplier making
    # "expected" equivalent to sign(v * mult) > 0
    expect = {("x", "dive"): -1.0, ("x", "climb"): -1.0, ("u", "dive"): 1.0, ("u", "climb"): -1.0}
    gcols = ([mission_col] if mission_col else []) + ["regime"]
    for var in ("x", "u"):
        mult = F.when(F.col("regime") == "dive", F.lit(expect[(var, "dive")])).otherwise(
            F.lit(expect[(var, "climb")])
        )
        stats = (
            base.filter(F.col(var).isNotNull())
            .groupBy(*gcols)
            .agg(
                F.count(var).alias("n"),
                F.avg(var).alias("mean_v"),
                F.avg((F.col(var) * mult > 0).cast("double")).alias("frac_expected_sign"),
            )
            .withColumn("variable", F.lit(var))
        )
        out = stats if out is None else out.unionByName(stats)
    return out.select(*gcols, "variable", "n", "mean_v", "frac_expected_sign")


def vertical_speed_consistency(
    cells: DataFrame,
    min_pressure: float = 10.0,
    min_depth: float = 20.0,
    mission_col: str | None = None,
) -> DataFrame:
    """Reference ``verify_calcENUfromXYZ`` second figure
    (process_adcp.py:1290-1316): dz/dt from the pressure record must
    agree with the ADCP-measured relative vertical velocity U. Per ping
    (below ``min_pressure`` dbar): U̅ = bin-mean of U, dz/dt = central
    difference of depth against time seconds over the filtered ping
    series (the reference's np.gradient on the ``Pressure > 10`` subset),
    residual = dz/dt − U̅. Output: one row per pitch regime (dive/climb,
    below ``min_depth``) with n, mean/std of the residual — the two
    means are the reference plot's colored axvlines; a mean far from 0
    in either regime exposes a vertical-velocity bias (e.g. a beam-angle
    or soundspeed error). Shuffles: one ping-level aggregate plus a
    window partitioned by mission (single-series semantics per SURVEY
    §2.5; pass mission_col for multi-mission runs)."""
    pings = (
        cells.filter(F.col("pressure") > min_pressure)
        .groupBy(*([mission_col] if mission_col else []), "time_us")
        .agg(
            F.avg("u").alias("u_ping"),
            F.first("depth").alias("depth"),
            F.first("pitch").alias("pitch"),
        )
    )
    t_sec = (F.col("time_us").cast("double") / F.lit(1e6)).alias("t_sec")
    pings = pings.withColumn("t_sec", t_sec)
    dzdt = W.central_diff(
        "depth", F.col("t_sec"), [mission_col] if mission_col else [], ["time_us"]
    )
    resid = (
        pings.withColumn("dzdt", dzdt)
        .withColumn("resid", F.col("dzdt") - F.col("u_ping"))
        .withColumn(
            "regime",
            F.when((F.col("pitch") < 0) & (F.col("depth") > min_depth), F.lit("dive"))
            .when((F.col("pitch") > 0) & (F.col("depth") > min_depth), F.lit("climb")),
        )
        .filter(F.col("regime").isNotNull() & F.col("resid").isNotNull())
    )
    gcols = ([mission_col] if mission_col else []) + ["regime"]
    return resid.groupBy(*gcols).agg(
        F.count("resid").alias("n"),
        F.avg("resid").alias("mean_resid"),
        F.stddev("resid").alias("std_resid"),
    )
