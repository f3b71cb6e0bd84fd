"""Stage 1 — ``shear_from_adcp`` parity (reference process_adcp.py:2046-2057).

Call chain re-expressed as one lazy DataFrame lineage with three collect
boundaries (orientation detect, compass fit, regrid ladder):

    align (J1 interp-joins)            ← load_adcp_glider_data :158-223
    → beam depth remap (F2)            ← remapADCPdepth        :224-310
    → heading correction (O1/F10)      ← correct_heading       :450-462
    → soundspeed ratio (F6)            ← soundspeed_correction :464-475
    → QC masking (P3)                  ← remove_outliers       :478-566
    → shear correction (F3/O3, opt.)   ← correct_shear         :771-784
    → backscatter (F8/F9)              ← correct_backscatter   :787-873
    → per-ping regrid (R1)             ← regridADCPdata        :876-981
    → 3-beam XYZ (F4)                  ← calcXYZfrom3beam      :984-1130
    → ENU + shear (F5/W2)              ← calcENUfromXYZ        :1133-1194

The working table is ``cells`` (one row per ping×bin) with the per-ping
attitude/nav columns joined in once at align time — every later stage is
pure column expressions or one keyed shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType, LongType, StructField, StructType
from pyspark.sql.window import Window

from ..functions import geodesy as G  # noqa: F401
from ..functions import gsw as GSW
from ..functions import math as M
from ..operators import windows as W
from ..operators.joins import interp_join
from ..operators.qc import qc_velocity

BEAMS = (1, 2, 3, 4)


def align_glider_to_pings(ping: DataFrame, glider: DataFrame, options: dict) -> tuple[DataFrame, dict]:
    """J1 interp of glider nav/CTD onto ping times + orientation detect
    (reference load_adcp_glider_data :169-213)."""
    samples = glider.select(
        "time_us", "latitude", "longitude", "profile_number", "salinity",
        "declination", "soundspeed", "temperature", "speed_horz",
    ).withColumn("profile_number", F.col("profile_number").cast("double"))
    ping_aug = interp_join(
        samples,
        ping,
        on="time_us",
        values=[
            "latitude", "longitude", "profile_number", "salinity",
            "declination", "soundspeed", "temperature", "speed_horz",
        ],
        bucket=options.get("interp_bucket"),
        suffix="_g",
    )
    ping_aug = (
        ping_aug.withColumnsRenamed(
            {
                "latitude_g": "latitude",
                "longitude_g": "longitude",
                "salinity_g": "salinity",
                "declination_g": "declination",
                "soundspeed_g": "glider_soundspeed",
                "temperature_g": "temperature",
                "speed_horz_g": "speed_horz",
            }
        )
        .withColumn("profile_number", F.round(F.col("profile_number_g")).cast("long"))
        .drop("profile_number_g")
        .withColumn("depth", GSW.depth_from_pressure(F.col("pressure"), F.col("latitude")))
    )

    if options.get("top_mounted") is None:
        # collect boundary: orientation detect (reference :210-213)
        mz = ping.agg(F.avg("magnetometer_z")).first()[0]
        options = {**options, "top_mounted": bool(mz is not None and mz < 0)}
    return ping_aug, options


def correct_heading(ping_aug: DataFrame, options: dict) -> DataFrame:
    """Heading correction (reference correct_heading :450-462): compass
    hard/soft-iron fit (O1, driver-side fmin — needs a geomag target) then
    declination added. Offline (geomag_target=None) → declination only,
    with the fit coefficients at identity."""
    if not options.get("correctADCPHeading"):
        return ping_aug
    coeffs = [1.0, 0, 0, 0, 1.0, 0, 0, 0, 1.0, 0, 0, 0]
    if options.get("geomag_target") is not None:
        from .driverside import fit_compass

        pdf = ping_aug.select(
            "magnetometer_x", "magnetometer_y", "magnetometer_z"
        ).toPandas()
        coeffs = fit_compass(pdf, float(options["geomag_target"]))
    sign = 1.0 if options["top_mounted"] else -1.0
    mx, my, mz = M.calibrate_mag(
        F.col("magnetometer_x"), F.col("magnetometer_y"), F.col("magnetometer_z"), coeffs
    )
    corrected = M.mag_heading(mx, my, mz, F.col("pitch"), F.col("roll"), sign=sign)
    return ping_aug.withColumn("heading_old", F.col("heading")).withColumn(
        "heading", corrected + F.col("declination")
    )


def build_cells(cells: DataFrame, ping_aug: DataFrame, attrs: dict, options: dict) -> DataFrame:
    """Join ping columns onto cells, derive along-beam range and per-beam
    cell depths (reference remapADCPdepth :224-310). One sort-merge join on
    time_us — co-bucketable at scale."""
    cell_size = float(attrs["avg_cellSize"])
    blanking = float(attrs["avg_blankingDistance"])
    df = cells.join(ping_aug, "time_us")
    if options.get("ADCP_discardFirstBins", 0):
        df = df.filter(F.col("bin") >= int(options["ADCP_discardFirstBins"]))
    df = df.withColumn(
        "velocity_range",
        F.lit(blanking) + (F.col("bin").cast("double") + F.lit(0.5)) * F.lit(cell_size),
    )
    top = options["top_mounted"]
    for b in BEAMS:
        df = df.withColumn(
            f"d{b}",
            M.beam_cell_depth(
                F.col("depth"), F.col("velocity_range"), F.col("pitch"), F.col("roll"), b, top
            ),
        )
    return df


def soundspeed_correction(df: DataFrame) -> DataFrame:
    """F6 (reference :464-475): V *= c_glider / c_instrument. Idempotency is
    lineage-level (pure transform), no rename guard needed."""
    ratio = F.col("glider_soundspeed") / F.nullif(F.col("speed_of_sound"), F.lit(0.0))
    return df.withColumns({f"velocity_beam{b}": F.col(f"velocity_beam{b}") * ratio for b in BEAMS})


def remove_outliers(df: DataFrame, options: dict) -> DataFrame:
    """P3 QC masking (reference :478-566)."""
    return qc_velocity(
        df,
        beams=list(BEAMS),
        corr_min=float(options["correlationThreshold"]),
        amp_max=float(options["ampThreshold"]),
        vel_max=float(options["velocityThreshold"]),
    )


def correct_shear(df: DataFrame, ping_aug: DataFrame, options: dict) -> DataFrame:
    """O3 — optional shear-profile correction, reference-parity (reference
    correct_shear :771-784, _shear_correction :682-768). Default-off like
    the reference golden test.

    Per enabled component (ZZ4, Z4, Y4, X4 — reference flag order :776-779):
    beam→XYZZ (F3), select pings whose through-water speed at the FIRST bin
    (sqrt(X4² + Y4² + ((Z4+ZZ4)/2)²), ``.values[:, 0]`` at :687-689) lies in
    the open band (0.2, 0.29) (``full_range[0]``/``full_range[-1]`` of
    ``np.arange(0.2, 0.3, 0.01)``, :758-759), average the per-ping bin
    difference of the component over those pings, cumulative-sum with a
    leading 0 (``np.cumsum(np.insert(..., 0, 0))``), demean
    (``ref -= np.nanmean(ref)``), and subtract that ONE profile from every
    ping. np.cumsum propagates NaN — a bin with no selected data poisons all
    deeper bins, reproduced with a running null flag.

    Scale: the correction profile is |bins| rows (tiny) → broadcast join;
    the selection aggregate is one groupBy(ping) with map-side combine.
    """
    flags = [
        ("correctZZshear", "zz4"),
        ("correctZshear", "z4"),
        ("correctYshear", "y4"),
        ("correctXshear", "x4"),
    ]
    if not any(options.get(k) for k, _ in flags):
        return df

    band = np.arange(0.2, 0.3, 0.01)  # reference :691-692
    lo, hi = float(band[0]), float(band[-1])
    names = ["x4", "y4", "z4", "zz4"]
    mission_part = [options["mission_col"]] if options.get("mission_col") else []

    xyzz = M.beam2xyzz(*[F.col(f"velocity_beam{b}") for b in BEAMS])
    df = df.withColumns(dict(zip(names, xyzz)))

    for flag, comp in flags:
        if not options.get(flag):
            continue
        # through-water speed at the first bin of each ping, from the
        # CURRENT (possibly already-corrected) XYZZ — the reference
        # recomputes beam2xyzz before each component (:776-779)
        spd = F.sqrt(
            F.col("x4") ** 2
            + F.col("y4") ** 2
            + ((F.col("z4") + F.col("zz4")) / F.lit(2.0)) ** 2
        )
        spd0 = (
            df.withColumn("__spd", spd)
            .groupBy(*mission_part, "time_us")
            .agg(F.min_by("__spd", F.col("bin")).alias("__spd0"))
        )
        sel = df.join(
            spd0.filter((F.col("__spd0") > lo) & (F.col("__spd0") < hi)).drop("__spd0"),
            [*mission_part, "time_us"],
            "inner",
        )
        dv = W.diff(comp, [*mission_part, "time_us"], ["bin"])
        sel_agg = (
            sel.withColumn("__dv", dv)
            .groupBy(*mission_part, "bin")
            .agg(F.avg("__dv").alias("__mean_dv"))
        )
        # keep the FULL bin axis (xarray keeps all bins; mean over an empty
        # selection is NaN per bin, first bin still gets the inserted 0)
        per_bin = (
            df.select(*mission_part, "bin")
            .distinct()
            .join(sel_agg, [*mission_part, "bin"], "left")
        )
        # cumsum with leading 0 + NaN propagation + demean, over |bins| rows
        wb = (
            (Window.partitionBy(*mission_part) if mission_part else Window.partitionBy())
            .orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_all = Window.partitionBy(*mission_part) if mission_part else Window.partitionBy()
        first_bin = F.min("bin").over(w_all)
        csum = F.sum(F.coalesce("__mean_dv", F.lit(0.0))).over(wb)
        poisoned = F.max(
            F.when(F.col("__mean_dv").isNull() & (F.col("bin") > first_bin), 1).otherwise(0)
        ).over(wb)
        corr = per_bin.withColumn(
            "__corr_raw", F.when(poisoned == 1, F.lit(None)).otherwise(csum)
        )
        corr = corr.withColumn(
            "__corr", F.col("__corr_raw") - F.avg("__corr_raw").over(w_all)
        ).select(*mission_part, "bin", "__corr")
        # NULL correction propagates (reference: NaN - NaN), so no coalesce
        df = (
            df.join(F.broadcast(corr), [*mission_part, "bin"], "left")
            .withColumn(comp, F.col(comp) - F.col("__corr"))
            .drop("__corr")
        )
    beams_back = M.xyzz2beam(*[F.col(n) for n in names])
    df = df.withColumns({f"velocity_beam{b}": e for b, e in zip(BEAMS, beams_back)})
    return df.drop(*names)


def correct_backscatter(df: DataFrame, options: dict) -> DataFrame:
    """F8+F9 (reference correct_backscatter :787-873): α from
    Francois–Garrison at 1000 kHz with glider S/T and ping depth; per-beam
    slant ranges; Amp_new = Amp + 2·α·R."""
    alpha = M.francois_garrison(
        1000.0, F.col("salinity"), F.col("temperature"), 8.1, F.col("depth")
    )
    df = df.withColumn("acoustic_attenuation", alpha)
    cos_a = F.cos(F.radians(F.lit(47.4)))  # reference :841 uses 47.4 here
    cos_b = F.cos(F.radians(F.lit(25.0)))
    for b in BEAMS:
        rng = F.col("velocity_range") / (cos_a if b in (1, 3) else cos_b)
        df = df.withColumn(
            f"amplitude_new{b}",
            M.backscatter_correction(F.col(f"amplitude_beam{b}"), F.col("acoustic_attenuation"), rng),
        )
    return df


def ladder_from_bin_means(
    means: np.ndarray, attrs: dict, options: dict
) -> np.ndarray:
    """Driver-side half of :func:`regrid_ladder`: given the (n_bins × 4)
    per-bin beam-correlation means (rows in bin order), pick the bin
    nearest the threshold and lay the half-cell ladder (reference
    calc_ideal_depth_offsets :882-916). Split out so the fleet path can
    compute ALL missions' bin means in one batched job
    (pipeline/fleet.py::fleet_shear) and reuse this arithmetic."""
    cell_size = float(attrs["avg_cellSize"])
    blanking = float(attrs["avg_blankingDistance"])
    thr = float(options["ADCP_regrid_correlation_threshold"])
    overall = np.nanmean(means, axis=1)
    max_bin = int(np.argmin(np.abs(overall - thr)))
    max_distance = blanking + max_bin * cell_size + 0.5 * cell_size
    direction = 1.0 if options["top_mounted"] else -1.0
    return np.arange(0, max_distance + cell_size, cell_size / 2) * direction


def regrid_ladder(df: DataFrame, attrs: dict, options: dict) -> np.ndarray:
    """Collect boundary: the depth-offset ladder (reference
    calc_ideal_depth_offsets :882-916) — per-bin mean correlation over the
    4 beams, pick the bin nearest the threshold, ladder spacing =
    cell_size/2, signed by mount direction."""
    per_bin = (
        df.groupBy("bin")
        .agg(*[F.avg(f"correlation_beam{b}").alias(f"m{b}") for b in BEAMS])
        .orderBy("bin")
        .collect()
    )
    means = np.array([[r[f"m{b}"] if r[f"m{b}"] is not None else np.nan for b in BEAMS] for r in per_bin])
    return ladder_from_bin_means(means, attrs, options)


# per-ping columns carried through the regrid into the gridded table
PING_CARRY = [
    "pressure", "depth", "pitch", "roll", "heading", "latitude", "longitude",
    "profile_number", "salinity",
]


def regrid_cells(df: DataFrame, depth_offsets: np.ndarray, options: dict) -> DataFrame:
    """R1 (reference regridADCPdata :876-981): per ping, interpolate each
    beam's velocity from its own per-cell offset axis (Depth − D_b =
    direction·range·cos θ_b) onto the fixed ladder.

    Physical strategy: repartition by ping, sort within partitions, stream
    ``mapInPandas`` with a carry buffer for pings split across Arrow batch
    boundaries — the per-group Python round-trip of applyInPandas costs
    ~2 ms and pings are the HIGH-cardinality axis (~10⁵/mission), so
    amortizing it over whole batches is a ~3× win (same pattern as
    operators/regrid.py). All worker helpers are nested defs (cloudpickle
    by value — workers don't see this package on sys.path)."""
    offsets = np.asarray(depth_offsets, dtype=np.float64)
    n_off = len(offsets)
    beams = tuple(BEAMS)
    carry_cols = list(PING_CARRY)

    work = df.select(
        "time_us", "bin", *PING_CARRY,
        *[F.col(f"velocity_beam{b}") for b in BEAMS],
        *[(F.col("depth") - F.col(f"d{b}")).alias(f"x{b}") for b in BEAMS],
    ).withColumn("profile_number", F.col("profile_number").cast("double"))
    # profile_number carried as double for gridding parity with the
    # reference's float coordinates

    schema = StructType(
        [StructField("time_us", LongType(), False), StructField("gridded_bin", IntegerType(), False)]
        + [StructField(c, DoubleType(), True) for c in PING_CARRY]
        + [StructField(f"v{b}", DoubleType(), True) for b in BEAMS]
        + [StructField("depth_offset", DoubleType(), False), StructField("bin_depth", DoubleType(), True)]
    )

    def process(body: pd.DataFrame) -> pd.DataFrame:
        # whole-batch vectorized form of the per-ping interpolation: one
        # preallocated array set per batch instead of one pandas frame
        # per ping + concat (the ~10⁵-pings/mission frame churn was the
        # measured hot spot of the shear stage). Per-ping np.interp math
        # and row order (pings in partition order × gridded_bin asc) are
        # IDENTICAL to the per-ping form.
        keys = body["time_us"].to_numpy()
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        ends = np.r_[starts[1:], len(keys)]
        n_pings = len(starts)
        total = n_pings * n_off
        out = {
            "time_us": np.repeat(keys[starts], n_off),
            "gridded_bin": np.tile(np.arange(n_off, dtype=np.int32), n_pings),
        }
        for c in carry_cols:
            vals = pd.to_numeric(body[c], errors="coerce").to_numpy(np.float64)
            out[c] = np.repeat(vals[starts], n_off)
        xs_all = {b: body[f"x{b}"].to_numpy(np.float64) for b in beams}
        ys_all = {b: body[f"velocity_beam{b}"].to_numpy(np.float64) for b in beams}
        vout = {b: np.full(total, np.nan) for b in beams}
        for i in range(n_pings):
            s, e, base = starts[i], ends[i], i * n_off
            for b in beams:
                x, y = xs_all[b][s:e], ys_all[b][s:e]
                gd = np.isfinite(x) & np.isfinite(y)
                if gd.sum() > 1:
                    order = np.argsort(x[gd], kind="stable")
                    xg, yg = x[gd][order], y[gd][order]
                    vi = np.interp(offsets, xg, yg)
                    vi[offsets < xg[0]] = np.nan
                    vi[offsets > xg[-1]] = np.nan
                    vout[b][base : base + n_off] = vi
        for b in beams:
            out[f"v{b}"] = vout[b]
        out["depth_offset"] = np.tile(offsets, n_pings)
        out["bin_depth"] = out["depth"] - out["depth_offset"]
        return pd.DataFrame(out)

    def per_partition(batches):
        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            keys = pdf["time_us"].to_numpy()
            tail_mask = keys == keys[-1]
            first_tail = len(pdf) - int(tail_mask[::-1].argmin() if not tail_mask.all() else len(pdf))
            carry = pdf.iloc[first_tail:]
            body = pdf.iloc[:first_tail]
            if len(body):
                yield process(body)
        if carry is not None and len(carry):
            yield process(carry)

    sorted_work = work.repartition("time_us").sortWithinPartitions("time_us", "bin")
    return sorted_work.mapInPandas(per_partition, schema)


def calc_xyz(df: DataFrame, options: dict) -> DataFrame:
    """F4 (reference calcXYZfrom3beam :984-1130) on the regridded beams."""
    xyz = M.xyz_from_3beam(
        F.col("v1"), F.col("v2"), F.col("v3"), F.col("v4"), F.col("pitch"), options["top_mounted"]
    )
    return df.withColumns(dict(zip(["x", "y", "z"], xyz)))


def calc_enu(df: DataFrame, options: dict) -> DataFrame:
    """F5 + W2 (reference calcENUfromXYZ :1133-1194): rotate to ENU, then
    shear = central difference over the gridded_bin index (xarray
    ``differentiate('gridded_bin')`` semantics — index coordinate, not
    depth)."""
    enu = M.xyz_to_enu(
        F.col("x"), F.col("y"), F.col("z"),
        F.col("heading"), F.col("pitch"), F.col("roll"), options["top_mounted"],
    )
    df = df.withColumns(dict(zip(["e", "n", "u"], enu)))
    gb = F.col("gridded_bin").cast("double")
    return df.withColumns(
        {
            f"sh_{c}": W.central_diff(c, gb, ["time_us"], ["gridded_bin"])
            for c in ("e", "n", "u")
        }
    )


def shear_from_adcp(
    cells: DataFrame,
    ping: DataFrame,
    glider: DataFrame,
    attrs: dict,
    options: dict,
) -> tuple[DataFrame, DataFrame, dict]:
    """Entry point 1 (reference shear_from_adcp :2046-2057).

    Returns (gridded_cells, ping_aug, options): gridded_cells is the long
    (time_us × gridded_bin) table with V1–4/X/Y/Z/E/N/U/Sh_E/Sh_N/Sh_U.

    Composition = :func:`shear_prepare` → ladder collect →
    :func:`shear_finish`; the split is the API seam for callers that
    supply a precomputed ladder (e.g. reusing a deployment's ladder
    across reprocessing runs) — a batched fleet-wide variant of the two
    driver actions was tried and measured SLOWER (one 32-branch union
    plan analyzes serially, while N small per-mission plans analyze
    concurrently from driver threads; see SCALING.md Round 9), so the
    per-mission composition stands.
    """
    df, ping_aug, options = shear_prepare(cells, ping, glider, attrs, options)
    ladder = regrid_ladder(df, attrs, options)
    return shear_finish(df, ping_aug, ladder, options), ping_aug, options


def shear_prepare(
    cells: DataFrame,
    ping: DataFrame,
    glider: DataFrame,
    attrs: dict,
    options: dict,
) -> tuple[DataFrame, DataFrame, dict]:
    """Lazy first phase of :func:`shear_from_adcp`: everything up to the
    regrid ladder's collect boundary. Issues NO Spark job when
    ``options['top_mounted']`` is preset (orientation detect is the only
    other eager action and it's gated on that key)."""
    ping_aug, options = align_glider_to_pings(ping, glider, options)
    ping_aug = correct_heading(ping_aug, options)
    df = build_cells(cells, ping_aug, attrs, options)
    df = soundspeed_correction(df)
    df = remove_outliers(df, options)
    df = correct_shear(df, ping_aug, options)
    df = correct_backscatter(df, options)
    return df, ping_aug, options


def shear_finish(
    df: DataFrame, ping_aug: DataFrame, ladder: np.ndarray, options: dict
) -> DataFrame:
    """Lazy second phase: regrid onto the (driver-computed) ladder, then
    beam→XYZ→ENU."""
    gridded = regrid_cells(df, ladder, options)
    gridded = calc_xyz(gridded, options)
    gridded = calc_enu(gridded, options)
    return gridded
