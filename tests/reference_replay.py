"""Independent numpy/pandas replay of the reference ADCP pipeline.

This module re-implements the reference's three-stage chain —
``shear_from_adcp`` → ``grid_shear`` → ``velocity_from_shear``
(/root/reference/seaexplorertools/process_adcp.py:2046-2083) — directly
from the reference source, sharing NOTHING with the engine package: no
imports from ``seaexplorertools_spark``, matrix-oriented (time × bin)
arrays exactly like the reference's xarray code, ``pd.cut``-based
gridding exactly like the reference's ``grid2d`` (:117-134).

It is the parity authority for ``tests/test_reference_replay.py``: the
expected values come from this code, the engine must match them at the
reference's own test tolerance (tests/test_adcp_processing.py:48:
``np.allclose(..., equal_nan=True, atol=1e-7, rtol=1e-3)``).

Library stand-ins (this container has neither xarray, scipy nor gsw —
the same absence the engine documents):

- ``gsw.z_from_p`` (:184) → Saunders (1981) closed form, the published
  UNESCO pressure→depth conversion. A formula choice shared WITH the
  engine by necessity, but written here independently.
- ``gsw.distance`` 1-degree factors (:1386-1387, :1438-1439) → the
  spherical constants the reference itself uses at :1244-1246
  (111319.444 m/deg lat, 40075000·cos(lat)/360 m/deg lon).
- ``scipy.interpolate.interp1d(bounds_error=False, fill_value=NaN)``
  (:144-146) → sorted ``np.interp`` with explicit NaN outside the hull.
- ``scipy.optimize.fmin`` (:1976) → a from-scratch 1-D Nelder–Mead with
  scipy's documented defaults (initial simplex [x0, 1.05·x0], standard
  reflect/expand/contract/shrink, xtol=1e-4, ftol as passed).

Fixture-model notes: the synthetic mission stores time in µs (the
reference's files are ns) — time arithmetic converts µs→s where the
reference converts ns→s; the fixture has no ``Velocity Range``
coordinate, so it is reconstructed as blanking + (bin+0.5)·cell_size,
the AD2CP cell-center convention the fixture was generated under.
"""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd


def _quiet_nan(fn, *args, **kw):
    """nan-reductions over all-NaN slices are expected at grid edges —
    run them without the RuntimeWarning noise (values stay NaN, exactly
    the reference's behavior)."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        return fn(*args, **kw)

M_PER_DEG_LAT = 111319.444  # reference :1245
M_PER_DEG_LON_EQ = 40075000.0 / 360.0  # reference :1246


# --------------------------------------------------------------- helpers
def interp_nan(x: np.ndarray, y: np.ndarray, xi: np.ndarray) -> np.ndarray:
    """Reference ``interp`` (:144-146): linear, NaN outside the finite
    hull, finite-pair filtered."""
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    gg = np.isfinite(x + y)
    if gg.sum() < 2:
        return np.full(np.shape(xi), np.nan)
    xs = x[gg]
    ys = y[gg]
    order = np.argsort(xs, kind="stable")
    xs, ys = xs[order], ys[order]
    out = np.interp(xi, xs, ys)
    out = np.where((xi < xs[0]) | (xi > xs[-1]), np.nan, out)
    return out


def saunders_depth(p_dbar: np.ndarray, lat_deg: np.ndarray) -> np.ndarray:
    """Saunders (1981): z = (1 − c1)·p − c2·p², c1 = (5.92 +
    5.25·sin²lat)·1e-3, c2 = 2.21e-6 (stand-in for -gsw.z_from_p)."""
    sin2 = np.sin(np.deg2rad(lat_deg)) ** 2
    c1 = (5.92 + 5.25 * sin2) * 1e-3
    return (1.0 - c1) * p_dbar - 2.21e-6 * p_dbar**2


def grid2d(x, y, v, xi, yi, fn="mean"):
    """Reference grid2d (:117-134) verbatim semantics: dropna the
    (x, y, v) triple, pd.cut onto the explicit edge arrays (right-closed,
    first edge excluded), group, aggregate, scatter into a NaN matrix of
    shape [len(yi), len(xi)]."""
    xi = np.asarray(xi, dtype=float)
    yi = np.asarray(yi, dtype=float)
    raw = pd.DataFrame(
        {"x": np.asarray(x, float), "y": np.asarray(y, float), "v": np.asarray(v, float)}
    ).dropna()
    grid = np.full([np.size(yi), np.size(xi)], np.nan)
    raw["xbins"] = pd.cut(raw.x, xi, labels=False)
    raw["ybins"] = pd.cut(raw.y, yi, labels=False)
    agg = raw.groupby(["xbins", "ybins"])["v"].agg(fn)
    grid[
        agg.index.get_level_values(1).astype(int),
        agg.index.get_level_values(0).astype(int),
    ] = agg.values
    return grid


def nelder_mead_1d(objective, x0: float, maxiter: int = 500, ftol: float = 1e-9,
                   xtol: float = 1e-9) -> float:
    """Scalar Nelder–Mead (scipy.optimize.fmin's scheme: initial simplex
    [x0, 1.05·x0] — or 0.00025 when x0 == 0 — and the and-combined
    xtol/ftol stop rule). Defaults here are TIGHTER than the reference's
    fmin call (ftol=1e-5, xtol=1e-4, maxiter=100): the replica pins the
    true minimum so the parity test compares the referencing math, not
    two minimizers' stopping slop. Near a smooth scalar minimum the
    looser reference tolerance permits ±1e-4 coefficient wobble, i.e.
    ±~1e-4·|cumsum(speed)| in ADCP_E/N — noise the reference's own
    rtol=1e-3 test absorbs but a sharper test should not inherit."""
    pts = [float(x0), float(x0) * 1.05 if x0 != 0 else 0.00025]
    fv = [objective(p) for p in pts]
    for _ in range(maxiter):
        if fv[1] < fv[0]:
            pts = pts[::-1]
            fv = fv[::-1]
        if abs(pts[1] - pts[0]) <= xtol * max(1e-12, abs(pts[0])) and (
            abs(fv[1] - fv[0]) <= ftol * max(1e-12, abs(fv[0]))
        ):
            break
        best, worst = pts[0], pts[1]
        xr = best + (best - worst)  # reflect through the best point
        fr = objective(xr)
        if fr < fv[0]:
            xe = best + 2.0 * (best - worst)
            fe = objective(xe)
            if fe < fr:
                pts[1], fv[1] = xe, fe
            else:
                pts[1], fv[1] = xr, fr
        elif fr < fv[1]:
            pts[1], fv[1] = xr, fr
        else:
            xc = best + 0.5 * (worst - best)
            fc = objective(xc)
            if fc < fv[1]:
                pts[1], fv[1] = xc, fc
            else:  # shrink toward the best point
                pts[1] = best + 0.5 * (pts[1] - best)
                fv[1] = objective(pts[1])
    return pts[0] if fv[0] <= fv[1] else pts[1]


# ------------------------------------------------------- stage 1: shear
def _pivot(cells: pd.DataFrame, col: str) -> np.ndarray:
    """(time_us, bin) long → [n_time, n_bin] matrix, time ascending."""
    return (
        cells.pivot(index="time_us", columns="bin", values=col)
        .sort_index()
        .to_numpy(float)
    )


def replay_shear_from_adcp(glider: pd.DataFrame, ping: pd.DataFrame,
                           cells: pd.DataFrame, attrs: dict, options: dict) -> dict:
    """Reference shear_from_adcp (:2046-2057) with correctADCPHeading
    False (correct_heading :459-461 is then a no-op — declination NOT
    added) and the shear-correction flags off (the reference test's own
    configuration). correct_backscatter only rewrites amplitudes
    (:843-873) and is skipped: no compared output depends on it."""
    ping = ping.sort_values("time_us").reset_index(drop=True)
    t_adcp = ping["time_us"].to_numpy(float)
    t_glider = glider["time_us"].to_numpy(float)

    # --- load_adcp_glider_data :169-213 — align glider onto ping times
    lat = interp_nan(t_glider, glider["latitude"].to_numpy(float), t_adcp)
    lon = interp_nan(t_glider, glider["longitude"].to_numpy(float), t_adcp)
    profile = np.round(
        interp_nan(t_glider, glider["profile_number"].to_numpy(float), t_adcp)
    )
    salinity = interp_nan(t_glider, glider["salinity"].to_numpy(float), t_adcp)
    glider_ss = interp_nan(t_glider, glider["soundspeed"].to_numpy(float), t_adcp)
    depth = saunders_depth(ping["pressure"].to_numpy(float), lat)

    top_mounted = ping["magnetometer_z"].to_numpy(float).mean() < 0  # :210-213
    direction = 1.0 if top_mounted else -1.0

    pitch = ping["pitch"].to_numpy(float)
    roll = ping["roll"].to_numpy(float)
    heading = ping["heading"].to_numpy(float)  # uncorrected: flag False

    # --- remapADCPdepth :224-310
    n_bins = int(cells["bin"].max()) + 1
    cell_size = float(attrs["avg_cellSize"])
    blanking = float(attrs["avg_blankingDistance"])
    vel_range = blanking + (np.arange(n_bins) + 0.5) * cell_size
    d2r = np.deg2rad
    if top_mounted:
        th1 = np.arccos(np.cos(d2r(47.5 - pitch)) * np.cos(d2r(roll)))
        th2 = np.arccos(np.cos(d2r(25 - roll)) * np.cos(d2r(pitch)))
        th3 = np.arccos(np.cos(d2r(47.5 + pitch)) * np.cos(d2r(roll)))
        th4 = np.arccos(np.cos(d2r(25 + roll)) * np.cos(d2r(pitch)))
    else:
        th1 = np.arccos(np.cos(d2r(47.5 + pitch)) * np.cos(d2r(roll)))
        th2 = np.arccos(np.cos(d2r(25 + roll)) * np.cos(d2r(pitch)))
        th3 = np.arccos(np.cos(d2r(47.5 - pitch)) * np.cos(d2r(roll)))
        th4 = np.arccos(np.cos(d2r(25 - roll)) * np.cos(d2r(pitch)))
    thetas = [th1, th2, th3, th4]
    D = {
        b: depth[:, None] - direction * vel_range[None, :] * np.cos(thetas[b - 1])[:, None]
        for b in (1, 2, 3, 4)
    }

    V = {b: _pivot(cells, f"velocity_beam{b}") for b in (1, 2, 3, 4)}
    C = {b: _pivot(cells, f"correlation_beam{b}") for b in (1, 2, 3, 4)}
    A = {b: _pivot(cells, f"amplitude_beam{b}") for b in (1, 2, 3, 4)}

    # --- soundspeed_correction :464-475: V *= c_glider / c_instrument
    c_old = ping["speed_of_sound"].to_numpy(float)
    ratio = (glider_ss / c_old)[:, None]
    for b in (1, 2, 3, 4):
        V[b] = V[b] * ratio

    # --- remove_outliers :478-566: C<thr, A>thr, |V|>thr → NaN masks
    for b in (1, 2, 3, 4):
        cm = np.where(C[b] < options["correlationThreshold"], np.nan, 1.0)
        am = np.where(A[b] > options["ampThreshold"], np.nan, 1.0)
        vm = np.where(np.abs(V[b]) > options["velocityThreshold"], np.nan, 1.0)
        V[b] = V[b] * cm * am * vm

    # --- correct_shear :771-784 (no-op unless a correct*shear flag is on)
    V = replay_correct_shear(V, options)

    # --- regridADCPdata :876-981
    thr = options["ADCP_regrid_correlation_threshold"]
    means = [np.nanmean(C[b], axis=0) for b in (1, 2, 3, 4)]
    max_bin = int(np.argmin(np.abs(np.nanmean(means, axis=0) - thr)))
    max_distance = blanking + max_bin * cell_size + 0.5 * cell_size
    offsets = np.arange(0, max_distance + cell_size, cell_size / 2) * direction
    n_off = len(offsets)
    n_t = len(t_adcp)

    VG = {}
    for b in (1, 2, 3, 4):
        x2 = depth[:, None] - D[b]  # = direction·range·cosθ_b
        out = np.full((n_t, n_off), np.nan)
        for i in range(n_t):
            yrow = V[b][i]
            gd = np.isfinite(yrow)  # reference gates on y only (:930)
            if np.count_nonzero(gd) > 1:
                xs = x2[i][gd]
                ys = yrow[gd]
                o = np.argsort(xs, kind="stable")
                xs, ys = xs[o], ys[o]
                vi = np.interp(offsets, xs, ys)
                vi[(offsets < xs[0]) | (offsets > xs[-1])] = np.nan
                out[i] = vi
        VG[b] = out
    bin_depth = depth[:, None] - offsets[None, :]

    # --- calcXYZfrom3beam :984-1130
    tf, ts = 47.5, 25.0
    sin = lambda t: np.sin(np.deg2rad(t))  # noqa: E731
    cos = lambda t: np.cos(np.deg2rad(t))  # noqa: E731
    a = lambda t: 1 / (2 * sin(t))  # noqa: E731
    bb = lambda t: 1 / (4 * cos(t))  # noqa: E731
    V1, V2, V3, V4 = VG[1].copy(), VG[2], VG[3].copy(), VG[4]
    replaced_by = lambda g: (2 * bb(ts) * V2 + 2 * bb(ts) * V4 - 2 * bb(tf) * g) / (2 * bb(tf))  # noqa: E731
    upcasts = pitch > 0
    downcasts = ~upcasts
    if top_mounted:
        V1[downcasts, :] = replaced_by(V3)[downcasts, :]
        V3[upcasts, :] = replaced_by(V1)[upcasts, :]
    else:
        V1[upcasts, :] = replaced_by(V3)[upcasts, :]
        V3[downcasts, :] = replaced_by(V1)[downcasts, :]
    X = a(tf) * V1 - a(tf) * V3
    Y = -a(ts) * V2 + a(ts) * V4
    Z = 2 * bb(ts) * V2 + 2 * bb(ts) * V4

    # --- calcENUfromXYZ :1133-1194
    hh = np.pi * (heading - 90) / 180
    pp = np.pi * pitch / 180
    rr = np.pi * roll / 180
    M00 = np.cos(hh) * np.cos(pp)
    M01 = -np.cos(hh) * np.sin(pp) * np.sin(rr) + np.sin(hh) * np.cos(rr)
    M02 = -np.cos(hh) * np.sin(pp) * np.cos(rr) - np.sin(hh) * np.sin(rr)
    M10 = -np.sin(hh) * np.cos(pp)
    M11 = np.sin(hh) * np.sin(pp) * np.sin(rr) + np.cos(hh) * np.cos(rr)
    M12 = np.sin(hh) * np.sin(pp) * np.cos(rr) - np.cos(hh) * np.sin(rr)
    M20 = np.sin(pp)
    M21 = np.cos(pp) * np.sin(rr)
    M22 = np.cos(pp) * np.cos(rr)
    dcol = lambda m: m[:, None]  # noqa: E731
    E = dcol(M00) * X + dcol(M01) * Y * direction + dcol(M02) * Z * direction
    N = dcol(M10) * X + dcol(M11) * Y * direction + dcol(M12) * Z * direction
    U = dcol(M20) * X + dcol(M21) * Y * direction + dcol(M22) * Z * direction

    # shear = differentiate('gridded_bin'): np.gradient on the 0..n-1
    # index coordinate (unit spacing), per ping
    Sh_E = np.gradient(E, axis=1)
    Sh_N = np.gradient(N, axis=1)
    Sh_U = np.gradient(U, axis=1)

    return {
        "time_us": ping["time_us"].to_numpy(np.int64),
        "profile": profile,
        "depth": depth,
        "bin_depth": bin_depth,
        "pressure": ping["pressure"].to_numpy(float),
        "heading": heading,
        "pitch": pitch,
        "roll": roll,
        "lat": lat,
        "lon": lon,
        "salinity": salinity,
        "glider_soundspeed": glider_ss,
        "offsets": offsets,
        "Sh_E": Sh_E,
        "Sh_N": Sh_N,
        "Sh_U": Sh_U,
        "E": E,
        "N": N,
        "U": U,
        "top_mounted": top_mounted,
    }


# ---------------------------------------------------------- grid axes
def grid_axes(glider: pd.DataFrame, y_res: float = 1.0):
    """Reference grid_shear_data :1651-1653: yaxis = arange(0,
    max(ceil(pressure)), y_res); xaxis = unique profile numbers."""
    yaxis = np.arange(0, np.nanmax(np.ceil(glider["pressure"].to_numpy(float))), y_res)
    xaxis = (
        glider["time_us"].astype(float).groupby(glider["profile_number"]).agg("mean").index.to_numpy(float)
    )
    return xaxis, yaxis


def replay_grid_shear(adcp: dict, glider: pd.DataFrame, options: dict) -> dict:
    """Reference grid_shear (:2060-2064) restricted to the compared
    variables: the three shear grids (grid_data :1820-1830)."""
    xaxis, yaxis = grid_axes(glider, options.get("y_res", 1.0))
    pnum = np.tile(adcp["profile"], (adcp["Sh_E"].shape[1], 1)).T
    out = {}
    for letter in ("E", "N", "U"):
        out["Sh_" + letter] = grid2d(
            pnum.flatten(),
            adcp["bin_depth"].flatten(),
            adcp["Sh_" + letter].flatten(),
            xi=xaxis, yi=yaxis, fn="mean",
        )
    out["xaxis"], out["yaxis"] = xaxis, yaxis
    return out


# ------------------------------------------------- stage 3: velocity
def replay_get_dac(adcp: dict, glider: pd.DataFrame) -> pd.DataFrame:
    """Reference get_DAC :1327-1432 on the fixture glider table. Returns
    the glider frame with speed_e/speed_n/DAC_E/DAC_N columns added."""
    glider = glider.sort_values("time_us").reset_index(drop=True)
    _gps = (glider["DeadReckoning"].to_numpy() < 1) & (
        glider["NAV_RESOURCE"].to_numpy() == 116
    )
    t = glider["time_us"].to_numpy(float) * 1e-6  # µs → s (reference: ns → s)
    heading = interp_nan(
        adcp["time_us"].astype(float), adcp["heading"], glider["time_us"].to_numpy(float)
    )
    sp = glider["speed_horz"].to_numpy(float)
    vg_e = np.nan_to_num(sp * np.sin(heading * np.pi / 180))
    vg_n = np.nan_to_num(sp * np.cos(heading * np.pi / 180))
    glider = glider.copy()
    glider["speed_e"] = vg_e
    glider["speed_n"] = vg_n

    de = np.cumsum(np.append(0, vg_e[1:] * np.diff(t)))
    dn = np.cumsum(np.append(0, vg_n[1:] * np.diff(t)))

    def reset_at_gps(arr):
        ref = np.full_like(arr, np.nan)
        ref[_gps] = arr[_gps]
        filled = pd.Series(ref).ffill().to_numpy()
        return arr - filled

    de = reset_at_gps(de)
    dn = reset_at_gps(dn)

    dive = glider["diveNum"].to_numpy()
    dnum = np.unique(dive)
    sidx = np.full(dnum.shape, np.nan)
    didx = np.full(dnum.shape, np.nan)
    for idx, dx in enumerate(dnum):
        hits = np.flatnonzero((dive == dx) & _gps)
        if len(hits):
            sidx[idx] = hits[0]
            didx[idx] = hits[-1]
    gd = np.isfinite(sidx + didx + dnum)
    dnum, sidx, didx = dnum[gd], sidx[gd].astype(int), didx[gd].astype(int)

    lats = glider["latitude"].to_numpy(float)
    lons = glider["longitude"].to_numpy(float)
    surf_lat, surf_lon, surf_t = lats[sidx], lons[sidx], t[sidx]
    dive_lat, dive_lon, dive_t = lats[didx], lons[didx], t[didx]

    lon2m = lambda lo, la: M_PER_DEG_LON_EQ * np.cos(np.deg2rad(la))  # noqa: E731
    lat2m = lambda lo, la: M_PER_DEG_LAT  # noqa: E731

    n = len(dnum)
    dr_e = np.full(n, np.nan)
    dr_n = np.full(n, np.nan)
    gps_e = np.full(n, np.nan)
    gps_n = np.full(n, np.nan)
    dt_d = np.full(n, np.nan)
    meant = np.full(n, np.nan)
    for idx in range(n - 1):  # the reference's try/except drops the last dive
        dr_e[idx] = de[sidx[idx + 1] - 1]
        dr_n[idx] = dn[sidx[idx + 1] - 1]
        gps_e[idx] = (surf_lon[idx + 1] - dive_lon[idx]) * lon2m(dive_lon[idx], dive_lat[idx])
        gps_n[idx] = (surf_lat[idx + 1] - dive_lat[idx]) * lat2m(dive_lon[idx], dive_lat[idx])
        dt_d[idx] = surf_t[idx + 1] - dive_t[idx]
        meant[idx] = (surf_t[idx + 1] + dive_t[idx]) / 2

    glider["DAC_E"] = interp_nan(meant, (gps_e - dr_e) / dt_d, t)
    glider["DAC_N"] = interp_nan(meant, (gps_n - dr_n) / dt_d, t)
    glider["DAC_E"] = glider["DAC_E"].bfill().ffill()
    glider["DAC_N"] = glider["DAC_N"].bfill().ffill()
    return glider


def replay_surface_drift(glider: pd.DataFrame):
    """Reference getSurfaceDrift :1435-1477: per-dive medians of GPS-fix
    drift gradients, gaps < 21 s. Returns (dE, dN, dT_seconds)."""
    _gps = (glider["DeadReckoning"].to_numpy() < 1) & (
        glider["NAV_RESOURCE"].to_numpy() == 116
    )
    dnum = glider["diveNum"].to_numpy()[_gps]
    lons = glider["longitude"].to_numpy(float)[_gps]
    lats = glider["latitude"].to_numpy(float)[_gps]
    dlons = np.gradient(lons) * (M_PER_DEG_LON_EQ * np.cos(np.deg2rad(lats)))
    dlats = np.gradient(lats) * M_PER_DEG_LAT
    times = glider["time_us"].to_numpy(float)[_gps] / 1e6
    dtimes = np.gradient(times)
    n = int(np.nanmax(glider["diveNum"].to_numpy()))
    dE = np.full(n, np.nan)
    dN = np.full(n, np.nan)
    dT = np.full(n, np.nan)
    for idx in range(n):
        gd = (dtimes < 21) & (dnum == idx + 1)
        if gd.any():
            dE[idx] = np.nanmedian(dlons[gd] / dtimes[gd])
            dN[idx] = np.nanmedian(dlats[gd] / dtimes[gd])
            dT[idx] = np.nanmean(times[gd])
    return dE, dN, dT


def replay_bottom_track(adcp: dict, bt: pd.DataFrame, options_top_mounted: bool):
    """Reference bottom_track :1480-1597. Returns (bt_e, bt_n, bt_u)
    arrays over the ping axis (NaN where no BT row scattered back)."""
    full_time = adcp["time_us"].astype(float)
    n_pings = len(full_time)
    nanrow = np.full(n_pings, np.nan)
    if options_top_mounted:
        return nanrow, nanrow.copy(), nanrow.copy()

    bt = bt.sort_values("time_us").reset_index(drop=True)
    bt = bt[bt["time_us"].to_numpy(float) < full_time[-1]]  # :1495
    thresh = 12.0
    keep = (
        (bt["velocity_beam1"] > -2) & (bt["velocity_beam2"] > -2) & (bt["velocity_beam4"] > -2)
        & (bt["fom_beam1"] < thresh) & (bt["fom_beam2"] < thresh) & (bt["fom_beam4"] < thresh)
    )
    bt = bt[keep.to_numpy()].reset_index(drop=True)

    bt_time = bt["time_us"].to_numpy(float)
    matching = np.array(
        [int(np.argmin(np.abs(ti - full_time))) for ti in bt_time], dtype=int
    )

    # per-profile max pressure scattered over pings (:1508-1517)
    prof = adcp["profile"]
    press = adcp["pressure"].copy()
    for p in np.unique(prof[np.isfinite(prof)]):
        gd = prof == p
        press[gd] = np.nanmax(press[gd])
    gate = np.abs(press[matching] - bt["pressure"].to_numpy(float)) < 15
    bt = bt[gate].reset_index(drop=True)
    bt_time = bt["time_us"].to_numpy(float)
    matching = np.array(
        [int(np.argmin(np.abs(ti - full_time))) for ti in bt_time], dtype=int
    )

    c_old = bt["speed_of_sound"].to_numpy(float)
    c_new = adcp["glider_soundspeed"][matching]

    sin = lambda t: np.sin(np.deg2rad(t))  # noqa: E731
    cos = lambda t: np.cos(np.deg2rad(t))  # noqa: E731
    a, b = 47.5, 25.0
    xyz2beam = np.array([
        [sin(a), 0, cos(a)],
        [0, -sin(b), cos(b)],
        [0, sin(b), cos(b)],
    ])
    beam2xyz = np.linalg.inv(xyz2beam)
    ratio = c_new / c_old
    bx, by, bz = beam2xyz @ np.array([
        bt["velocity_beam1"].to_numpy(float) * ratio,
        bt["velocity_beam2"].to_numpy(float) * ratio,
        bt["velocity_beam4"].to_numpy(float) * ratio,
    ])

    H = bt["heading"].to_numpy(float)
    P = bt["pitch"].to_numpy(float)
    R = bt["roll"].to_numpy(float)
    direction = -1.0  # bottom-mounted branch only reaches here
    BT_E = np.full_like(H, np.nan)
    BT_N = np.full_like(H, np.nan)
    BT_U = np.full_like(H, np.nan)
    for i in range(len(H)):
        hh = np.pi * (H[i] - 90) / 180
        pp = np.pi * P[i] / 180
        rr = np.pi * R[i] / 180
        _H = np.array([[np.cos(hh), np.sin(hh), 0], [-np.sin(hh), np.cos(hh), 0], [0, 0, 1]])
        _P = np.array([[np.cos(pp), 0, -np.sin(pp)], [0, 1, 0], [np.sin(pp), 0, np.cos(pp)]])
        _R = np.array([[1, 0, 0], [0, np.cos(rr), -np.sin(rr)], [0, np.sin(rr), np.cos(rr)]])
        BT_E[i], BT_N[i], BT_U[i] = (_H @ _P @ _R) @ [bx[i], by[i] * direction, bz[i] * direction]

    bt_e, bt_n, bt_u = nanrow.copy(), nanrow.copy(), nanrow.copy()
    bt_e[matching] = BT_E  # last write wins on duplicate matches (:1586-1595)
    bt_n[matching] = BT_N
    bt_u[matching] = BT_U
    return bt_e, bt_n, bt_u


def replay_reference_shear(adcp: dict, glider: pd.DataFrame, xaxis, yaxis,
                           y_res: float = 1.0) -> dict:
    """Reference reference_shear :1658-1717 for E and N."""
    out = {}
    pnum_g = glider["profile_number"].to_numpy(float)
    press_g = glider["pressure"].to_numpy(float)
    pnum_a = np.tile(adcp["profile"], (adcp["Sh_E"].shape[1], 1)).T
    for letter in ("E", "N"):
        Sh = grid2d(
            pnum_a.flatten(), adcp["bin_depth"].flatten(),
            adcp["Sh_" + letter].flatten(), xi=xaxis, yi=yaxis, fn="mean",
        )
        bd = ~np.isfinite(Sh)
        V = np.cumsum(np.nan_to_num(Sh), axis=0) * y_res
        V[bd] = np.nan
        with np.errstate(invalid="ignore"):
            V = V - np.tile(_quiet_nan(np.nanmean, V, axis=0), (V.shape[0], 1))
        DAC = grid2d(pnum_g, press_g, glider["DAC_" + letter].to_numpy(float),
                     xi=xaxis, yi=yaxis, fn="mean")
        dPdz = grid2d(pnum_g, press_g, glider["speed_vert"].to_numpy(float),
                      xi=xaxis, yi=yaxis, fn="mean")
        with np.errstate(divide="ignore", invalid="ignore"):
            SpB = y_res / dPdz
        SpB[np.isinf(SpB)] = 0
        SpB_std = np.nanstd(SpB.flatten())
        SpB[np.abs(SpB) > SpB_std] = SpB_std
        with np.errstate(invalid="ignore"):
            Ref = _quiet_nan(np.nanmean, DAC, axis=0) - np.nansum(V * SpB, axis=0) / np.nansum(SpB, axis=0)
        V = V + np.tile(Ref, (V.shape[0], 1))
        out["ADCP_" + letter] = V
    return out


def replay_calc_bias(out: dict, glider: pd.DataFrame, xaxis, yaxis) -> dict:
    """Reference calc_bias :1954-1984: scalar Nelder–Mead over the bias
    coefficient; speed_e/speed_n gridded like _grid_glider_data (mean)."""
    pnum_g = glider["profile_number"].to_numpy(float)
    press_g = glider["pressure"].to_numpy(float)
    speed_e = grid2d(pnum_g, press_g, glider["speed_e"].to_numpy(float),
                     xi=xaxis, yi=yaxis, fn="mean")
    speed_n = grid2d(pnum_g, press_g, glider["speed_n"].to_numpy(float),
                     xi=xaxis, yi=yaxis, fn="mean")

    def get_bias(gspeed, coeff):
        r = gspeed.shape[0]
        bias = np.nancumsum(gspeed, axis=0)
        bias[~np.isfinite(gspeed)] = np.nan
        with np.errstate(invalid="ignore"):
            bias = bias - np.tile(_quiet_nan(np.nanmean, bias, axis=0), [r, 1])
        return bias * coeff

    def score(E, N):
        with np.errstate(invalid="ignore"):
            rmsd_h = lambda x: np.sqrt(_quiet_nan(np.nanmean, x**2, axis=1))  # noqa: E731
            return np.sqrt(np.nanmean((rmsd_h(E) + rmsd_h(N)) ** 2)) * 1e6

    def fn(coeff):
        return score(out["ADCP_E"] + get_bias(speed_e, coeff),
                     out["ADCP_N"] + get_bias(speed_n, coeff))

    coeff = nelder_mead_1d(fn, 1.0)
    return {
        "ADCP_E": out["ADCP_E"] + get_bias(speed_e, coeff),
        "ADCP_N": out["ADCP_N"] + get_bias(speed_n, coeff),
        "coeff": coeff,
    }


def replay_velocity_from_shear(adcp: dict, glider: pd.DataFrame, bt: pd.DataFrame,
                               options: dict) -> dict:
    """Reference velocity_from_shear (:2067-2083): DAC → drift → bottom
    track → referenced shear → bias fit. Drift and bottom track feed only
    diagnostics in the reference; they are computed here for their own
    parity checks but do not influence ADCP_E/N."""
    y_res = float(options.get("y_res", 1.0))
    xaxis, yaxis = grid_axes(glider, y_res)
    glider_dac = replay_get_dac(adcp, glider)
    dE, dN, dT = replay_surface_drift(glider_dac)
    bt_e, bt_n, bt_u = replay_bottom_track(adcp, bt, adcp["top_mounted"])
    out = replay_reference_shear(adcp, glider_dac, xaxis, yaxis, y_res)
    out = replay_calc_bias(out, glider_dac, xaxis, yaxis)
    out.update(
        {
            "xaxis": xaxis, "yaxis": yaxis,
            "glider_dac": glider_dac,
            "drift": (dE, dN, dT),
            "bt": (bt_e, bt_n, bt_u),
        }
    )
    return out


# ------------------------------------------------- optional: correct_shear
_XYZZ_T = np.array([
    [0.6782, 0.0, -0.6782, 0.0],
    [0.0, -1.1831, 0.0, 1.1831],
    [0.7400, 0.0, 0.7400, 0.0],
    [0.0, 0.5518, 0.0, 0.5518],
])  # reference quad_beam2xyzz_mat :595-615


def replay_correct_shear(V: dict, options: dict) -> dict:
    """Reference correct_shear (:771-784) + _shear_correction (:682-768):
    per enabled component (ZZ4, Z4, Y4, X4 in that order), recompute XYZZ
    from the CURRENT beams, select pings whose FIRST-bin through-water
    speed lies strictly inside (0.2, arange(0.2,0.3,0.01)[-1]), average the
    per-ping bin difference of the component over those pings, cumsum with
    a leading 0 (NaN poisons deeper bins), demean, subtract from every
    ping, convert back to beams. ``V`` maps beam number -> [time, bin]
    matrix and is modified COPY-wise (returns a new dict)."""
    flags = [
        ("correctZZshear", 3), ("correctZshear", 2),
        ("correctYshear", 1), ("correctXshear", 0),
    ]
    if not any(options.get(k) for k, _ in flags):
        return V
    band = np.arange(0.2, 0.3, 0.01)
    lo, hi = float(band[0]), float(band[-1])
    Vb = {b: V[b].copy() for b in (1, 2, 3, 4)}
    Tinv = np.linalg.inv(_XYZZ_T)
    for flag, comp_idx in flags:
        if not options.get(flag):
            continue
        stack = np.stack([Vb[1], Vb[2], Vb[3], Vb[4]])  # [4, time, bin]
        xyzz = np.einsum("ij,jtb->itb", _XYZZ_T, stack)
        x4, y4, z4, zz4 = xyzz
        spd = np.sqrt(x4**2 + y4**2 + ((z4 + zz4) / 2) ** 2)[:, 0]  # first bin
        sel = (spd > lo) & (spd < hi)
        comp = xyzz[comp_idx]
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            mean_dv = np.nanmean(np.diff(comp[sel], axis=1), axis=0)
        ref = np.cumsum(np.insert(mean_dv, 0, 0))  # NaN propagates downward
        ref = ref - _quiet_nan(np.nanmean, ref)
        xyzz[comp_idx] = comp - ref[None, :]
        back = np.einsum("ij,jtb->itb", Tinv, xyzz)
        Vb = {b: back[b - 1] for b in (1, 2, 3, 4)}
    return Vb
