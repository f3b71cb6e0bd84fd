"""S2/S3 — NetCDF AD2CP ingestion (reference xr.open_mfdataset,
process_adcp.py:161-163 group 'Data/Average', :1494 group 'Data/AverageBT').

Spark has no NetCDF data source; the engine's design is a ONE-TIME ingestion
converting each NetCDF group to long-format Parquet (ingestion tool, not a
query operator — SURVEY §2.1 S2). The long-format layout it produces is
exactly ``model.ADCP_CELLS_SCHEMA`` / ``ADCP_PING_SCHEMA`` /
``ADCP_BT_SCHEMA``, which the pipeline consumes from Parquet.

Two backends, same group→long mapping:

- **xarray/netCDF4** (the reference's own format — NetCDF4/HDF5 groups)
  when those libraries are importable;
- **pure-python NetCDF3 classic** (``netcdf3.py``) otherwise, using the
  flattening convention ``Data/Average`` → variable prefix
  ``Data_Average_`` and ``Config`` attrs → global attrs ``Config_*``.

At 100 TB: one file → one ingestion task (embarrassingly parallel via
``spark.createDataFrame(paths).mapInPandas(convert)``); output partitioned
by mission/day.
"""

from __future__ import annotations

import json
from glob import glob

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

PING_VARS = {
    "Pressure": "pressure",
    "Pitch": "pitch",
    "Roll": "roll",
    "Heading": "heading",
    "MagnetometerX": "magnetometer_x",
    "MagnetometerY": "magnetometer_y",
    "MagnetometerZ": "magnetometer_z",
    "SpeedOfSound": "speed_of_sound",
}
CELL_VARS = {
    **{f"VelocityBeam{b}": f"velocity_beam{b}" for b in (1, 2, 3, 4)},
    **{f"CorrelationBeam{b}": f"correlation_beam{b}" for b in (1, 2, 3, 4)},
    **{f"AmplitudeBeam{b}": f"amplitude_beam{b}" for b in (1, 2, 3, 4)},
}
BT_VARS = {
    **{f"VelocityBeam{b}": f"velocity_beam{b}" for b in (1, 2, 4)},
    **{f"FOMBeam{b}": f"fom_beam{b}" for b in (1, 2, 4)},
    "Pressure": "pressure",
    "SpeedOfSound": "speed_of_sound",
    "Heading": "heading",
    "Pitch": "pitch",
    "Roll": "roll",
}


def have_netcdf() -> bool:
    try:
        import xarray  # noqa: F401

        return True
    except ImportError:
        return False


def _time_to_us(arr: np.ndarray) -> np.ndarray:
    """datetime64 (xarray) or numeric epoch-µs (classic fallback) → int64 µs."""
    if np.issubdtype(arr.dtype, np.datetime64):
        return arr.astype("datetime64[us]").astype("int64")
    return np.asarray(arr).astype("int64")


def _read_group(paths: list[str], group: str) -> dict[str, np.ndarray]:
    """Variables of ``group`` concatenated over ``paths`` along time.

    xarray backend opens the real NetCDF4 group; the classic fallback
    selects prefix-flattened variables (``Data/Average`` →
    ``Data_Average_*``). Returns {} when the group is absent everywhere.
    """
    if have_netcdf():
        import xarray as xr

        try:
            ds = xr.open_mfdataset(paths, group=group)
        except (OSError, KeyError, ValueError):
            return {}
        return {name: ds[name].values for name in ds.variables}

    from .netcdf3 import read_netcdf3

    prefix = group.replace("/", "_") + "_"
    per_file: dict[str, list[np.ndarray]] = {}
    for p in paths:
        _, variables, _ = read_netcdf3(p)
        for name, arr in variables.items():
            if name.startswith(prefix):
                per_file.setdefault(name[len(prefix):], []).append(arr)
    return {
        name: (chunks[0] if len(chunks) == 1 else np.concatenate(chunks, axis=0))
        for name, chunks in per_file.items()
    }


def _read_config_attrs(path: str) -> dict:
    """Config-group attributes (cell size, blanking distance, …)."""
    if have_netcdf():
        import xarray as xr

        cfg = xr.open_mfdataset(path, group="Config")
        return {k: v for k, v in cfg.attrs.items() if isinstance(v, (int, float, str))}

    from .netcdf3 import read_netcdf3

    _, _, attrs = read_netcdf3(path)
    return {
        k[len("Config_"):]: v
        for k, v in attrs.items()
        if k.startswith("Config_") and isinstance(v, (int, float, str))
    }


def ingest_ad2cp(spark: SparkSession, nc_glob: str, out_dir: str) -> None:
    """Convert AD2CP NetCDF groups to the engine's long-format Parquet
    tables (adcp_ping, adcp_cells, adcp_bt + attrs JSON).

    Group mapping (reference :161-163, :1494): ``Data/Average`` time ×
    per-ping vars → ``adcp_ping``; its (time × bin) beam matrices →
    ``adcp_cells`` long rows; ``Data/AverageBT`` (sparse) → ``adcp_bt``;
    ``Config`` attrs → ``attrs.json``.
    """
    paths = sorted(glob(nc_glob))
    if not paths:
        raise FileNotFoundError(f"no NetCDF files match {nc_glob!r}")
    avg = _read_group(paths, "Data/Average")
    if "time" not in avg:
        raise ValueError(f"{nc_glob!r}: no 'time' variable in group Data/Average")
    attrs = _read_config_attrs(paths[0])

    time_us = _time_to_us(avg["time"])
    ping = pd.DataFrame({"time_us": time_us})
    for src, dst in PING_VARS.items():
        if src in avg:
            ping[dst] = np.asarray(avg[src], dtype=np.float64)
    spark.createDataFrame(ping).write.mode("overwrite").parquet(f"{out_dir}/adcp_ping.parquet")

    two_d = [s for s in CELL_VARS if s in avg]
    if two_d:
        n_bins = avg[two_d[0]].shape[1]
        cells = pd.DataFrame(
            {
                "time_us": np.repeat(time_us, n_bins),
                "bin": np.tile(np.arange(n_bins, dtype=np.int32), len(time_us)),
            }
        )
        for src in two_d:
            cells[CELL_VARS[src]] = np.asarray(avg[src], dtype=np.float64).reshape(-1)
        spark.createDataFrame(cells).write.mode("overwrite").parquet(
            f"{out_dir}/adcp_cells.parquet"
        )

    bt = _read_group(paths, "Data/AverageBT")
    if "time" in bt:
        bt_pd = pd.DataFrame({"time_us": _time_to_us(bt["time"])})
        for src, dst in BT_VARS.items():
            if src in bt:
                bt_pd[dst] = np.asarray(bt[src], dtype=np.float64)
        spark.createDataFrame(bt_pd).write.mode("overwrite").parquet(
            f"{out_dir}/adcp_bt.parquet"
        )

    with open(f"{out_dir}/attrs.json", "w") as fh:
        json.dump(attrs, fh)


def get_declination(lat: float, lon: float, date_iso: str, api_key: str) -> float:
    """S4 — NOAA geomag declination lookup (reference get_declination
    :59-77). Driver-side HTTP → scalar → F.lit(); offline environments pass
    a precomputed declination column instead. ``api_key`` must be supplied
    by the caller (NOAA issues free keys; no default is shipped)."""
    import json as _json
    import urllib.request

    url = (
        "https://www.ngdc.noaa.gov/geomag-web/calculators/calculateDeclination?"
        f"lat1={lat}&lon1={lon}&key={api_key}&resultFormat=json&startYear={date_iso[:4]}"
    )
    with urllib.request.urlopen(url, timeout=30) as resp:  # pragma: no cover
        data = _json.loads(resp.read())
    return float(data["result"][0]["declination"])
