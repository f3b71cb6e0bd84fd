"""S2/S3 — NetCDF AD2CP ingestion (reference xr.open_mfdataset,
process_adcp.py:161-163 group 'Data/Average', :1494 group 'Data/AverageBT').

Spark has no NetCDF data source; the engine's design is a ONE-TIME ingestion
converting each NetCDF group to long-format Parquet (ingestion tool, not a
query operator — SURVEY §2.1 S2). Conversion needs xarray/netCDF4, which are
not in this container, so the converter is import-gated; the long-format
layout it produces is exactly ``model.ADCP_CELLS_SCHEMA`` /
``ADCP_PING_SCHEMA`` / ``ADCP_BT_SCHEMA``, which the pipeline consumes from
Parquet.

At 100 TB: one file → one ingestion task (embarrassingly parallel via
``spark.createDataFrame(paths).mapInPandas(convert)``); output partitioned
by mission/day.
"""

from __future__ import annotations

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


def have_netcdf() -> bool:
    try:
        import xarray  # noqa: F401

        return True
    except ImportError:
        return False


def ingest_ad2cp(spark: SparkSession, nc_glob: str, out_dir: str) -> None:
    """Convert AD2CP NetCDF groups to the engine's long-format Parquet
    tables (adcp_ping, adcp_cells, adcp_bt + attrs JSON)."""
    if not have_netcdf():
        raise NotImplementedError(
            "NetCDF ingestion requires xarray/netCDF4 (absent in this "
            "container). The pipeline consumes the long-format Parquet this "
            "converter produces; see model.py for the schemas."
        )
    import json
    from glob import glob

    import pandas as pd
    import xarray as xr

    ds = xr.open_mfdataset(nc_glob, group="Data/Average")
    cfg = xr.open_mfdataset(sorted(glob(nc_glob))[0], group="Config")
    attrs = {k: v for k, v in cfg.attrs.items() if isinstance(v, (int, float, str))}

    time_us = (ds["time"].values.astype("datetime64[us]").astype("int64"))
    ping = pd.DataFrame({"time_us": time_us})
    for src, dst in PING_VARS.items():
        if src in ds:
            ping[dst] = ds[src].values
    spark.createDataFrame(ping).write.mode("overwrite").parquet(f"{out_dir}/adcp_ping.parquet")

    n_bins = ds.sizes.get("Velocity Range") or ds.sizes.get("bin")
    rows = []
    for b in range(n_bins):
        chunk = pd.DataFrame({"time_us": time_us, "bin": b})
        for src, dst in CELL_VARS.items():
            if src in ds:
                chunk[dst] = ds[src].values[:, b]
        rows.append(chunk)
    cells = pd.concat(rows, ignore_index=True)
    spark.createDataFrame(cells).write.mode("overwrite").parquet(f"{out_dir}/adcp_cells.parquet")

    try:
        bt = xr.open_mfdataset(nc_glob, group="Data/AverageBT")
        bt_time = bt["time"].values.astype("datetime64[us]").astype("int64")
        bt_pd = pd.DataFrame({"time_us": bt_time})
        for b in (1, 2, 4):
            bt_pd[f"velocity_beam{b}"] = bt[f"VelocityBeam{b}"].values
            bt_pd[f"fom_beam{b}"] = bt[f"FOMBeam{b}"].values
        for src, dst in [("Pressure", "pressure"), ("SpeedOfSound", "speed_of_sound"),
                         ("Heading", "heading"), ("Pitch", "pitch"), ("Roll", "roll")]:
            bt_pd[dst] = bt[src].values
        spark.createDataFrame(bt_pd).write.mode("overwrite").parquet(f"{out_dir}/adcp_bt.parquet")
    except (OSError, KeyError):
        pass

    with open(f"{out_dir}/attrs.json", "w") as fh:
        json.dump(attrs, fh)


def get_declination(lat: float, lon: float, date_iso: str, api_key: str = "zNEw7") -> float:
    """S4 — NOAA geomag declination lookup (reference get_declination
    :59-77). Driver-side HTTP → scalar → F.lit(); offline environments pass
    a precomputed declination column instead."""
    import json as _json
    import urllib.request

    url = (
        "https://www.ngdc.noaa.gov/geomag-web/calculators/calculateDeclination?"
        f"lat1={lat}&lon1={lon}&key={api_key}&resultFormat=json&startYear={date_iso[:4]}"
    )
    with urllib.request.urlopen(url, timeout=30) as resp:  # pragma: no cover
        data = _json.loads(resp.read())
    return float(data["result"][0]["declination"])
