"""``spark.read.format("netcdf3")`` — a Spark 4 Python DataSource for the
AD2CP NetCDF ingestion path (SURVEY S2/S3).

``sources/netcdf.py::ingest_ad2cp`` converts NetCDF → parquet driver-side
(the batch-convert workflow). This module makes the same group→long-table
mapping a *first-class lazy source*: one ``InputPartition`` per ``.nc``
file, so a 1,000-mission fleet reads on 1,000 executor tasks with no
driver materialization, and the result composes with every downstream
operator before anything is persisted.

Group mapping (reference ``process_adcp.py:161-163`` reads
``Data/Average`` via ``xr.open_mfdataset``; ``:1494`` reads
``Data/AverageBT``): classic NetCDF3 has no groups, so variables use the
flattening convention ``Data_Average_VelocityBeam1`` documented in
``sources/netcdf3.py``.

Layouts:
- ``ping``  — one row per ping: ``src_file, time_us`` + every 1-D
  variable over the time dimension (as double).
- ``cells`` — one row per (ping, bin): ``src_file, time_us, bin`` +
  every 2-D (time × bin) variable (as double).

Schema is inferred driver-side from the FIRST matching file's header (a
single small read); per-file variable drift yields nulls rather than
errors, matching ``xr.open_mfdataset``'s outer-join semantics.
"""

from __future__ import annotations

from glob import glob

import numpy as np

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .netcdf3 import read_netcdf3

EPOCH_1970 = "seconds since 1970-01-01"


def _group_vars(path: str, group: str):
    """(dims, {bare_name: ndarray}) for one flattened group."""
    prefix = group.replace("/", "_") + "_"
    dims, variables, _attrs = read_netcdf3(path)
    out = {
        name[len(prefix):]: arr
        for name, arr in variables.items()
        if name.startswith(prefix)
    }
    return dims, out


def _time_to_us(arr: np.ndarray) -> np.ndarray:
    # classic-fallback convention (sources/netcdf.py::_time_to_us): the
    # flattened ``*_time`` variable stores numeric epoch-µs directly
    return np.asarray(arr).astype(np.int64)


class NetCDF3Reader(DataSourceReader):
    def __init__(self, options, schema: StructType):
        self.paths = sorted(glob(options.get("path", "")))
        if not self.paths:
            raise FileNotFoundError(f"netcdf3 source: no files match {options.get('path')!r}")
        self.group = options.get("group", "Data/Average")
        self.layout = options.get("layout", "ping")
        self.schema = schema

    def partitions(self):
        # one partition per file: fleet-scale parallelism, no shuffle
        return [InputPartition(p) for p in self.paths]

    def read(self, partition: InputPartition):
        path = partition.value
        _dims, gvars = _group_vars(path, self.group)
        if "time" not in gvars:
            return
        time_us = _time_to_us(gvars["time"])
        cols = [f.name for f in self.schema.fields]
        if self.layout == "ping":
            series = {}
            for c in cols:
                if c in ("src_file", "time_us"):
                    continue
                v = gvars.get(c)
                series[c] = (
                    np.asarray(v, dtype=np.float64) if v is not None and v.ndim == 1 else None
                )
            for i in range(len(time_us)):
                yield tuple(
                    path if c == "src_file"
                    else int(time_us[i]) if c == "time_us"
                    else (float(series[c][i]) if series[c] is not None else None)
                    for c in cols
                )
        else:  # cells
            two_d = {
                c: np.asarray(gvars[c], dtype=np.float64)
                for c in cols
                if c not in ("src_file", "time_us", "bin") and gvars.get(c) is not None
            }
            n_bins = next(iter(two_d.values())).shape[1] if two_d else 0
            for i in range(len(time_us)):
                for b in range(n_bins):
                    yield tuple(
                        path if c == "src_file"
                        else int(time_us[i]) if c == "time_us"
                        else b if c == "bin"
                        else (float(two_d[c][i, b]) if c in two_d else None)
                        for c in cols
                    )


class NetCDF3DataSource(DataSource):
    """Register with ``spark.dataSource.register(NetCDF3DataSource)``; read
    with ``spark.read.format("netcdf3").option("path", glob).load()``."""

    @classmethod
    def name(cls) -> str:
        return "netcdf3"

    def schema(self) -> StructType:
        first = sorted(glob(self.options.get("path", "")))
        if not first:
            raise FileNotFoundError(f"netcdf3 source: no files match {self.options.get('path')!r}")
        group = self.options.get("group", "Data/Average")
        layout = self.options.get("layout", "ping")
        _dims, gvars = _group_vars(first[0], group)
        fields = [
            StructField("src_file", StringType()),
            StructField("time_us", LongType()),
        ]
        if layout == "cells":
            fields.append(StructField("bin", IntegerType()))
            want_ndim = 2
        else:
            want_ndim = 1
        for name, arr in sorted(gvars.items()):
            if name != "time" and arr.ndim == want_ndim:
                fields.append(StructField(name, DoubleType()))
        return StructType(fields)

    def reader(self, schema: StructType) -> NetCDF3Reader:
        return NetCDF3Reader(self.options, schema)
