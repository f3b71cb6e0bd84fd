"""Spark 4 Python DataSource for classic NetCDF3 AD2CP files (S2/S3 as a
DISTRIBUTED scan).

``ingest_ad2cp`` (sources/netcdf.py) converts NetCDF → Parquet on the
driver — fine as a one-shot ingestion tool, wrong as the scan path for a
large mission set (the driver would read every byte). This source makes
the multi-file ADCP read a first-class distributed scan
(reference load: process_adcp.py:161-163):

    spark.read.format("netcdf3").option("group", "Data/Average")
         .option("layout", "cells").load("/missions/*.nc")

- ``partitions()`` returns ONE InputPartition PER FILE, so each executor
  parses only its own files with the pure-python reader
  (sources/netcdf3.py) — scan parallelism = |files|, no driver transfer.
- ``read()`` yields ONE pyarrow RecordBatch per file (vectorized Arrow
  transfer, no per-row Python).
- Schema is inferred driver-side from the FIRST file's header (sorted
  order — deterministic) and enforced on every other file: a file whose
  group lacks an inferred column raises rather than silently nulling.

Layouts mirror the ingest mapping: ``ping`` = the group's 1-D variables
as columns keyed by time_us; ``cells`` = the group's (time × bin) 2-D
variables exploded long to (time_us, bin, value columns).
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass
from glob import glob

import numpy as np
import pyarrow as pa

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

from .netcdf import _time_to_us
from .netcdf3 import read_netcdf3, write_netcdf3


def _group_vars(path: str, group: str) -> dict[str, np.ndarray]:
    prefix = group.replace("/", "_") + "_"
    _, variables, _ = read_netcdf3(path)
    return {
        name[len(prefix):]: arr
        for name, arr in variables.items()
        if name.startswith(prefix)
    }


def _layout_columns(av: dict[str, np.ndarray], layout: str) -> list[str]:
    """Deterministic (sorted) value-column list for a layout."""
    want_ndim = 1 if layout == "ping" else 2
    return sorted(
        n for n, a in av.items() if n != "time" and a.ndim == want_ndim
    )


def _file_batch(
    path: str, group: str, layout: str, cols: list[str], src_file: bool = False
) -> pa.RecordBatch:
    av = _group_vars(path, group)
    if "time" not in av:
        raise ValueError(f"{path}: no 'time' variable in group {group!r}")
    missing = [c for c in cols if c not in av]
    if missing:
        raise ValueError(f"{path}: group {group!r} lacks columns {missing}")
    time_us = _time_to_us(av["time"])
    if layout == "ping":
        arrays = [pa.array(time_us, pa.int64())] + [
            pa.array(np.asarray(av[c], dtype=np.float64), pa.float64()) for c in cols
        ]
        names = ["time_us", *cols]
    else:
        n_bins = av[cols[0]].shape[1]
        # every selected 2-D variable must be exactly (len(time), n_bins):
        # a mismatched second dimension would otherwise reshape(-1) into a
        # silently misaligned column — fail loudly naming the variable
        for c in cols:
            if av[c].shape != (len(time_us), n_bins):
                raise ValueError(
                    f"{path}: 2-D variable {c!r} has shape {av[c].shape}, "
                    f"expected {(len(time_us), n_bins)} (time × bin) to "
                    f"match {cols[0]!r}"
                )
        arrays = [
            pa.array(np.repeat(time_us, n_bins), pa.int64()),
            pa.array(
                np.tile(np.arange(n_bins, dtype=np.int32), len(time_us)), pa.int32()
            ),
        ] + [
            pa.array(np.asarray(av[c], dtype=np.float64).reshape(-1), pa.float64())
            for c in cols
        ]
        names = ["time_us", "bin", *cols]
    if src_file:  # provenance column (input_file_name() equivalent)
        arrays = [pa.array([path] * len(arrays[0]), pa.string())] + arrays
        names = ["src_file", *names]
    return pa.RecordBatch.from_arrays(arrays, names)


class NetCDF3Reader(DataSourceReader):
    def __init__(
        self,
        paths: list[str],
        group: str,
        layout: str,
        cols: list[str],
        src_file: bool = False,
    ):
        self._paths = paths
        self._group = group
        self._layout = layout
        self._cols = cols
        self._src_file = src_file

    def partitions(self):
        return [InputPartition(p) for p in self._paths]

    def read(self, partition):
        yield _file_batch(
            partition.value, self._group, self._layout, self._cols, self._src_file
        )


class NetCDF3DataSource(DataSource):
    """``spark.read.format("netcdf3")`` — register with
    ``spark.dataSource.register(NetCDF3DataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "netcdf3"

    def _resolved(self):
        # memoized: schema() and reader() both need this, and resolving
        # parses the first file + lists the directory — do it once
        if getattr(self, "_resolved_cache", None) is not None:
            return self._resolved_cache
        path = self.options.get("path")
        if not path:
            raise ValueError("netcdf3 source requires .load(<path or glob>)")
        paths = sorted(glob(path))
        if not paths:
            raise FileNotFoundError(f"no NetCDF files match {path!r}")
        group = self.options.get("group", "Data/Average")
        layout = self.options.get("layout", "ping")
        if layout not in ("ping", "cells"):
            raise ValueError(f"layout must be 'ping' or 'cells', got {layout!r}")
        cols = _layout_columns(_group_vars(paths[0], group), layout)
        if layout == "cells" and not cols:
            raise ValueError(f"{paths[0]}: no 2-D variables in group {group!r}")
        src = self.options.get("src_file", "false").lower() == "true"
        self._resolved_cache = (paths, group, layout, cols, src)
        return self._resolved_cache

    def schema(self) -> str:
        _, _, layout, cols, src = self._resolved()
        base = "time_us bigint" if layout == "ping" else "time_us bigint, bin int"
        if src:
            base = "src_file string, " + base
        return ", ".join([base] + [f"{c} double" for c in cols])

    def reader(self, schema) -> NetCDF3Reader:
        paths, group, layout, cols, src = self._resolved()
        return NetCDF3Reader(paths, group, layout, cols, src)

    def simpleStreamReader(self, schema) -> "NetCDF3StreamReader":
        # streaming: tolerate an initially-EMPTY directory (a stream may
        # start before the instrument uploads its first file) — schema
        # must then come from the caller via .schema(...)
        path = self.options.get("path")
        if not path:
            raise ValueError("netcdf3 stream requires .load(<path or glob>)")
        group = self.options.get("group", "Data/Average")
        layout = self.options.get("layout", "ping")
        paths = sorted(glob(path))
        src = self.options.get("src_file", "false").lower() == "true"
        cols = (
            _layout_columns(_group_vars(paths[0], group), layout) if paths else
            [
                f.name
                for f in schema.fields
                if f.name not in ("time_us", "bin", "src_file")
            ]
        )
        # rows are emitted IN THE DECLARED SCHEMA'S ORDER (batches are
        # reordered by name before tuple conversion), so a caller schema
        # with a different field order cannot silently misalign values;
        # a name mismatch fails loudly at read time instead
        schema_names = [f.name for f in schema.fields]
        return NetCDF3StreamReader(path, group, layout, cols, src, schema_names)

    def writer(self, schema, overwrite: bool) -> "NetCDF3Writer":
        path = self.options.get("path")
        if not path:
            raise ValueError("netcdf3 sink requires .save(<directory>)")
        if overwrite:
            # driver-side, before any task runs: non-atomic FS overwrite
            # (the parquet-on-raw-FS behavior) — clear prior parts and
            # manifest so stale part files never mix with the new write
            for f in glob(os.path.join(path, "part-*.nc")):
                os.remove(f)
            succ = os.path.join(path, "_SUCCESS")
            if os.path.exists(succ):
                os.remove(succ)
        return NetCDF3Writer(path, schema, overwrite)


@dataclass
class _NcCommit(WriterCommitMessage):
    """Picklable per-task commit record: the finished part file."""

    filename: str
    n_rows: int


class NetCDF3Writer(DataSourceWriter):
    """Distributed NetCDF3 sink: each partition writes ONE classic .nc
    part file (``part-<pid>-<uuid>.nc``) into the target directory —
    the export format the reference emits its processed datasets in
    (process_adcp.py writes ds_out NetCDF), produced executor-side with
    no driver collect. commit() drops a ``_SUCCESS`` marker listing the
    parts; abort() removes any files the failed attempt reported.

    Classic CDF-1 has no 64-bit integer type, so BIGINT columns are
    stored as f8 doubles — exact for |v| < 2^53 (epoch-µs until the year
    2255); INT → i4, FLOAT → f4, DOUBLE → f8. Non-numeric columns are
    rejected loudly rather than silently stringified.

    **Deployment contract (user-facing):** the sink writes with plain
    ``os``/``glob`` calls, so the target directory must be a filesystem
    shared by the driver and every executor (local mode, NFS, or a FUSE
    mount — not raw object storage), and AT MOST ONE job may write a
    given directory at a time. Each job stamps its part files with a
    per-job UUID and commit() sweeps only orphans carrying THIS job's
    stamp (failed/speculative attempts of this job), so a concurrent
    writer's parts are never deleted — but two concurrent appenders can
    still interleave ``_SUCCESS`` manifest rewrites and lose each
    other's entries; serialize appends per directory."""

    _NP_OF_SPARK = {
        "bigint": np.float64,
        "int": np.int32,
        "smallint": np.int16,
        "tinyint": np.int8,
        "float": np.float32,
        "double": np.float64,
    }

    def __init__(self, path: str, schema, overwrite: bool):
        self._path = path
        # per-JOB stamp, minted driver-side and pickled to every task:
        # part files carry it, and commit()'s orphan sweep matches on it
        # so only THIS job's failed/speculative attempts are removed
        self._job_id = uuid.uuid4().hex
        self._cols = []
        for f in schema.fields:
            dt = f.dataType.simpleString()
            if dt not in self._NP_OF_SPARK:
                raise TypeError(
                    f"netcdf3 sink: column {f.name!r} has non-numeric type "
                    f"{dt!r} (classic NetCDF3 stores numeric variables only)"
                )
            self._cols.append((f.name, self._NP_OF_SPARK[dt]))
        self._overwrite = overwrite

    def write(self, iterator) -> _NcCommit:
        from pyspark import TaskContext

        rows = list(iterator)
        pid = TaskContext.get().partitionId()
        fname = f"part-{pid:05d}-{self._job_id}-{uuid.uuid4().hex}.nc"
        os.makedirs(self._path, exist_ok=True)
        n = len(rows)
        variables = {
            name: (
                ("row",),
                np.array([r[i] for r in rows], dtype=np_t),
            )
            for i, (name, np_t) in enumerate(self._cols)
        }
        # classic format cannot represent a 0-sized fixed dim; empty
        # partitions simply contribute no part file
        if n:
            write_netcdf3(os.path.join(self._path, fname), {"row": n}, variables)
        return _NcCommit(filename=fname if n else "", n_rows=n)

    def commit(self, messages) -> None:
        parts = [m.filename for m in messages if m and m.filename]
        succ = os.path.join(self._path, "_SUCCESS")
        # append mode accumulates: the new manifest is the prior one plus
        # this job's parts. Orphans from failed/speculative attempts are
        # swept so directory-glob readers can't double-count — but ONLY
        # files stamped with this job's UUID: a concurrent or later job's
        # parts (different stamp) are never touched by this sweep.
        prior = []
        if os.path.exists(succ):
            prior = [ln for ln in open(succ).read().split() if ln]
        listed = set(prior) | set(parts)
        for f in glob(os.path.join(self._path, f"part-*-{self._job_id}-*.nc")):
            if os.path.basename(f) not in listed:
                os.remove(f)
        with open(succ, "w") as fh:
            fh.write("\n".join(sorted(listed)))

    def abort(self, messages) -> None:
        for m in messages:
            if m and m.filename:
                try:
                    os.remove(os.path.join(self._path, m.filename))
                except OSError:
                    pass


class NetCDF3StreamReader(SimpleDataSourceStreamReader):
    """Stream a growing (append-only) mission directory. The offset is
    the SET of file basenames already processed — not a count or a name
    cursor — so arrival order and lexicographic order are both
    irrelevant: ``mission_10.nc`` landing after ``mission_9.nc`` (which
    sorts BEFORE it) is still picked up exactly once, and replays
    between two committed offsets re-read exactly the set difference.
    Files must not be renamed or deleted while a stream is active."""

    def __init__(
        self,
        path: str,
        group: str,
        layout: str,
        cols: list[str],
        src_file: bool = False,
        schema_names: list[str] | None = None,
    ):
        self._glob = path
        self._group = group
        self._layout = layout
        self._cols = cols
        self._src_file = src_file
        self._schema_names = schema_names

    def initialOffset(self) -> dict:
        return {"files": []}

    def _rows_for(self, paths: list[str]):
        # a LIST iterator, not a generator: the streaming runtime caches
        # and copy.copy()s the prefetched iterator between planning and
        # execution, and generators are not copyable
        rows = []
        for p in paths:
            batch = _file_batch(
                p, self._group, self._layout, self._cols, self._src_file
            )
            if self._schema_names is not None:
                missing = set(self._schema_names) - set(batch.schema.names)
                if missing:
                    raise ValueError(
                        f"{p}: stream schema expects columns {sorted(missing)} "
                        f"the file does not provide"
                    )
                batch = batch.select(self._schema_names)
            rows.extend(tuple(r.values()) for r in batch.to_pylist())
        return iter(rows)

    def read(self, start: dict):
        files = sorted(glob(self._glob))
        done = set(start.get("files", []))
        new = [f for f in files if os.path.basename(f) not in done]
        nxt = sorted(done | {os.path.basename(f) for f in new})
        return self._rows_for(new), {"files": nxt}

    def readBetweenOffsets(self, start: dict, end: dict):
        done = set(start.get("files", []))
        want = set(end.get("files", [])) - done
        files = [
            f for f in sorted(glob(self._glob)) if os.path.basename(f) in want
        ]
        return self._rows_for(files)
