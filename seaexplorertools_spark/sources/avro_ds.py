"""Spark 4 Python DataSource for Avro OCF files — batch scan with
SCHEMA INFERENCE from the files' own embedded schema, plus append-only
directory tailing (the streaming twin, same design as sources/warc_ds.py
and the NetCDF3 mission-dir source).

    spark.dataSource.register(AvroDataSource)
    spark.read.format("avrofile").load("/dumps/*.avro")        # batch
    spark.readStream.format("avrofile").load("/dumps/*.avro")  # tail

- ``schema()`` opens the FIRST matching file on the driver, reads the
  JSON schema Avro embeds in its header (the format's core contract),
  and maps it to Spark types (long/int → LongType, double/float →
  DoubleType, boolean, string, bytes → BinaryType; ``[null, T]`` →
  nullable T) with a leading ``src_file`` provenance column — the same
  inference contract spark-avro provides, driver cost = one header
  read.
- ``partitions()``: ONE InputPartition per file; each executor runs the
  pure-python block walk (sources/avro.py::read_avro_bytes — varint
  integers, deflate codec, sync verification, bomb guards) on its own
  files. Scan parallelism = |files|.
- rows are projected onto the INFERRED schema by field name: files
  whose own schema lacks a field yield NULL there (schema evolution
  tolerance); corrupt files degrade to zero rows but still enter the
  stream offset.
- streaming offset = the processed-basename SET (arrival and
  lexicographic order irrelevant, replays re-read exactly the set
  difference), the contract shared with the WARC/NetCDF3 tails.

At 100 TB: OCFs are block-compressed row files; per-file partitions
bound executor memory by the largest block (the writer's flush unit),
and checkpoint size stays O(|files|) (rotate dump directories per day,
as the mission-dir contract documents).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from glob import glob

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_SPARK_TYPES = {
    "long": LongType(),
    "int": LongType(),
    "double": DoubleType(),
    "float": DoubleType(),
    "boolean": BooleanType(),
    "string": StringType(),
    "bytes": BinaryType(),
}


def _spark_schema(avro_schema: dict) -> StructType:
    fields = [StructField("src_file", StringType(), False)]
    for f in avro_schema.get("fields", []):
        typ = f["type"]
        if isinstance(typ, list):
            typ = next(t for t in typ if t != "null")
        st = _SPARK_TYPES.get(typ)
        if st is None:
            raise ValueError(f"avrofile: unsupported field type {typ!r}")
        # nullable regardless of union-ness in the sampled file: other
        # files in the glob may carry OLDER schemas lacking the field
        # entirely (schema evolution) — those rows project to NULL here
        fields.append(StructField(f["name"], st, True))
    return StructType(fields)


def _resolve(pattern: str, suffix: str = ".avro") -> list[str]:
    if any(ch in pattern for ch in "*?["):
        return sorted(glob(pattern))
    if os.path.isdir(pattern):
        return sorted(
            os.path.join(pattern, f)
            for f in os.listdir(pattern)
            if f.endswith(suffix)
        )
    return [pattern]


def _file_rows(path: str, names: list[str], casts: list) -> list[tuple]:
    """Decode one OCF and project records onto the inferred field list;
    corrupt files degrade to zero rows."""
    from .avro import read_avro_bytes

    try:
        with open(path, "rb") as fh:
            _schema, recs = read_avro_bytes(fh.read())
    except (OSError, ValueError):
        return []
    rows = []
    for rec in recs:
        row = [path]
        for name, cast in zip(names, casts):
            v = rec.get(name)
            row.append(cast(v) if v is not None and cast is not None else v)
        rows.append(tuple(row))
    return rows


@dataclass
class _FilePartition(InputPartition):
    path: str


class AvroReader(DataSourceReader):
    def __init__(self, paths: list[str], schema: StructType):
        self._paths = paths
        self._names = [f.name for f in schema.fields[1:]]
        self._casts = [_cast_for(f) for f in schema.fields[1:]]

    def partitions(self) -> list[InputPartition]:
        return [_FilePartition(p) for p in self._paths]

    def read(self, partition: _FilePartition):
        return iter(_file_rows(partition.path, self._names, self._casts))


def _cast_for(field: StructField):
    """Python-side coercion so int-typed Avro values land in LongType
    columns and float32 values in DoubleType ones."""
    if isinstance(field.dataType, LongType):
        return int
    if isinstance(field.dataType, DoubleType):
        return float
    return None


class AvroStreamReader(SimpleDataSourceStreamReader):
    """Tail an append-only dump directory; offset = processed-file set."""

    def __init__(self, pattern: str, schema: StructType):
        self._glob = pattern
        self._names = [f.name for f in schema.fields[1:]]
        self._casts = [_cast_for(f) for f in schema.fields[1:]]

    def initialOffset(self) -> dict:
        return {"files": []}

    def _rows_for(self, paths: list[str]):
        rows: list[tuple] = []
        for p in sorted(paths):
            rows.extend(_file_rows(p, self._names, self._casts))
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


class AvroDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "avrofile"

    def schema(self) -> StructType:
        pattern = self.options.get("path")
        if not pattern:
            raise ValueError("avrofile requires .load(<path or glob>)")
        paths = _resolve(pattern)
        if not paths:
            raise ValueError(f"avrofile: no files match {pattern!r}")
        from .avro import read_avro_bytes

        with open(paths[0], "rb") as fh:
            avro_schema, _ = read_avro_bytes(fh.read())
        return _spark_schema(avro_schema)

    def reader(self, schema) -> AvroReader:
        paths = _resolve(self.options.get("path", ""))
        if not paths:
            raise ValueError("avrofile: no files to read")
        return AvroReader(paths, schema)

    def simpleStreamReader(self, schema) -> AvroStreamReader:
        pattern = self.options.get("path")
        if not pattern:
            raise ValueError("avrofile stream requires .load(<path or glob>)")
        if os.path.isdir(pattern):
            pattern = os.path.join(pattern, "*.avro")
        return AvroStreamReader(pattern, schema)
