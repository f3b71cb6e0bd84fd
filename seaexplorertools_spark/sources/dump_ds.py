"""Spark 4 Python DataSource for schemaless binary dump files —
msgpack / CBOR / BSON in ONE source, batch scan AND append-only
directory tailing (the streaming twin of the mm_msgpack_records /
mm_cbor_records / mm_bson_records batch lanes).

    spark.dataSource.register(DumpDataSource)
    spark.read.format("dumpfile").load("/dumps/*.cbor")          # batch
    spark.readStream.format("dumpfile").load("/dumps/")          # tail

Codec selection is by file extension (``.msgpack``/``.mpk``,
``.cbor``, ``.bson``) — a dump directory mixes exports from different
producers, and extension is how they self-identify; files with other
extensions degrade to zero rows. Each record map lands on the shared
ingest shape keyed by provenance path:

    (src_file, rec_idx, doc_id, seq, body, score)

Design mirrors sources/warc_ds.py exactly: one InputPartition per
file (scan parallelism = |files|, nothing round-trips the driver);
streaming offset = processed-basename SET so arrival order is
irrelevant and replays between committed offsets re-read exactly the
set difference; corrupt files degrade to zero rows but still enter the
offset.

At 100 TB: dumps shard naturally per producer/day; per-file partitions
bound executor memory by the decoders' length caps, and the set-offset
keeps checkpoints O(|files|) (rotate directories per day, the same
mission-dir contract as the NetCDF3 and WARC tails).
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
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DUMP_FILE_SCHEMA = StructType(
    [
        StructField("src_file", StringType(), False),
        StructField("rec_idx", LongType(), False),
        StructField("doc_id", LongType(), True),
        StructField("seq", LongType(), True),
        StructField("body", StringType(), True),
        StructField("score", DoubleType(), True),
    ]
)

_EXTS = (".msgpack", ".mpk", ".cbor", ".bson")


def _decode(path: str, raw: bytes) -> list:
    if path.endswith((".msgpack", ".mpk")):
        from .msgpack import unpack_stream

        return unpack_stream(raw)
    if path.endswith(".cbor"):
        from .cbor import decode_stream

        return decode_stream(raw)
    if path.endswith(".bson"):
        from .bson import decode_dump

        return decode_dump(raw)
    raise ValueError(f"dumpfile: unknown extension on {path!r}")


def _file_rows(path: str) -> list[tuple]:
    """Decode one dump file onto the shared shape; corrupt or
    unknown-extension files degrade to zero rows."""
    try:
        with open(path, "rb") as fh:
            values = _decode(path, fh.read())
    except (OSError, ValueError):
        return []
    rows = []
    k = 0
    for v in values:
        if not isinstance(v, dict):
            continue
        score = v.get("score")
        doc_id, seq = v.get("doc_id"), v.get("seq")
        rows.append(
            (
                path,
                k,
                int(doc_id) if isinstance(doc_id, int) else None,
                int(seq) if isinstance(seq, int) else None,
                v.get("body") if isinstance(v.get("body"), str) else None,
                float(score) if isinstance(score, (int, float)) else None,
            )
        )
        k += 1
    return rows


@dataclass
class _FilePartition(InputPartition):
    path: str


class DumpReader(DataSourceReader):
    def __init__(self, paths: list[str]):
        self._paths = paths

    def partitions(self) -> list[InputPartition]:
        return [_FilePartition(p) for p in self._paths]

    def read(self, partition: _FilePartition):
        return iter(_file_rows(partition.path))


class DumpStreamReader(SimpleDataSourceStreamReader):
    """Tail an append-only dump directory; offset = processed-file set
    (see module docstring)."""

    def __init__(self, pattern: str):
        self._glob = pattern

    def initialOffset(self) -> dict:
        return {"files": []}

    def _rows_for(self, paths: list[str]):
        # a LIST, not a generator: the streaming runtime copy.copy()s
        # the prefetched iterator between planning and execution
        rows: list[tuple] = []
        for p in sorted(paths):
            rows.extend(_file_rows(p))
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


class DumpDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "dumpfile"

    def schema(self) -> StructType:
        return DUMP_FILE_SCHEMA

    def reader(self, schema) -> DumpReader:
        pattern = self.options.get("path")
        if not pattern:
            raise ValueError("dumpfile requires .load(<path or glob>)")
        if any(ch in pattern for ch in "*?["):
            paths = sorted(glob(pattern))
        elif os.path.isdir(pattern):
            paths = sorted(
                os.path.join(pattern, f)
                for f in os.listdir(pattern)
                if f.endswith(_EXTS)
            )
        else:
            paths = [pattern]
        if not paths:
            raise ValueError(f"dumpfile: no files match {pattern!r}")
        return DumpReader(paths)

    def simpleStreamReader(self, schema) -> DumpStreamReader:
        pattern = self.options.get("path")
        if not pattern:
            raise ValueError("dumpfile stream requires .load(<path or glob>)")
        if os.path.isdir(pattern):
            pattern = os.path.join(pattern, "*.*")
        return DumpStreamReader(pattern)
