"""Spark 4 Python DataSource for WARC crawl files — batch scan AND
append-only directory tailing (the streaming twin of the
``mm_warc_records`` batch lane, VERDICT r7 task #8).

A crawl bucket is the same shape as a growing mission directory
(sources/netcdf_ds.py): files land, are never renamed, never mutate.
So the source mirrors the NetCDF3 design:

    spark.dataSource.register(WarcDataSource)
    spark.read.format("warcfile").load("/crawl/*.warc.gz")        # batch
    spark.readStream.format("warcfile").load("/crawl/*.warc.gz")  # tail

- ``partitions()`` returns ONE InputPartition PER FILE: each executor
  runs the record walk (operators/warc.py::parse_warc_records —
  Content-Length-driven, multi-member gzip, bomb-guarded) on its own
  files only. Scan parallelism = |files|; nothing round-trips the
  driver.
- rows: ``(src_file, rec_idx, warc_type, target_uri, content_length,
  body)`` — the batch lane's schema keyed by provenance path instead of
  media_id.
- streaming offset = the SET of processed basenames (not a count or
  name cursor), so arrival order and lexicographic order are both
  irrelevant and replays between committed offsets re-read exactly the
  set difference. Files must not be renamed/deleted mid-stream.
- a CORRUPT file degrades to zero rows (same per-payload contract as
  the batch lane) — a crawl tail must survive a truncated upload; the
  skipped basename still enters the offset so it is not re-read
  forever.

At 100 TB: Common Crawl segments are ~1 GB gzip members; one partition
per file with the decode budget per member bounds executor memory, and
the stream reader's set-offset keeps checkpoint size O(|files|) (rotate
the directory per crawl-day in practice, exactly like the mission-dir
contract).
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
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_FILE_SCHEMA = StructType(
    [
        StructField("src_file", StringType(), False),
        StructField("rec_idx", LongType(), False),
        StructField("warc_type", StringType(), True),
        StructField("target_uri", StringType(), True),
        StructField("content_length", LongType(), True),
        StructField("body", StringType(), True),
    ]
)


def _file_rows(path: str) -> list[tuple]:
    """Run the shared record walk on one file; corrupt/non-WARC files
    degrade to zero rows (the batch lane's per-payload contract)."""
    from ..operators.warc import parse_warc_records

    try:
        with open(path, "rb") as fh:
            recs = parse_warc_records(fh.read())
    except (OSError, ValueError):
        return []
    rows = []
    for k, r in enumerate(recs):
        h = r["headers"]
        rows.append(
            (
                path,
                k,
                h.get("warc-type"),
                h.get("warc-target-uri"),
                len(r["body"]),
                r["body"].decode("utf-8", "replace"),
            )
        )
    return rows


@dataclass
class _FilePartition(InputPartition):
    path: str


class WarcReader(DataSourceReader):
    def __init__(self, paths: list[str]):
        self._paths = paths

    def partitions(self) -> list[InputPartition]:
        return [_FilePartition(p) for p in self._paths]

    def read(self, partition: _FilePartition):
        return iter(_file_rows(partition.path))


class WarcStreamReader(SimpleDataSourceStreamReader):
    """Tail an append-only crawl directory; offset = processed-file set
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


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warcfile"

    def schema(self) -> StructType:
        return WARC_FILE_SCHEMA

    def reader(self, schema) -> WarcReader:
        pattern = self.options.get("path")
        if not pattern:
            raise ValueError("warcfile requires .load(<path or glob>)")
        paths = sorted(glob(pattern)) if any(
            ch in pattern for ch in "*?["
        ) else (
            sorted(
                os.path.join(pattern, f)
                for f in os.listdir(pattern)
                if f.endswith((".warc", ".warc.gz"))
            )
            if os.path.isdir(pattern)
            else [pattern]
        )
        if not paths:
            raise ValueError(f"warcfile: no files match {pattern!r}")
        return WarcReader(paths)

    def simpleStreamReader(self, schema) -> WarcStreamReader:
        pattern = self.options.get("path")
        if not pattern:
            raise ValueError("warcfile stream requires .load(<path or glob>)")
        if os.path.isdir(pattern):
            pattern = os.path.join(pattern, "*.warc*")
        return WarcStreamReader(pattern)
