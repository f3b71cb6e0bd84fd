"""Apache Avro Object Container File reader/writer — pure python.

Avro OCF is the row-oriented interchange format data pipelines meet
constantly (Kafka dumps, Sqoop exports, event archives). This module
implements the public spec (https://avro.apache.org/docs/ — binary
encoding + object container format): header magic ``Obj\\x01``, file
metadata map (``avro.schema`` JSON, ``avro.codec``), 16-byte sync
marker, then blocks of (record count, byte length, data, sync). Codecs:
``null`` and ``deflate`` (raw DEFLATE, wbits=-15 per spec).

Schema support is the flat-record subset that covers those corpora:
a top-level ``record`` whose fields are primitives — null / boolean /
int / long / float / double / string / bytes — or a two-branch union
``["null", primitive]``. Nested records/arrays/maps degrade with
ValueError so the ingest lane's per-payload degrade contract holds.

Decoding is driven by the schema embedded IN the payload (the Avro
contract), so the reader is self-describing; the Spark lane projects
the decoded dicts onto a fixed output schema, which is what keeps the
mapInPandas signature static for Catalyst.

Both halves are lossless, so ``mm_avro_records`` runs the full
write→block-walk→decode→explode path under an exact constructor
oracle (the WARC/ZIP pattern).

Reference parity: the reference engine reads NetCDF
(`/root/reference/seaexplorertools/process_adcp.py:140`); Avro is part
of the large-scale ingest surface the brief adds.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAGIC = b"Obj\x01"

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "string", "bytes"}

_MAX_ITEMS = 16 * 1024 * 1024  # block/string count cap (bomb guard)


# ---------------------------------------------------------------- encoding

def _write_long(out: bytearray, n: int) -> None:
    """Zigzag + varint (the single integer encoding Avro uses)."""
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(b: bytes, i: int) -> tuple[int, int]:
    shift = u = 0
    while True:
        if i >= len(b):
            raise ValueError("avro: truncated varint")
        byte = b[i]
        i += 1
        u |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("avro: varint too long")
    return (u >> 1) ^ -(u & 1), i


def _write_value(out: bytearray, typ, v) -> None:
    if isinstance(typ, list):  # ["null", T] union: branch index then value
        if v is None:
            _write_long(out, typ.index("null"))
            return
        branch = 1 if typ[0] == "null" else 0
        _write_long(out, branch)
        _write_value(out, typ[branch], v)
        return
    if typ == "null":
        return
    if typ == "boolean":
        out.append(1 if v else 0)
    elif typ in ("int", "long"):
        _write_long(out, int(v))
    elif typ == "float":
        out += struct.pack("<f", float(v))
    elif typ == "double":
        out += struct.pack("<d", float(v))
    elif typ == "string":
        raw = str(v).encode("utf-8")
        _write_long(out, len(raw))
        out += raw
    elif typ == "bytes":
        _write_long(out, len(v))
        out += bytes(v)
    else:
        raise ValueError(f"avro: unsupported type {typ!r}")


def _read_value(b: bytes, i: int, typ):
    if isinstance(typ, list):
        branch, i = _read_long(b, i)
        if not 0 <= branch < len(typ):
            raise ValueError("avro: union branch out of range")
        return _read_value(b, i, typ[branch])
    if typ == "null":
        return None, i
    if typ == "boolean":
        if i >= len(b):
            raise ValueError("avro: truncated boolean")
        return b[i] != 0, i + 1
    if typ in ("int", "long"):
        return _read_long(b, i)
    if typ == "float":
        if i + 4 > len(b):
            raise ValueError("avro: truncated float")
        return struct.unpack("<f", b[i : i + 4])[0], i + 4
    if typ == "double":
        if i + 8 > len(b):
            raise ValueError("avro: truncated double")
        return struct.unpack("<d", b[i : i + 8])[0], i + 8
    if typ in ("string", "bytes"):
        n, i = _read_long(b, i)
        if n < 0 or n > _MAX_ITEMS or i + n > len(b):
            raise ValueError("avro: bad byte-length")
        raw = b[i : i + n]
        return (raw.decode("utf-8") if typ == "string" else raw), i + n
    raise ValueError(f"avro: unsupported type {typ!r}")


def _field_types(schema: dict) -> list[tuple[str, object]]:
    if schema.get("type") != "record":
        raise ValueError("avro: top-level schema must be a record")
    out = []
    for f in schema.get("fields", []):
        typ = f["type"]
        if isinstance(typ, list):
            if len(typ) != 2 or "null" not in typ or not all(
                isinstance(t, str) and t in _PRIMITIVES for t in typ
            ):
                raise ValueError("avro: only [null, primitive] unions supported")
        elif not (isinstance(typ, str) and typ in _PRIMITIVES):
            raise ValueError(f"avro: unsupported field type {typ!r}")
        out.append((f["name"], typ))
    return out


# ------------------------------------------------------------------- files

def write_avro_bytes(
    records: list[dict],
    schema: dict,
    codec: str = "null",
    sync: bytes = b"\x00" * 16,
    max_block_records: int | None = None,
) -> bytes:
    """Serialize records to a spec-valid OCF byte string (fixture
    builder and a genuine writer). ``sync`` must be 16 bytes;
    ``max_block_records`` splits output into multiple blocks."""
    if codec not in ("null", "deflate"):
        raise ValueError("avro: codec must be null or deflate")
    if len(sync) != 16:
        raise ValueError("avro: sync marker must be 16 bytes")
    fields = _field_types(schema)
    out = bytearray(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_value(out, "string", k)
        _write_value(out, "bytes", v)
    _write_long(out, 0)  # end of metadata map
    out += sync

    step = max_block_records or max(len(records), 1)
    for start in range(0, len(records), step) if records else []:
        chunk = records[start : start + step]
        body = bytearray()
        for rec in chunk:
            for name, typ in fields:
                _write_value(body, typ, rec.get(name))
        data = bytes(body)
        if codec == "deflate":
            comp = zlib.compressobj(9, zlib.DEFLATED, -15)
            data = comp.compress(data) + comp.flush()
        _write_long(out, len(chunk))
        _write_long(out, len(data))
        out += data
        out += sync
    return bytes(out)


def read_avro_bytes(payload: bytes) -> tuple[dict, list[dict]]:
    """Decode an OCF byte string → (schema, records). The schema comes
    from the payload's own metadata; sync markers are verified per
    block (a corrupt block boundary fails loudly, not silently)."""
    b = bytes(payload)
    if b[:4] != MAGIC:
        raise ValueError("avro: bad magic")
    i = 4
    meta: dict[str, bytes] = {}
    while True:
        n, i = _read_long(b, i)
        if n == 0:
            break
        if n < 0:  # negative count form: -count then byte size
            n = -n
            _, i = _read_long(b, i)
        if n > 4096:
            raise ValueError("avro: implausible metadata count")
        for _ in range(n):
            k, i = _read_value(b, i, "string")
            v, i = _read_value(b, i, "bytes")
            meta[k] = v
    if "avro.schema" not in meta:
        raise ValueError("avro: missing schema")
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec!r}")
    fields = _field_types(schema)
    if i + 16 > len(b):
        raise ValueError("avro: truncated header sync")
    sync = b[i : i + 16]
    i += 16

    records: list[dict] = []
    while i < len(b):
        cnt, i = _read_long(b, i)
        size, i = _read_long(b, i)
        if cnt < 0 or cnt > _MAX_ITEMS or size < 0 or i + size + 16 > len(b):
            raise ValueError("avro: bad block framing")
        data = b[i : i + size]
        i += size
        if b[i : i + 16] != sync:
            raise ValueError("avro: sync marker mismatch")
        i += 16
        if codec == "deflate":
            data = zlib.decompressobj(-15).decompress(data, _MAX_ITEMS)
        j = 0
        for _ in range(cnt):
            rec = {}
            for name, typ in fields:
                rec[name], j = _read_value(data, j, typ)
            records.append(rec)
        if j != len(data):
            raise ValueError("avro: trailing bytes in block")
    return schema, records


# -------------------------------------------------------------- Spark lane

AVRO_RECORD_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("doc_id", LongType(), True),
        StructField("seq", LongType(), True),
        StructField("body", StringType(), True),
        StructField("score", DoubleType(), True),
    ]
)


def avro_records(media: DataFrame) -> DataFrame:
    """Explode OCF payloads into rows, projected onto the fixed
    (doc_id, seq, body, score) record shape the contract fixture
    writes — fields the payload's schema lacks come out NULL, extra
    fields are ignored, malformed payloads degrade to zero rows.
    Arrow-batched mapInPandas, zero shuffle."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "doc_id", "seq", "body", "score"]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    _, recs = read_avro_bytes(bytes(payload))
                except (ValueError, zlib.error, KeyError, TypeError):
                    continue
                for rec in recs:
                    rows.append(
                        (
                            mid,
                            rec.get("doc_id"),
                            rec.get("seq"),
                            rec.get("body"),
                            rec.get("score"),
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "payload").mapInPandas(
        extract, AVRO_RECORD_SCHEMA
    )


def documents_as_avro(docs: DataFrame) -> DataFrame:
    """Adapter: per document a REAL OCF with ``1 + doc_id % 3`` records
    of schema (doc_id long, seq long, body [null,string], score double):
    body is the document text except NULL at seq 2 (pins the null-union
    branch), score = doc_id % 97 + seq/8 (dyadic ⇒ IEEE-exact), codec
    deflate for odd ids / null for even, two blocks whenever a payload
    holds ≥ 2 records (pins the multi-block walk), per-doc sync marker.
    Everything is closed-form in (doc_id, text) — ``mm_avro_records``'s
    constructor oracle checks the whole write→read→explode path."""
    schema = {
        "type": "record",
        "name": "doc",
        "fields": [
            {"name": "doc_id", "type": "long"},
            {"name": "seq", "type": "long"},
            {"name": "body", "type": ["null", "string"]},
            {"name": "score", "type": "double"},
        ],
    }

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                k = 1 + did % 3
                recs = [
                    {
                        "doc_id": did,
                        "seq": s,
                        "body": None if s == 2 else (text or ""),
                        "score": did % 97 + s / 8.0,
                    }
                    for s in range(k)
                ]
                sync = (did * 2654435761 % (1 << 128)).to_bytes(16, "little")
                payload = write_avro_bytes(
                    recs,
                    schema,
                    codec="deflate" if did % 2 else "null",
                    sync=sync,
                    max_block_records=1 if k >= 2 else None,
                )
                rows.append((did, "avro", payload))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )
    return docs.select("doc_id", "text").mapInPandas(build, out_schema)


def read_avro_files(spark, path_glob: str) -> DataFrame:
    """Distributed OCF file scan: Spark's binaryFile source lists and
    ships whole files to executors (OCFs are block-compressed row
    files — the per-file unit is the natural split for the small-file
    corpora this format arrives as), then the same payload walk
    explodes records. One file = one row in, zero shuffle out."""
    media = (
        spark.read.format("binaryFile")
        .load(path_glob)
        .selectExpr(
            "cast(abs(xxhash64(path)) as bigint) as media_id",
            "content as payload",
        )
    )
    return avro_records(media)
