"""Protobuf wire-format walk — schemaless field extraction.

Protobuf payloads ride every service-log corpus, usually WITHOUT their
.proto at ingest time. What a pipeline can still do — and what this
lane does — is the schemaless wire walk the encoding spec
(https://protobuf.dev/programming-guides/encoding/) defines: a message
is a sequence of (tag = field_no << 3 | wire_type) keys with
self-delimiting values:

- wire type 0: varint (also zigzag-decoded alongside, since sint* can't
  be told apart on the wire)
- wire type 1: 64-bit fixed (decoded as both long and double)
- wire type 2: length-delimited (bytes; UTF-8 text surfaced when it
  decodes cleanly — strings, nested messages and packed arrays share
  this wire type, so the bytes stay authoritative)
- wire type 5: 32-bit fixed (long + float)
- wire types 3/4 (group start/end): obsolete since proto2 — rejected.

Rows: (media_id, field_idx, field_no, wire_type, varint, zigzag,
fixed_long, fixed_double, n_bytes, text). Every length is
payload-bounded; malformed payloads degrade to zero rows.

The fixture's value domain is bijective on the wire, so
``mm_protobuf_fields`` pins the tag split, all four live wire types and
the length walk under an exact constructor oracle.
"""

from __future__ import annotations

import math
import struct
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

_MAX_LEN = 64 * 1024 * 1024
_MAX_FIELD_NO = 536870911  # 2^29 - 1, the spec's ceiling


def _read_varint(b: bytes, i: int) -> tuple[int, int]:
    u = shift = 0
    while True:
        if i >= len(b):
            raise ValueError("pb: truncated varint")
        byte = b[i]
        i += 1
        u |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
        if shift > 63:
            raise ValueError("pb: varint too long")
    return u & 0xFFFFFFFFFFFFFFFF, i


def _write_varint(out: bytearray, u: int) -> None:
    u &= 0xFFFFFFFFFFFFFFFF
    while True:
        byte = u & 0x7F
        u >>= 7
        if u:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return


def parse_pb_fields(payload: bytes) -> list[dict]:
    """Walk one wire message into field dicts (see module docstring)."""
    if payload is None:
        raise ValueError("pb: null payload")
    b = bytes(payload)
    out = []
    i = 0
    while i < len(b):
        key, i = _read_varint(b, i)
        field_no = key >> 3
        wt = key & 7
        if field_no == 0 or field_no > _MAX_FIELD_NO:
            raise ValueError("pb: invalid field number")
        rec = {
            "field_idx": len(out), "field_no": field_no, "wire_type": wt,
            "varint": None, "zigzag": None, "fixed_long": None,
            "fixed_double": None, "n_bytes": None, "text": None,
        }
        if wt == 0:
            u, i = _read_varint(b, i)
            rec["varint"] = u - (1 << 64) if u >= 1 << 63 else u
            rec["zigzag"] = (u >> 1) ^ -(u & 1)
        elif wt == 1:
            if i + 8 > len(b):
                raise ValueError("pb: truncated fixed64")
            raw = b[i : i + 8]
            i += 8
            rec["fixed_long"] = int.from_bytes(raw, "little", signed=True)
            d = struct.unpack("<d", raw)[0]
            # a schemaless walk can't know double vs sfixed64: surface
            # the FINITE double interpretation only (NaN/Inf -> NULL)
            rec["fixed_double"] = d if math.isfinite(d) else None
        elif wt == 2:
            n, i = _read_varint(b, i)
            if n > _MAX_LEN or i + n > len(b):
                raise ValueError("pb: bad length-delimited size")
            raw = b[i : i + n]
            i += n
            rec["n_bytes"] = n
            try:
                rec["text"] = raw.decode("utf-8")
            except UnicodeDecodeError:
                rec["text"] = None
        elif wt == 5:
            if i + 4 > len(b):
                raise ValueError("pb: truncated fixed32")
            raw = b[i : i + 4]
            i += 4
            rec["fixed_long"] = int.from_bytes(raw, "little", signed=True)
            f32 = float(struct.unpack("<f", raw)[0])
            rec["fixed_double"] = f32 if math.isfinite(f32) else None
        else:
            raise ValueError(f"pb: unsupported wire type {wt}")
        out.append(rec)
    return out


def encode_pb_fields(fields: list[tuple[int, int, object]]) -> bytes:
    """Emit wire bytes from (field_no, wire_type, value) triples —
    value is an int for types 0/1/5 (two's-complement for fixeds) and
    str/bytes for type 2."""
    out = bytearray()
    for field_no, wt, v in fields:
        _write_varint(out, (field_no << 3) | wt)
        if wt == 0:
            _write_varint(out, v)
        elif wt == 1:
            out += int(v).to_bytes(8, "little", signed=True)
        elif wt == 2:
            raw = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            _write_varint(out, len(raw))
            out += raw
        elif wt == 5:
            out += int(v).to_bytes(4, "little", signed=True)
        else:
            raise ValueError(f"encode_pb_fields: wire type {wt}")
    return bytes(out)


PB_FIELD_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("field_idx", LongType(), False),
        StructField("field_no", LongType(), False),
        StructField("wire_type", LongType(), False),
        StructField("varint", LongType(), True),
        StructField("zigzag", LongType(), True),
        StructField("fixed_long", LongType(), True),
        StructField("fixed_double", DoubleType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("text", StringType(), True),
    ]
)


def pb_fields(media: DataFrame) -> DataFrame:
    """Explode protobuf wire payloads into one row per field —
    Arrow-batched mapInPandas, zero shuffle, per-payload degrade."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in PB_FIELD_SCHEMA.fields]
        int_cols = {"field_idx", "field_no", "wire_type", "varint",
                    "zigzag", "fixed_long", "n_bytes"}
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    fields = parse_pb_fields(bytes(payload))
                except ValueError:
                    continue
                for f in fields:
                    rows.append((mid, *[f[c] for c in cols[1:]]))
            # nullable Int64 construction: the default tuple path coerces
            # int+None columns to float64, which silently rounds zigzag
            # values near ±2^63 (Arrow then refuses the unsafe cast)
            out = pd.DataFrame(rows, columns=cols, dtype=object)
            for c in cols:
                if c in int_cols or c == "media_id":
                    out[c] = pd.array(
                        [None if v is None else int(v) for v in out[c]],
                        dtype="Int64",
                    )
                elif c == "fixed_double":
                    out[c] = out[c].astype("float64")
            yield out

    return media.select("media_id", "payload").mapInPandas(extract, PB_FIELD_SCHEMA)


def documents_as_protobuf(docs: DataFrame) -> DataFrame:
    """Adapter: per document a real wire message — field 1 a varint
    (doc_id, exercising the negative 10-byte form on ids divisible by
    9 via value −doc_id), field 2 the document text length-delimited,
    field 3 a fixed64 carrying doc_id % 1000 − 500, field 4 a fixed32
    (doc_id % 77), and field 5 a BINARY blob (0xFF 0xFE + doc_id % 256:
    invalid UTF-8, text must be NULL while n_bytes = 3). All closed-form
    for ``mm_protobuf_fields``."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                v1 = -did if did % 9 == 0 else did
                payload = encode_pb_fields(
                    [
                        (1, 0, v1),
                        (2, 2, text or ""),
                        (3, 1, did % 1000 - 500),
                        (4, 5, did % 77),
                        (5, 2, bytes((0xFF, 0xFE, did % 256))),
                    ]
                )
                rows.append((did, "protobuf", payload))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )
    return docs.select("doc_id", "text").mapInPandas(build, schema)
