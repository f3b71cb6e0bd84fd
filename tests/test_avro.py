"""Avro OCF reader/writer: binary-encoding round-trips (zigzag longs,
unions, both codecs, multi-block), schema-subset rejection, hostile
framing, the Spark explode lane, and the binaryFile-based file scan."""

from __future__ import annotations

import pandas as pd
import pytest

from seaexplorertools_spark.sources.avro import (
    _read_long,
    _write_long,
    read_avro_bytes,
    write_avro_bytes,
)

SCHEMA = {
    "type": "record",
    "name": "doc",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "seq", "type": "long"},
        {"name": "body", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
    ],
}

RECS = [
    {"doc_id": -5, "seq": 0, "body": "héllo ♪", "score": 1.125},
    {"doc_id": 7, "seq": 1, "body": None, "score": -2.5},
    {"doc_id": 1 << 40, "seq": 2, "body": "x" * 1000, "score": 0.0},
]


def test_zigzag_varint_edges():
    for n in (0, -1, 1, 63, -64, 64, 1 << 62, -(1 << 62), (1 << 62) - 1):
        buf = bytearray()
        _write_long(buf, n)
        got, i = _read_long(bytes(buf), 0)
        assert got == n and i == len(buf)
    with pytest.raises(ValueError):
        _read_long(b"\x80\x80", 0)  # truncated continuation


@pytest.mark.parametrize("codec", ["null", "deflate"])
@pytest.mark.parametrize("mbr", [None, 1, 2])
def test_roundtrip(codec, mbr):
    p = write_avro_bytes(RECS, SCHEMA, codec=codec, sync=b"S" * 16, max_block_records=mbr)
    schema, out = read_avro_bytes(p)
    assert out == RECS
    assert schema["name"] == "doc"


def test_all_primitive_types():
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "b", "type": "boolean"},
            {"name": "i", "type": "int"},
            {"name": "f", "type": "float"},
            {"name": "by", "type": "bytes"},
            {"name": "n", "type": "null"},
            {"name": "u", "type": ["null", "long"]},
        ],
    }
    recs = [
        {"b": True, "i": -42, "f": 0.5, "by": b"\x00\xff", "n": None, "u": 9},
        {"b": False, "i": 0, "f": -1.25, "by": b"", "n": None, "u": None},
    ]
    _, out = read_avro_bytes(write_avro_bytes(recs, schema))
    assert out == recs


def test_empty_file_and_hostile():
    assert read_avro_bytes(write_avro_bytes([], SCHEMA))[1] == []
    for bad in (b"", b"Obj\x01", b"Obj\x02abcd", b"NOPE" * 10):
        with pytest.raises(ValueError):
            read_avro_bytes(bad)
    # corrupt trailing sync marker
    p = bytearray(write_avro_bytes(RECS, SCHEMA, sync=b"S" * 16))
    p[-1] ^= 0xFF
    with pytest.raises(ValueError):
        read_avro_bytes(bytes(p))


def test_unsupported_schema_degrades():
    nested = {
        "type": "record",
        "name": "n",
        "fields": [{"name": "a", "type": {"type": "array", "items": "long"}}],
    }
    with pytest.raises(ValueError):
        write_avro_bytes([{"a": [1]}], nested)
    # reader rejects a payload claiming an unsupported codec
    p = bytearray(write_avro_bytes(RECS, SCHEMA))
    i = p.find(b"deflate") if b"deflate" in p else p.find(b"null")
    p[i : i + 4] = b"zstd"
    with pytest.raises(ValueError):
        read_avro_bytes(bytes(p))


def test_spark_lane(spark):
    """documents_as_avro → avro_records: exact rows for known ids,
    union NULL at seq 2, malformed payloads degrade to zero rows."""
    from seaexplorertools_spark.sources.avro import avro_records, documents_as_avro

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], "doc_id long, text string"
    )
    rows = sorted(
        avro_records(documents_as_avro(docs)).collect(),
        key=lambda r: (r["media_id"], r["seq"]),
    )
    expect = []
    for did in range(6):
        for s in range(1 + did % 3):
            expect.append(
                (did, did, s, None if s == 2 else f"text {did}", did % 97 + s / 8.0)
            )
    assert [
        (r["media_id"], r["doc_id"], r["seq"], r["body"], r["score"]) for r in rows
    ] == expect
    mixed = spark.createDataFrame(
        pd.DataFrame({"media_id": [1, 2], "payload": [b"garbage", None]})
    )
    assert avro_records(mixed).count() == 0


def test_file_scan(spark, tmp_path):
    """read_avro_files: write real .avro files, scan via binaryFile."""
    from seaexplorertools_spark.sources.avro import read_avro_files

    for k in range(3):
        recs = [{"doc_id": k, "seq": 0, "body": f"f{k}", "score": float(k)}]
        (tmp_path / f"part{k}.avro").write_bytes(write_avro_bytes(recs, SCHEMA))
    out = read_avro_files(spark, str(tmp_path / "*.avro"))
    got = sorted((r["doc_id"], r["body"]) for r in out.collect())
    assert got == [(0, "f0"), (1, "f1"), (2, "f2")]
