"""BSON dump format: width ladder, skip types, hostile framing, and
the Spark lane."""

from __future__ import annotations

import pytest

from seaexplorertools_spark.sources.bson import (
    decode_document,
    decode_dump,
    encode_document,
)


def test_skip_types_do_not_desync():
    # hand-build: objectid (0x07) + datetime (0x09) + binary (0x05)
    # between two real elements
    body = bytearray()
    body += b"\x10a\x00" + (1).to_bytes(4, "little")
    body += b"\x07o\x00" + b"\x01" * 12
    body += b"\x09t\x00" + (123456).to_bytes(8, "little")
    body += b"\x05b\x00" + (3).to_bytes(4, "little") + b"\x00xyz"
    body += b"\x10z\x00" + (2).to_bytes(4, "little")
    doc = (len(body) + 5).to_bytes(4, "little") + bytes(body) + b"\x00"
    got, i = decode_document(doc)
    assert got == {"a": 1, "o": None, "t": None, "b": None, "z": 2}
    assert i == len(doc)


def test_int_widths():
    enc = encode_document({"small": 7, "big": 2**40, "neg": -(2**40)})
    assert enc[4] == 0x10  # int32 element
    got, _ = decode_document(enc)
    assert got == {"small": 7, "big": 2**40, "neg": -(2**40)}


@pytest.mark.parametrize(
    "bad",
    [
        b"\x04\x00\x00\x00",            # size < 5
        b"\x06\x00\x00\x00\x10a",        # element overruns
        b"\x05\x00\x00\x00\x01",         # missing terminator
        b"\xff\xff\xff\x7f\x00",         # giant declared size
        # unterminated cstring
        b"\x0b\x00\x00\x00\x10aaaaa\x00",
    ],
)
def test_hostile(bad):
    with pytest.raises(ValueError):
        decode_dump(bad)


def test_empty_dump_is_zero_records():
    assert decode_dump(b"") == []


def test_spark_lane(spark):
    from seaexplorertools_spark.sources.bson import (
        bson_records,
        documents_as_bson,
    )

    docs = spark.createDataFrame(
        [(0, "alpha"), (4, "delta"), (5, None)], "doc_id long, text string"
    )
    rows = bson_records(documents_as_bson(docs)).orderBy(
        "media_id", "seq"
    ).collect()
    assert [(r["media_id"], r["seq"]) for r in rows] == [
        (0, 0), (4, 0), (4, 1), (5, 0), (5, 1), (5, 2),
    ]
    by = {(r["media_id"], r["seq"]): r for r in rows}
    assert by[(0, 0)]["body"] == "alpha" and by[(0, 0)]["score"] == 0.0
    assert by[(5, 2)]["body"] is None  # seq 2 → null
    assert by[(4, 1)]["score"] == 4 + 0.25


def test_spark_lane_degrades(spark):
    from seaexplorertools_spark.sources.bson import bson_records

    media = spark.createDataFrame(
        [(1, b"\x01\x02"), (2, None)], "media_id long, payload binary"
    )
    assert bson_records(media).count() == 0


def test_spark_lane_degrades_wrong_typed_fields(spark):
    """A WELL-FORMED dump whose fields have the wrong types (string
    score, int body, string doc_id) must degrade the FIELD to NULL —
    not raise inside the Spark task (round-9 ADVICE)."""
    from seaexplorertools_spark.sources.bson import bson_records, encode_document

    payload = encode_document(
        {"doc_id": "not-an-int", "seq": 0, "body": 7, "score": "high"}
    ) + encode_document({"doc_id": 3, "seq": 1, "body": "ok", "score": 1.5})
    media = spark.createDataFrame(
        [(1, bytes(payload))], "media_id long, payload binary"
    )
    rows = bson_records(media).orderBy("seq").collect()
    assert len(rows) == 2
    assert rows[0]["doc_id"] is None and rows[0]["body"] is None
    assert rows[0]["score"] is None
    assert rows[1]["doc_id"] == 3 and rows[1]["score"] == 1.5
