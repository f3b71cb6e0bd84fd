"""CBOR (RFC 8949) wire format: argument-width ladder round-trips,
indefinite-length strings/arrays/maps, transparent tags, float16/32,
unassigned simple values, hostile framing / nesting caps, and the
Spark lane."""

from __future__ import annotations

import pytest

from seaexplorertools_spark.sources.cbor import (
    decode_stream,
    decode_value,
    encode_tagged,
    encode_value,
)

ROUNDTRIP = [
    None, True, False,
    0, 1, 23, 24, 255, 256, 65535, 65536, 2**32 - 1, 2**32, 2**63 - 1,
    -1, -24, -25, -256, -257, -(2**32), -(2**32) - 1, -(2**63),
    0.5, -1.25, 3.141592653589793,
    "", "héllo ♪", "x" * 23, "y" * 300, "z" * 70000,
    b"\x00\xff", b"w" * 300,
    [1, "a", None, [2.5]], {"k": 1, "nested": {"a": [True]}},
    list(range(30)), {str(i): i for i in range(30)},
]


@pytest.mark.parametrize("v", ROUNDTRIP, ids=lambda v: repr(v)[:24])
def test_roundtrip(v):
    enc = encode_value(v)
    got, i = decode_value(enc)
    assert got == v and i == len(enc)


def test_indefinite_forms():
    # text: 0x7F 'ab' 'c' break
    assert decode_value(b"\x7f\x62ab\x61c\xff") == ("abc", 7)
    # bytes: 0x5F chunks
    assert decode_value(b"\x5f\x42\x01\x02\xff") == (b"\x01\x02", 5)
    # array and map
    assert decode_value(b"\x9f\x01\x02\xff") == ([1, 2], 4)
    assert decode_value(b"\xbf\x61a\x01\xff") == ({"a": 1}, 5)
    # nested indefinite array inside definite array
    assert decode_value(b"\x81\x9f\x01\xff") == ([[1]], 4)


def test_tags_are_transparent():
    assert decode_value(encode_tagged(0, "2026-01-01")) == ("2026-01-01", 12)
    assert decode_value(encode_tagged(1, 42))[0] == 42
    # nested tags
    b = bytearray()
    b += encode_tagged(55799, None)  # self-described CBOR tag
    assert decode_value(bytes(b))[0] is None


def test_floats_and_simples():
    assert decode_value(b"\xf9\x3c\x00") == (1.0, 3)  # float16
    assert decode_value(b"\xfa\x3f\x80\x00\x00") == (1.0, 5)  # float32
    assert decode_value(b"\xf7")[0] is None  # undefined
    assert decode_value(b"\xf0")[0] is None  # unassigned simple 16
    assert decode_value(b"\xf8\x20")[0] is None  # simple(32) via 1 byte


def test_hostile():
    for bad in (
        b"\x62a",          # truncated text
        b"\x7f\x62ab",     # unterminated indefinite text
        b"\x7f\x9f\xff\xff",  # non-string chunk in indefinite text
        b"\x9f\x01",       # unterminated indefinite array
        b"\xff",           # bare break
        b"\x1f",           # indefinite integer
        b"\xdf",           # reserved tag with indefinite arg
        b"\x5b\x7f\xff\xff\xff\xff\xff\xff\xff",  # giant declared bytes
        b"\x1c",           # reserved additional info 28
        b"\xa1\x81\x00\x00",  # container-typed map key
    ):
        with pytest.raises(ValueError):
            decode_stream(bad)
    # nesting bomb
    with pytest.raises(ValueError):
        decode_stream(b"\x81" * 40 + b"\x00")


def test_stream_skips_tagged_trailer():
    s = encode_value({"a": 1}) + encode_tagged(1, 7)
    assert decode_stream(s) == [{"a": 1}, 7]


def test_spark_lane(spark):
    from seaexplorertools_spark.sources.cbor import (
        cbor_records,
        documents_as_cbor,
    )

    docs = spark.createDataFrame(
        [(0, "alpha"), (1, "beta"), (2, None), (5, "eps")],
        "doc_id long, text string",
    )
    out = cbor_records(documents_as_cbor(docs)).orderBy("media_id", "seq")
    rows = out.collect()
    # k = 1 + doc_id % 3 records per doc
    assert [(r["media_id"], r["seq"]) for r in rows] == [
        (0, 0), (1, 0), (1, 1), (2, 0), (2, 1), (2, 2), (5, 0), (5, 1), (5, 2),
    ]
    by = {(r["media_id"], r["seq"]): r for r in rows}
    assert by[(0, 0)]["body"] == "alpha" and by[(0, 0)]["score"] == 0.0
    assert by[(2, 0)]["body"] == ""  # NULL text → ''
    assert by[(2, 2)]["body"] is None  # seq 2 → null byte
    assert by[(5, 1)]["score"] == 5 + 0.25


def test_spark_lane_degrades_on_junk(spark):
    from seaexplorertools_spark.sources.cbor import cbor_records

    media = spark.createDataFrame(
        [(1, bytes([0xFF, 0x00, 0x01])), (2, None)],
        "media_id long, payload binary",
    )
    assert cbor_records(media).count() == 0


def test_spark_lane_degrades_wrong_typed_fields(spark):
    """A WELL-FORMED dump whose fields have the wrong types (string
    score, int body, string doc_id) must degrade the FIELD to NULL —
    not raise inside the Spark task (round-9 ADVICE)."""
    from seaexplorertools_spark.sources.cbor import cbor_records, encode_value

    payload = encode_value(
        {"doc_id": "not-an-int", "seq": 0, "body": 7, "score": "high"}
    ) + encode_value({"doc_id": 3, "seq": 1, "body": "ok", "score": 1.5})
    media = spark.createDataFrame(
        [(1, bytes(payload))], "media_id long, payload binary"
    )
    rows = cbor_records(media).orderBy("seq").collect()
    assert len(rows) == 2
    assert rows[0]["doc_id"] is None and rows[0]["body"] is None
    assert rows[0]["score"] is None
    assert rows[1]["doc_id"] == 3 and rows[1]["score"] == 1.5
