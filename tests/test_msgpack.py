"""MessagePack wire format: full-ladder round-trips, stream decode,
ext skipping, hostile framing / nesting caps, and the Spark lane."""

from __future__ import annotations

import pandas as pd
import pytest

from seaexplorertools_spark.sources.msgpack import (
    pack_value,
    unpack_stream,
    unpack_value,
)

ROUNDTRIP = [
    None, True, False,
    0, 1, 127, 128, 255, 256, 65535, 65536, 2**32, 2**63 - 1,
    -1, -32, -33, -128, -129, -32768, -32769, -(2**31), -(2**31) - 1, -(2**63),
    0.5, -1.25, 3.141592653589793,
    "", "héllo ♪", "x" * 40, "y" * 70000,
    b"\x00\xff", b"z" * 300,
    [1, "a", None, [2.5]], {"k": 1, "nested": {"a": [True]}},
    list(range(20)), {str(i): i for i in range(20)},
]


@pytest.mark.parametrize("v", ROUNDTRIP, ids=lambda v: repr(v)[:24])
def test_roundtrip(v):
    enc = pack_value(v)
    got, i = unpack_value(enc)
    assert got == v and i == len(enc)


def test_stream_and_ext_skip():
    s = pack_value({"a": 1}) + pack_value(7) + pack_value([1, 2])
    assert unpack_stream(s) == [{"a": 1}, 7, [1, 2]]
    # fixext4 is structurally consumed and decodes to None
    assert unpack_stream(b"\xd6\x01ABCD\x05") == [None, 5]
    # ext8 with declared length
    assert unpack_stream(b"\xc7\x03\x01XYZ\x2a") == [None, 42]


def test_hostile():
    for bad in (b"\xd9", b"\xda\xff\xff", b"\x91", b"\xc7\x10", b"\xcb\x00"):
        with pytest.raises(ValueError):
            unpack_stream(bad)
    # nesting bomb
    with pytest.raises(ValueError):
        unpack_stream(b"\x91" * 40 + b"\x00")
    # declared giant string
    with pytest.raises(ValueError):
        unpack_stream(b"\xdb\x7f\xff\xff\xff")


def test_spark_lane(spark):
    from seaexplorertools_spark.sources.msgpack import (
        documents_as_msgpack,
        msgpack_records,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], "doc_id long, text string"
    )
    rows = sorted(
        msgpack_records(documents_as_msgpack(docs)).collect(),
        key=lambda r: (r["media_id"], r["seq"]),
    )
    expect = []
    for did in range(6):
        for s in range(1 + did % 3):
            expect.append(
                (did, did, s, None if s == 2 else f"text {did}", did % 89 + s / 4.0)
            )
    assert [
        (r["media_id"], r["doc_id"], r["seq"], r["body"], r["score"]) for r in rows
    ] == expect
    mixed = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "payload": [b"\xd9garbage"]})
    )
    assert msgpack_records(mixed).count() == 0


def test_spark_lane_degrades_wrong_typed_fields(spark):
    """A WELL-FORMED dump whose fields have the wrong types (string
    score, int body, string doc_id) must degrade the FIELD to NULL —
    not raise inside the Spark task (round-9 ADVICE)."""
    from seaexplorertools_spark.sources.msgpack import msgpack_records, pack_value

    payload = pack_value(
        {"doc_id": "not-an-int", "seq": 0, "body": 7, "score": "high"}
    ) + pack_value({"doc_id": 3, "seq": 1, "body": "ok", "score": 1.5})
    media = spark.createDataFrame(
        [(1, bytes(payload))], "media_id long, payload binary"
    )
    rows = msgpack_records(media).orderBy("seq").collect()
    assert len(rows) == 2
    assert rows[0]["doc_id"] is None and rows[0]["body"] is None
    assert rows[0]["score"] is None
    assert rows[1]["doc_id"] == 3 and rows[1]["score"] == 1.5
