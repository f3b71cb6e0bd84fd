"""Protobuf wire walk: encode↔parse round-trips across all four live
wire types, 64-bit varint wrap/zigzag edges, invalid-UTF-8 byte fields,
hostile framing, and the Spark explode lane (incl. the ±2^63 zigzag
values that must survive the Arrow int64 path exactly)."""

from __future__ import annotations

import pandas as pd
import pytest

from seaexplorertools_spark.sources.protowire import (
    encode_pb_fields,
    parse_pb_fields,
)


def test_varint_signed_and_zigzag():
    out = parse_pb_fields(encode_pb_fields([(1, 0, 0), (1, 0, 7), (1, 0, 8),
                                            (1, 0, -1), (1, 0, -9)]))
    assert [f["varint"] for f in out] == [0, 7, 8, -1, -9]
    # zigzag readings: z(0)=0, z(7)=-4, z(8)=4; u=2^64-1 -> -2^63;
    # u=2^64-9 (odd) -> -2^63+4
    assert out[0]["zigzag"] == 0
    assert out[1]["zigzag"] == -4
    assert out[2]["zigzag"] == 4
    assert out[3]["zigzag"] == -(1 << 63)
    assert out[4]["zigzag"] == -(1 << 63) + 4


def test_fixed_widths_and_finite_only_doubles():
    out = parse_pb_fields(
        encode_pb_fields([(3, 1, 499), (3, 1, -500), (4, 5, 76), (4, 5, -1)])
    )
    assert out[0]["fixed_long"] == 499
    assert out[0]["fixed_double"] == 499 * 2.0 ** -1074  # exact denormal
    assert out[1]["fixed_long"] == -500
    assert out[1]["fixed_double"] is None  # NaN bit pattern suppressed
    assert out[2]["fixed_long"] == 76
    assert out[2]["fixed_double"] == 76 * 2.0 ** -149
    assert out[3]["fixed_long"] == -1
    assert out[3]["fixed_double"] is None  # float32 NaN


def test_length_delimited_text_vs_bytes():
    out = parse_pb_fields(
        encode_pb_fields([(2, 2, "héllo ♪"), (5, 2, b"\xff\xfe\x00")])
    )
    assert (out[0]["n_bytes"], out[0]["text"]) == (len("héllo ♪".encode()), "héllo ♪")
    assert (out[1]["n_bytes"], out[1]["text"]) == (3, None)


def test_hostile():
    for bad in (None, b"\x08", b"\x00\x00", b"\x0a\xff", b"\x1b", b"\x09\x01"):
        with pytest.raises(ValueError):
            parse_pb_fields(bad)
    assert parse_pb_fields(b"") == []


def test_spark_lane_exact_int64(spark):
    from seaexplorertools_spark.sources.protowire import (
        documents_as_protobuf,
        pb_fields,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in (0, 1, 9, 18)], "doc_id long, text string"
    )
    rows = {
        (r["media_id"], r["field_idx"]): r
        for r in pb_fields(documents_as_protobuf(docs)).collect()
    }
    assert len(rows) == 4 * 5
    # the ±2^63-adjacent zigzag values arrive bit-exact through Arrow
    assert rows[(18, 0)]["varint"] == -18
    assert rows[(18, 0)]["zigzag"] == (1 << 63) - 9
    assert rows[(9, 0)]["zigzag"] == -(1 << 63) + 4
    assert rows[(1, 0)]["zigzag"] == -1
    assert rows[(0, 1)]["text"] == "text 0"
    assert rows[(0, 4)]["text"] is None and rows[(0, 4)]["n_bytes"] == 3
    mixed = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "payload": [b"\x1b garbage"]})
    )
    assert pb_fields(mixed).count() == 0
