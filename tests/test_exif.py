"""EXIF walker (operators/exif.py): roundtrips both endiannesses,
inline vs tail-placed values, hostile offset/count hardening, and the
distributed lane over a mixed corpus."""

from __future__ import annotations

import numpy as np
import pytest

from seaexplorertools_spark.operators.exif import (
    build_exif_app1,
    extract_exif,
    parse_exif,
    splice_exif,
)
from seaexplorertools_spark.operators.jpegcodec import encode_jpeg

FULL = dict(
    orientation=6,
    make="TestCam",
    model="X100",
    datetime="2020:01:02 03:04:05",
    datetime_original="2019:12:31 23:59:58",
    pixel_x=1920,
    pixel_y=1080,
)


def _jpeg(val=100, w=16, h=8):
    return encode_jpeg(w, h, np.full((h, w), val, np.uint8).tobytes())


def test_roundtrip_both_endians_and_partial():
    jp = _jpeg()
    for little in (True, False):
        out = parse_exif(splice_exif(jp, build_exif_app1(little=little, **FULL)))
        assert out == FULL, little
    # short strings are INLINE (≤4 bytes incl. NUL); long ones tail-placed
    out = parse_exif(splice_exif(jp, build_exif_app1(make="abc", model="a-long-model-name")))
    assert out["make"] == "abc" and out["model"] == "a-long-model-name"
    # partial block: absent fields stay None
    out = parse_exif(splice_exif(jp, build_exif_app1(orientation=1)))
    assert out["orientation"] == 1
    assert out["make"] is None and out["pixel_x"] is None


def test_non_exif_and_hostile_payloads():
    jp = _jpeg()
    assert parse_exif(jp) is None  # JPEG without APP1
    assert parse_exif(b"not a jpeg") is None
    assert parse_exif(None) is None

    app1 = build_exif_app1(**FULL)
    full = splice_exif(jp, app1)
    # corrupt IFD0 offset far past the TIFF block → None, not a crash
    bad = bytearray(full)
    i = bad.index(b"II\x2a\x00")
    bad[i + 4 : i + 8] = (0x7FFFFFFF).to_bytes(4, "little")
    assert parse_exif(bytes(bad)) is None
    # hostile entry count → None (bounded before materializing)
    bad = bytearray(full)
    bad[i + 8 : i + 10] = (0xFFFF).to_bytes(2, "little")
    assert parse_exif(bytes(bad)) is None
    # hostile VALUE offset inside one entry: that entry is skipped, the
    # walk survives and the rest of the fields still parse
    bad = bytearray(full)
    j = bad.index(b"TestCam")  # make is tail-placed; find its entry offset
    # corrupt the tail-offset of the make entry (first 4-byte LE offset
    # pointing at the tail): brute-force replace its pointer bytes
    ptr = (j - (i)).to_bytes(4, "little")
    k = bytes(bad).index(ptr, i)
    bad[k : k + 4] = (0x7FFFFFF0).to_bytes(4, "little")
    out = parse_exif(bytes(bad))
    assert out is not None and out["make"] is None and out["orientation"] == 6


def test_distributed_lane_mixed_corpus(spark):
    jp = _jpeg()
    rows = [
        (1, bytearray(splice_exif(jp, build_exif_app1(**FULL)))),
        (2, bytearray(jp)),
        (3, bytearray(b"garbage")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in extract_exif(df).collect()}
    assert got[1]["orientation"] == 6 and got[1]["make"] == "TestCam"
    assert got[1]["pixel_x"] == 1920 and got[1]["datetime_original"] == FULL["datetime_original"]
    assert got[2]["orientation"] is None
    assert got[3]["make"] is None
    assert len(got) == 3  # NULL rows kept, never dropped or failed
