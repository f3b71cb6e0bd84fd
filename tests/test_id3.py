"""ID3v2 walker (operators/id3.py): v2.3/v2.4 × four text encodings,
hardening against corrupt/hostile tags, and the distributed lane."""

from __future__ import annotations

import pytest

from seaexplorertools_spark.operators.id3 import (
    build_id3v2,
    extract_id3,
    parse_id3v2,
)

FIELDS = dict(title="Song Name", artist="The Artist", album="An Album",
              year="1999", track="7")


def test_roundtrip_versions_and_encodings():
    for version in (3, 4):
        for enc in (0, 1, 2, 3):
            tag = build_id3v2(version=version, encoding=enc, **FIELDS)
            out = parse_id3v2(tag + b"\xff\xfb" + bytes(400))
            assert out == FIELDS, (version, enc)
    # non-latin text through the unicode encodings
    for enc in (1, 2, 3):
        out = parse_id3v2(build_id3v2(title="Füür — 歌", encoding=enc))
        assert out["title"] == "Füür — 歌", enc


def test_untagged_and_hostile():
    assert parse_id3v2(b"\xff\xfb" + bytes(100)) is None  # bare MP3
    assert parse_id3v2(None) is None
    assert parse_id3v2(b"ID3") is None  # truncated header
    assert parse_id3v2(b"ID3\x02\x00\x00\x00\x00\x00\x00") is None  # v2.2

    tag = bytearray(build_id3v2(**FIELDS))
    # frame size claiming past the tag end: walk stops, row survives
    i = tag.index(b"TPE1")
    tag[i + 4 : i + 8] = bytes([0x7F] * 4)
    out = parse_id3v2(bytes(tag))
    assert out is not None and out["title"] == FIELDS["title"]
    assert out["artist"] is None  # the corrupt frame and the rest skipped

    # undecodable UTF-16 body: frame skipped, later frames still parse
    tag = bytearray(build_id3v2(title="x", artist="keep", encoding=0))
    j = tag.index(b"TIT2") + 10
    tag[j] = 1  # claim UTF-16 for a 1-byte latin body (no BOM, odd length)
    out = parse_id3v2(bytes(tag))
    assert out["artist"] == "keep"


def test_distributed_lane(spark):
    tagged = build_id3v2(**FIELDS) + b"\xff\xfb" + bytes(200)
    df = spark.createDataFrame(
        [(1, bytearray(tagged)), (2, bytearray(b"\xff\xfbplain mp3")),
         (3, bytearray(b"garbage"))],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r for r in extract_id3(df).collect()}
    assert got[1]["title"] == FIELDS["title"] and got[1]["year"] == "1999"
    assert got[2]["title"] is None and got[3]["title"] is None
    assert len(got) == 3


def test_id3v1_tail_tag_roundtrip():
    from seaexplorertools_spark.operators.id3 import build_id3v1, parse_id3v1

    tag = build_id3v1("T", "A", "B", "1999", track=7)
    assert len(tag) == 128
    p = parse_id3v1(b"\xff\xfbaudio bytes" + tag)
    assert p == {"title": "T", "artist": "A", "album": "B",
                 "year": "1999", "track": "7"}
    # v1.0: no track marker
    p = parse_id3v1(b"x" * 40 + build_id3v1("only", year="2001"))
    assert p["track"] is None and p["title"] == "only"
    # full-width 30-char field, no NUL terminator
    p = parse_id3v1(build_id3v1("x" * 40))
    assert p["title"] == "x" * 30
    assert parse_id3v1(b"no tag here" * 20) is None
    assert parse_id3v1(None) is None
    assert parse_id3v1(b"short") is None


def test_id3_precedence_v2_wins_over_v1(spark):
    from seaexplorertools_spark.operators.id3 import (
        build_id3v1,
        build_id3v2,
        extract_id3,
    )

    body = bytes([0xFF, 0xFB, 0x90, 0x00]) + bytes(413)
    both = build_id3v2(title="v2title") + body + build_id3v1("v1title")
    v1only = body + build_id3v1("v1title", track=3)
    df = spark.createDataFrame(
        [(1, bytearray(both)), (2, bytearray(v1only))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in extract_id3(df).collect()}
    assert rows[1]["title"] == "v2title"  # leading v2 wins
    assert rows[2]["title"] == "v1title" and rows[2]["track"] == "3"
