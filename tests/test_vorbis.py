"""FLAC VORBIS_COMMENT tags (operators/vorbis.py): little-endian
framing inside the big-endian container, case-insensitive keys,
first-occurrence-wins, hostile lengths, degrade contract, and that the
tag block doesn't disturb sample decode."""

from __future__ import annotations

import numpy as np

from seaexplorertools_spark.operators.flaccodec import (
    decode_flac_samples,
    encode_flac,
)
from seaexplorertools_spark.operators.vorbis import parse_vorbis_comment


def _flac(tags):
    return encode_flac(8000, np.arange(24, dtype=np.int64)[:, None], tags=tags)


def test_roundtrip_and_case_insensitive_keys():
    b = _flac([("TITLE", "hello ♪"), ("Artist", "me"), ("date", "2020")])
    vendor, c, n = parse_vorbis_comment(b)
    assert vendor == "seaexplorertools_spark"
    assert c["title"] == "hello ♪" and c["artist"] == "me" and c["date"] == "2020"
    assert n == 3


def test_first_occurrence_wins_and_value_equals_sign():
    b = _flac([("K", "a=b=c"), ("k", "second")])
    _, c, n = parse_vorbis_comment(b)
    assert c["k"] == "a=b=c" and n == 2  # '=' inside the VALUE survives


def test_untagged_and_non_flac_return_none():
    assert parse_vorbis_comment(_flac(None) if False else encode_flac(
        8000, np.zeros(8, dtype=np.int64)[:, None]
    )) is None
    assert parse_vorbis_comment(b"not flac at all") is None
    assert parse_vorbis_comment(None) is None


def test_hostile_lengths_degrade_not_crash():
    b = bytearray(_flac([("TITLE", "x")]))
    # find the comment block (type 4 after the 4+4+34 streaminfo span)
    pos = 4 + 4 + 34
    assert b[pos] & 0x7F == 4
    # corrupt the vendor length to point past the block
    b[pos + 4 : pos + 8] = (10**6).to_bytes(4, "little")
    assert parse_vorbis_comment(bytes(b)) is None
    # truncated field length: parser keeps what it parsed before it
    b2 = _flac([("TITLE", "keep"), ("ARTIST", "lost")])
    cut = b2[: b2.find(b"ARTIST") - 2]  # cut inside the second field
    # (re-wrap is invalid FLAC framing → whole parse degrades to None)
    assert parse_vorbis_comment(cut) is None


def test_malformed_field_skipped_but_counted():
    import struct

    vendor = b"v"
    fields = [b"noequalsign", b"TITLE=ok"]
    body = struct.pack("<I", len(vendor)) + vendor + struct.pack("<I", len(fields))
    for f in fields:
        body += struct.pack("<I", len(f)) + f
    blk = bytes([0x04]) + len(body).to_bytes(3, "big") + body
    si = encode_flac(8000, np.zeros(8, dtype=np.int64)[:, None])
    # splice: fLaC + STREAMINFO(non-last) + comment(last) + frames
    payload = si[:4] + bytes([si[4] & 0x7F]) + si[5:42] + blk + si[42:]
    vendor_s, c, n = parse_vorbis_comment(payload)
    assert c == {"title": "ok"} and n == 2


def test_tag_block_invisible_to_sample_decode():
    samples = (np.arange(48, dtype=np.int64) % 7 - 3)[:, None]
    plain = encode_flac(8000, samples)
    tagged = encode_flac(8000, samples, tags=[("TITLE", "t")])
    for payload in (plain, tagged):
        sr, ch, s = decode_flac_samples(payload)
        assert sr == 8000 and ch == 1
        np.testing.assert_array_equal(s, samples)


def test_spark_lane_and_adapter(spark):
    from seaexplorertools_spark.operators.vorbis import (
        documents_as_tagged_flac,
        extract_flac_tags,
    )

    docs = spark.createDataFrame([(i,) for i in (0, 1, 7, 10)], "doc_id long")
    rows = {r["media_id"]: r for r in
            extract_flac_tags(documents_as_tagged_flac(docs)).collect()}
    assert rows[0]["title"] == "doc 0 ♪" and rows[0]["n_comments"] == 4
    assert rows[1]["n_comments"] == 4  # odd: GENRE present
    assert rows[7]["artist"] == "site7" and rows[7]["date"] == "2007"
    assert rows[10]["title"] == "doc 10 ♪"  # duplicate TITLE ignored
    # degrade: garbage payload → NULLs
    junk = spark.createDataFrame(
        [(99, bytearray(b"fLaC but broken"))], "media_id long, payload binary"
    )
    r = extract_flac_tags(junk).collect()[0]
    assert r["vendor"] is None and r["n_comments"] is None
