"""Ogg container parsing (operators/ogg.py): Opus vs Vorbis ident
branches, granule/pre-skip semantics, multi-page accumulation,
truncation tolerance, CRC correctness of the builder, and the
audio-metadata lane integration."""

from __future__ import annotations

from seaexplorertools_spark.operators.ogg import (
    _crc_ogg,
    build_ogg_opus,
    build_ogg_vorbis,
    parse_ogg_header,
)


def test_opus_parse_and_preskip():
    b = build_ogg_opus(channels=2, input_rate=24000, preskip=312, n_samples=9600)
    rate, ch, bits, total, dur = parse_ogg_header(b)
    assert (rate, ch, bits) == (24000, 2, None)
    assert total == 9600  # granule minus pre-skip
    assert dur == 9600 * 1000 // 48000  # Opus granules are 48 kHz ALWAYS


def test_vorbis_parse_uses_codec_rate():
    b = build_ogg_vorbis(channels=1, rate=22050, n_samples=44100)
    rate, ch, bits, total, dur = parse_ogg_header(b)
    assert (rate, ch, total) == (22050, 1, 44100)
    assert dur == 2000


def test_multi_page_granule_accumulates():
    one = build_ogg_opus(n_samples=960, n_audio_pages=1)
    three = build_ogg_opus(n_samples=960, n_audio_pages=3)
    assert parse_ogg_header(one)[3] == parse_ogg_header(three)[3] == 960


def test_truncated_tail_keeps_last_good_page():
    b = build_ogg_opus(n_samples=1920, n_audio_pages=2)
    # cut inside the final page: metadata survives with the prior granule
    rate, ch, bits, total, dur = parse_ogg_header(b[:-10])
    assert total == 960  # first audio page's granule (1920/2), preskip off


def test_non_ogg_and_unknown_ident_return_none():
    assert parse_ogg_header(b"not ogg") is None
    assert parse_ogg_header(None) is None
    # valid page framing but an unknown first packet
    from seaexplorertools_spark.operators.ogg import _page

    assert parse_ogg_header(_page(1, 0, 0, b"FLACford", 2)) is None


def test_builder_crc_is_spec_correct():
    """CRC sanity: zeroing the stored CRC and recomputing reproduces it,
    and a known vector pins the polynomial configuration."""
    b = build_ogg_vorbis()
    page = bytearray(b[: 27 + b[26] + sum(b[27 : 27 + b[26]])])
    stored = int.from_bytes(page[22:26], "little")
    page[22:26] = b"\x00\x00\x00\x00"
    assert _crc_ogg(bytes(page)) == stored
    # unreflected CRC-32/MPEG-2-family check value for '123456789'
    # with init 0 / no xorout (the xiph configuration) is 0x89A1897F
    assert _crc_ogg(b"123456789") == 0x89A1897F


def test_audio_lane_integration(spark):
    from seaexplorertools_spark.operators.multimodal import extract_audio_features
    from seaexplorertools_spark.operators.ogg import documents_as_ogg

    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    rows = {r["media_id"]: r for r in
            extract_audio_features(documents_as_ogg(docs)).collect()}
    for did, r in rows.items():
        assert r["channels"] == 1 + (did // 2) % 2
        assert r["bits"] is None
        if did % 2 == 0:
            assert r["n_frames"] == 960 * (1 + did % 5)
            assert r["n_bytes"] == 95 + 48 * (1 + did % 3)
        else:
            assert r["n_frames"] == 1024 * (1 + did % 7)
            assert r["n_bytes"] == 102


def test_ogg_tags_both_framings():
    from seaexplorertools_spark.operators.ogg import parse_ogg_tags

    tags = [("TITLE", "t ♪"), ("ARTIST", "a"), ("title", "dup ignored")]
    for b in (build_ogg_opus(tags=tags), build_ogg_vorbis(tags=tags)):
        vendor, c, n = parse_ogg_tags(b)
        assert vendor == "seaexplorertools_spark"
        assert c["title"] == "t ♪" and c["artist"] == "a" and n == 3
    # untagged default opus stream: minimal OpusTags, zero comments
    vendor, c, n = parse_ogg_tags(build_ogg_opus())
    assert vendor == "spkg" and c == {} and n == 0
    # untagged vorbis (no comment page at all) and non-ogg: None
    assert parse_ogg_tags(build_ogg_vorbis()) is None
    assert parse_ogg_tags(b"junk") is None


def test_ogg_tags_spark_lane(spark):
    from seaexplorertools_spark.operators.ogg import (
        documents_as_tagged_ogg,
        extract_ogg_tags,
    )

    docs = spark.createDataFrame([(i,) for i in (0, 1, 10, 13)], "doc_id long")
    rows = {r["media_id"]: r for r in
            extract_ogg_tags(documents_as_tagged_ogg(docs)).collect()}
    assert rows[0]["title"] == "doc 0 ♪" and rows[0]["n_comments"] == 4
    assert rows[1]["n_comments"] == 4 and rows[13]["artist"] == "site13"
    assert rows[10]["title"] == "doc 10 ♪"  # duplicate TITLE ignored
