"""ADTS/AAC header lane (operators/aac.py): sync walk, CRC header,
strict rejection, and the Spark lane + sniff-chain disambiguation
against MP3 (both sync on 0xFF; layer bits differ)."""

from __future__ import annotations

from seaexplorertools_spark.operators.aac import (
    build_adts,
    parse_adts_header,
)


def test_parse_basic_and_crc():
    # 3 frames, 48 kHz (index 3), stereo, 7-byte headers
    s = build_adts(sr_index=3, channels=2, n_frames=3, payload_len=50)
    assert len(s) == 3 * 57
    assert parse_adts_header(s) == (48000, 2, None, 3072, 3072 * 1000 // 48000)
    # CRC variant: 9-byte headers, same sample math
    c = build_adts(sr_index=4, channels=1, n_frames=2, payload_len=10, crc=True)
    assert len(c) == 2 * 19
    assert parse_adts_header(c) == (44100, 1, None, 2048, 2048 * 1000 // 44100)


def test_strict_walk_rejects():
    s = build_adts(sr_index=3, channels=2, n_frames=2, payload_len=20)
    assert parse_adts_header(s[:-1]) is None  # truncated final frame
    assert parse_adts_header(s[:5]) is None  # shorter than one header
    assert parse_adts_header(None) is None
    assert parse_adts_header(b"\x00" * 40) is None
    # corrupt second sync word → lost sync rejection
    bad = bytearray(s)
    bad[27] = 0x00
    assert parse_adts_header(bytes(bad)) is None
    # reserved sampling_frequency_index (15) rejected
    h = bytearray(build_adts(sr_index=15, channels=1, n_frames=1, payload_len=4))
    assert parse_adts_header(bytes(h)) is None
    # channel_configuration 0 (in-band PCE) rejected
    z = bytearray(build_adts(sr_index=3, channels=0, n_frames=1, payload_len=4))
    assert parse_adts_header(bytes(z)) is None


def test_mp3_adts_mutual_exclusion():
    """Each parser must reject the other codec's stream — the sniff
    chain's correctness rests on the layer bits (MP3=01, ADTS=00)."""
    from seaexplorertools_spark.operators.multimodal import parse_mp3_header

    adts = build_adts(sr_index=3, channels=2, n_frames=2, payload_len=30)
    assert parse_mp3_header(adts) is None
    assert parse_adts_header(adts) is not None


def test_spark_lane(spark):
    from seaexplorertools_spark.operators.aac import documents_as_adts
    from seaexplorertools_spark.operators.multimodal import (
        extract_audio_features,
    )

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in (0, 1, 2, 3, 4, 10)], "doc_id long, text string"
    )
    rows = {
        r["media_id"]: r
        for r in extract_audio_features(documents_as_adts(docs)).collect()
    }
    # doc 0: sr 48000, 1ch, 2 frames, CRC header (9+100), full stream
    assert rows[0]["sample_rate"] == 48000 and rows[0]["channels"] == 1
    assert rows[0]["n_bytes"] == 2 * 109 and rows[0]["n_frames"] == 2048
    # doc 3: truncated (3 % 7 == 3) → NULL metadata, real byte count
    assert rows[3]["sample_rate"] is None and rows[3]["n_frames"] is None
    assert rows[3]["n_bytes"] == 5 * (7 + 103) - 1
    # doc 10: ALSO truncated (10 % 7 == 3) → NULL metadata
    assert rows[10]["sample_rate"] is None
    # doc 4: sr 44100 (4%3=1), 1ch, 6 frames, CRC header (4%4=0)
    assert rows[4]["sample_rate"] == 44100 and rows[4]["channels"] == 1
    assert rows[4]["duration_ms"] == 6 * 1024 * 1000 // 44100
    assert all(r["bits"] is None for r in rows.values())
