"""MIDI note extraction (operators/midicodec.py): round-trips, both
note-off encodings, meta/sysex skipping, unclosed notes, hostile
framing, and the Spark lane."""

from __future__ import annotations

import pytest

from seaexplorertools_spark.operators.midicodec import (
    decode_midi_notes,
    documents_as_midi,
    encode_midi,
    midi_notes,
)


def test_roundtrip_both_off_encodings():
    # key 60 (even → explicit 0x8n off), key 61 (odd → vel-0 off)
    notes = [(0, 24, 2, 60, 64), (48, 24, 2, 61, 65), (96, 36, 2, 64, 70)]
    b = encode_midi(notes)
    assert b"\x82" in b  # an explicit note-off status byte exists
    division, got = decode_midi_notes(b)
    assert division == 96 and got == notes


def test_overlapping_and_crosschannel():
    notes = [(0, 100, 0, 60, 80), (10, 20, 0, 62, 81), (10, 20, 1, 62, 82)]
    _, got = decode_midi_notes(encode_midi(notes))
    assert sorted(got) == sorted(notes)


def test_meta_and_sysex_skipped_and_unclosed_dropped():
    # hand-build: header + track with sysex, a note-on never closed
    track = bytearray()
    track += b"\x00\xf0\x02\x01\x02"  # sysex len 2
    track += b"\x00\x90\x3c\x40"  # note on, never off
    track += b"\x00\xff\x2f\x00"
    b = (
        b"MThd" + (6).to_bytes(4, "big") + b"\x00\x00\x00\x01\x00\x60"
        + b"MTrk" + len(track).to_bytes(4, "big") + bytes(track)
    )
    division, got = decode_midi_notes(b)
    assert got == []  # unclosed note dropped, sysex didn't desync


@pytest.mark.parametrize(
    "bad",
    [
        b"",
        b"RIFF1234",
        b"MThd\x00\x00\x00\x06\x00\x00\x00\x01\x80\x00",  # SMPTE division
        b"MThd\x00\x00\x00\x06\x00\x00\x00\x01\x00\x60MTrk\x00\x00\x00\x10",
        # data byte with no running status
        b"MThd\x00\x00\x00\x06\x00\x00\x00\x01\x00\x60"
        b"MTrk\x00\x00\x00\x03\x00\x3c\x40",
        # varint bomb (5 continuation bytes)
        b"MThd\x00\x00\x00\x06\x00\x00\x00\x01\x00\x60"
        b"MTrk\x00\x00\x00\x06\xff\xff\xff\xff\xff\x00",
    ],
)
def test_hostile(bad):
    with pytest.raises(ValueError):
        decode_midi_notes(bad)


def test_spark_lane(spark):
    docs = spark.createDataFrame([(0,), (1,), (5,)], "doc_id long")
    rows = midi_notes(documents_as_midi(docs)).orderBy(
        "media_id", "note_idx"
    ).collect()
    # k = 1 + doc_id % 3 notes per doc
    assert [(r["media_id"], r["note_idx"]) for r in rows] == [
        (0, 0), (1, 0), (1, 1), (5, 0), (5, 1), (5, 2),
    ]
    r = rows[3]  # doc 5, note 0
    assert (r["channel"], r["key"], r["velocity"]) == (1, 60 + 5 % 12, 64)
    assert (r["start_tick"], r["dur_ticks"], r["division"]) == (0, 36, 96)


def test_spark_lane_degrades(spark):
    media = spark.createDataFrame(
        [(1, b"not midi"), (2, None)], "media_id long, payload binary"
    )
    assert midi_notes(media).count() == 0
