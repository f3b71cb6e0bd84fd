"""Standard MIDI File note extraction — the symbolic-music lane.

Music-understanding corpora carry MIDI (SMF — the public MIDI 1.0
file spec): 'MThd' header (format, ntrks, division) + 'MTrk' chunks of
delta-timed events. The training-side features are the NOTES: this
walks every track, pairs note-on with its matching note-off — BOTH
off encodings: explicit 0x8n, and the running-status 0x9n with
velocity 0 that real files overwhelmingly use — and emits one row per
note with tick timing.

Decoder details that matter for hostile input: variable-length
delta-times are capped at 4 bytes (per spec), chunk lengths are
payload-bounded before the walk, running status only persists across
channel messages (a meta/sysex clears it, per spec), unknown channel
messages are skipped by their fixed argument widths, and any framing
violation degrades the whole payload to zero rows (ValueError) — the
shared codec-lane contract (operators/jpegcodec.py etc.).

Arrow-batched mapInPandas, zero shuffle, per-row degrade.

Reference parity: no audio/music path exists in the reference
(`/root/reference/seaexplorertools/process_adcp.py`); part of the
multimodal surface the brief adds.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_ARG_WIDTH = {0x8: 2, 0x9: 2, 0xA: 2, 0xB: 2, 0xC: 1, 0xD: 1, 0xE: 2}


def _varint(b: bytes, i: int) -> tuple[int, int]:
    v = 0
    for k in range(4):  # spec: at most 4 bytes
        if i >= len(b):
            raise ValueError("midi: truncated varint")
        c = b[i]
        i += 1
        v = (v << 7) | (c & 0x7F)
        if not c & 0x80:
            return v, i
    raise ValueError("midi: varint too long")


def encode_midi(
    notes: list[tuple[int, int, int, int, int]], division: int = 96,
    tempo_us: int = 500000,
) -> bytes:
    """Single-track SMF from (start_tick, dur_ticks, channel, key,
    velocity) notes. Note-offs alternate by key parity between the
    explicit 0x8n message and the running-status note-on-velocity-0
    form, so both decoder paths get exercised by any nontrivial
    fixture."""
    events: list[tuple[int, int, int, int, int]] = []  # (tick, kind, ch, key, vel)
    for start, dur, ch, key, vel in notes:
        events.append((start, 1, ch, key, vel))
        events.append((start + dur, 0, ch, key, 0))
    events.sort(key=lambda e: (e[0], e[1]))
    track = bytearray()
    # tempo meta at t=0
    track += b"\x00\xff\x51\x03" + tempo_us.to_bytes(3, "big")
    t = 0
    status = None
    for tick, kind, ch, key, vel in events:
        delta = tick - t
        t = tick
        # varint encode
        chunks = [delta & 0x7F]
        d = delta >> 7
        while d:
            chunks.append(0x80 | (d & 0x7F))
            d >>= 7
        track += bytes(reversed(chunks))
        if kind == 1:
            st = 0x90 | ch
            if st != status:
                track.append(st)
                status = st
            track += bytes([key, vel])
        elif key % 2 == 0:  # explicit note-off message
            track += bytes([0x80 | ch, key, 0x40])
            status = 0x80 | ch
        else:  # note-on velocity 0 (running status when possible)
            st = 0x90 | ch
            if st != status:
                track.append(st)
                status = st
            track += bytes([key, 0])
    track += b"\x00\xff\x2f\x00"  # end of track
    head = b"MThd" + (6).to_bytes(4, "big") + (0).to_bytes(2, "big")
    head += (1).to_bytes(2, "big") + division.to_bytes(2, "big")
    return head + b"MTrk" + len(track).to_bytes(4, "big") + bytes(track)


def decode_midi_notes(b: bytes) -> tuple[int, list[tuple[int, int, int, int, int]]]:
    """→ (division, [(start_tick, dur_ticks, channel, key, velocity)])
    in note-on order (ties broken by track order)."""
    if len(b) < 14 or b[:4] != b"MThd":
        raise ValueError("midi: bad header")
    hlen = int.from_bytes(b[4:8], "big")
    if hlen < 6 or 8 + hlen > len(b):
        raise ValueError("midi: bad header length")
    ntrks = int.from_bytes(b[10:12], "big")
    division = int.from_bytes(b[12:14], "big")
    if division == 0 or division & 0x8000:  # SMPTE timing out of scope
        raise ValueError("midi: unsupported division")
    i = 8 + hlen
    notes = []
    for _ in range(ntrks):
        if i + 8 > len(b):
            raise ValueError("midi: truncated track header")
        if b[i : i + 4] != b"MTrk":
            raise ValueError("midi: bad track magic")
        tlen = int.from_bytes(b[i + 4 : i + 8], "big")
        j = i + 8
        end = j + tlen
        if end > len(b):
            raise ValueError("midi: track overruns payload")
        t = 0
        status = None
        active: dict[tuple[int, int], tuple[int, int, int]] = {}
        while j < end:
            delta, j = _varint(b, j)
            t += delta
            if j >= end:
                raise ValueError("midi: truncated event")
            c = b[j]
            if c == 0xFF:  # meta
                if j + 2 > end:
                    raise ValueError("midi: truncated meta")
                mtype = b[j + 1]
                mlen, j2 = _varint(b, j + 2)
                j = j2 + mlen
                if j > end:
                    raise ValueError("midi: meta overruns track")
                status = None
                if mtype == 0x2F:
                    break
                continue
            if c in (0xF0, 0xF7):  # sysex
                slen, j2 = _varint(b, j + 1)
                j = j2 + slen
                if j > end:
                    raise ValueError("midi: sysex overruns track")
                status = None
                continue
            if c & 0x80:
                status = c
                j += 1
            elif status is None:
                raise ValueError("midi: data byte without status")
            hi = (status >> 4) if status is not None else 0
            if hi < 0x8 or hi > 0xE:
                raise ValueError("midi: bad status byte")
            w = _ARG_WIDTH[hi]
            if j + w > end:
                raise ValueError("midi: truncated channel message")
            args = b[j : j + w]
            j += w
            ch = status & 0x0F
            if hi == 0x9 and args[1] > 0:  # note on
                active[(ch, args[0])] = (t, args[1], len(notes) + len(active))
            elif hi == 0x8 or (hi == 0x9 and args[1] == 0):  # note off
                on = active.pop((ch, args[0]), None)
                if on is not None:
                    start, vel, _ = on
                    notes.append((start, t - start, ch, args[0], vel))
        i = end
    notes.sort(key=lambda n: (n[0], n[2], n[3]))
    return division, notes


MIDI_NOTE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("note_idx", LongType(), False),
        StructField("channel", LongType(), True),
        StructField("key", LongType(), True),
        StructField("velocity", LongType(), True),
        StructField("start_tick", LongType(), True),
        StructField("dur_ticks", LongType(), True),
        StructField("division", LongType(), True),
    ]
)


def midi_notes(media: DataFrame) -> DataFrame:
    """Explode MIDI payloads into one row per paired note, note_idx in
    (start, channel, key) order. Malformed payloads → zero rows."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in MIDI_NOTE_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    division, notes = decode_midi_notes(bytes(payload))
                except ValueError:
                    continue
                for idx, (start, dur, ch, key, vel) in enumerate(notes):
                    rows.append((mid, idx, ch, key, vel, start, dur, division))
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "payload").mapInPandas(
        extract, MIDI_NOTE_SCHEMA
    )


def documents_as_midi(docs: DataFrame) -> DataFrame:
    """Adapter: per document a REAL single-track SMF with ``1 +
    doc_id % 3`` notes — key ``60 + (doc_id + i) % 12``, velocity
    ``64 + i``, start ``i * 48``, duration ``24 + (doc_id % 2) * 12``,
    channel ``doc_id % 4`` — a tempo meta event the walk must skip, and
    note-offs in BOTH encodings (the encoder's running-status rule
    makes consecutive same-channel events use vel-0 form). Closed-form
    in doc_id for ``mm_midi_notes``."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                k = 1 + did % 3
                dur = 24 + (did % 2) * 12
                notes = [
                    (i * 48, dur, did % 4, 60 + (did + i) % 12, 64 + i)
                    for i in range(k)
                ]
                rows.append((did, "midi", encode_midi(notes)))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )
    return docs.select("doc_id").mapInPandas(build, schema)
