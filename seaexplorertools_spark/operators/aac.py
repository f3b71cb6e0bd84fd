"""ADTS (AAC) frame-header parsing — pure python, public-spec only
(ISO/IEC 13818-7 §6.2 / ISO/IEC 14496-3 §1.A.3: the 7/9-byte ADTS
header that wraps raw AAC in .aac files and HLS/MPEG-TS audio). The
sync walk validates EVERY frame header (sync + layer bits) and sums
raw-data blocks, so byte count, sample rate, channel configuration,
total samples (1024 per raw block) and duration are all recovered
without touching the AAC payload.

Scope: metadata only — AAC entropy decode is out of scope (the loud
boundary where a real deployment brings ffmpeg), exactly like the Ogg
lane (operators/ogg.py). This closes the web-audio metadata gap for
the ADTS class: WAV/FLAC/MP3/Ogg/AIFF/M4A already parse, so a crawl's
audio inventory query now covers every major container.

Reference parity: none (`/root/reference/seaexplorertools/
process_adcp.py` has no media path) — part of the multimodal surface
the brief adds.
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

# ISO/IEC 14496-3 table 1.18 — sampling_frequency_index → rate
ADTS_RATES = [
    96000, 88200, 64000, 48000, 44100, 32000, 24000,
    22050, 16000, 12000, 11025, 8000, 7350,
]


def parse_adts_header(payload: bytes | None) -> tuple | None:
    """Walk an ADTS stream frame-by-frame and return the shared audio
    5-tuple ``(sample_rate, channels, bits, n_frames, duration_ms)``
    with ``bits`` None (lossy) and ``n_frames`` the total PCM sample
    count (1024 per raw data block). None unless EVERY frame header
    syncs (0xFFF + layer 00), frame lengths chain exactly to EOF, and
    the stream has ≥1 frame — the same strictness as
    multimodal.parse_mp3_header's double-sync validation, extended to
    the whole stream (headers are cheap; payloads are skipped)."""
    if payload is None or len(payload) < 7:
        return None
    b = bytes(payload)
    if b[0] != 0xFF or (b[1] & 0xF6) != 0xF0:
        return None
    sf_index = (b[2] >> 2) & 0xF
    if sf_index >= len(ADTS_RATES):
        return None
    rate = ADTS_RATES[sf_index]
    channels = ((b[2] & 1) << 2) | (b[3] >> 6)
    if channels == 0:
        # channel_configuration 0 = in-band PCE; needs payload decode
        return None
    i, samples = 0, 0
    while i < len(b):
        if i + 7 > len(b) or b[i] != 0xFF or (b[i + 1] & 0xF6) != 0xF0:
            return None  # lost sync / truncated header
        flen = ((b[i + 3] & 3) << 11) | (b[i + 4] << 3) | (b[i + 5] >> 5)
        hdr = 7 if (b[i + 1] & 1) else 9  # protection_absent=0 → +2 CRC
        if flen < hdr or i + flen > len(b):
            return None  # frame overruns the payload
        samples += 1024 * ((b[i + 6] & 3) + 1)
        i += flen
    if samples == 0:
        return None
    return (rate, channels, None, samples, samples * 1000 // rate)


def build_adts(
    sr_index: int,
    channels: int,
    n_frames: int,
    payload_len: int,
    crc: bool = False,
    fill: bytes = b"\xa5",
) -> bytes:
    """Spec-valid minimal ADTS stream: ``n_frames`` AAC-LC frames, each
    header (7 bytes, +2 CRC when ``crc``) + ``payload_len`` filler
    bytes; buffer fullness pinned to 0x7FF (the VBR marker)."""
    hdr_len = 9 if crc else 7
    flen = hdr_len + payload_len
    out = bytearray()
    for _ in range(n_frames):
        h = bytearray(7)
        h[0] = 0xFF
        # MPEG-4 (ID=0), layer 00, protection_absent unless CRC
        h[1] = 0xF0 | (0 if crc else 1)
        # profile 01 = AAC LC; top bit of channel config rides byte 2
        h[2] = (1 << 6) | ((sr_index & 0xF) << 2) | ((channels >> 2) & 1)
        h[3] = ((channels & 3) << 6) | ((flen >> 11) & 3)
        h[4] = (flen >> 3) & 0xFF
        h[5] = ((flen & 7) << 5) | 0x1F  # fullness bits 10..6 = all-ones
        h[6] = 0xFC  # fullness bits 5..0 = all-ones, raw_blocks-1 = 0
        out += h
        if crc:
            out += b"\x00\x00"
        out += (fill * payload_len)[:payload_len]
    return bytes(out)


def documents_as_adts(docs: DataFrame) -> DataFrame:
    """Adapter: one REAL ADTS stream per document — rate
    48000/44100/32000 by id % 3 (indexes 3/4/5), channels 1 + id % 2,
    2 + id % 5 frames of 100 + id % 50 payload bytes; ids % 4 == 0
    carry the 9-byte CRC header (protection_absent=0), and ids
    % 7 == 3 are truncated by one byte so the strict sync walk rejects
    them (the NULL-metadata branch exists under the oracle). Byte
    count and every parsed field are closed-form doc_id arithmetic for
    ``mm_adts_meta``. Arrow-batched mapInPandas, zero shuffle."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                payload = build_adts(
                    sr_index=3 + did % 3,
                    channels=1 + did % 2,
                    n_frames=2 + did % 5,
                    payload_len=100 + did % 50,
                    crc=did % 4 == 0,
                )
                if did % 7 == 3:
                    payload = payload[:-1]  # planted truncation → NULL
                rows.append((did, "audio", payload))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )
    return docs.select("doc_id").mapInPandas(build, schema)
