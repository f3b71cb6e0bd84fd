"""ID3v2 tag extraction — pure-python walk of the MP3 metadata header.

Audio-corpus pipelines filter and dedup on tag metadata (title/artist
families, release years, album grouping) without touching the audio
stream. This module parses the public ID3v2.3/2.4 structure: 10-byte
header (syncsafe tag size), 10-byte frame headers (v2.3 plain-big-endian
frame sizes, v2.4 syncsafe), and the four text encodings of text frames
(ISO-8859-1, UTF-16 w/ BOM, UTF-16BE, UTF-8). Extracted frames: TIT2
(title), TPE1 (artist), TALB (album), TDRC/TYER (year), TRCK (track).

Hardening: every frame size is bounded by the declared tag size, which
is itself bounded by the payload; undecodable text or corrupt frame
structure skips the frame, never the row, never the job — the same
per-row degrade contract as the EXIF walker.

``build_id3v2`` is the matching fixture generator (spec-correct v2.3 or
v2.4 tags in any of the four encodings), which is what lets
``mm_id3_meta`` drive the whole walk under an exact SQL oracle.

Reference scope: no audio surface in the reference engine; LLM-pipeline
multimodal lane (SURVEY §6).
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

_TEXT_FRAMES = {"TIT2": "title", "TPE1": "artist", "TALB": "album",
                "TDRC": "year", "TYER": "year", "TRCK": "track"}

_ENCODINGS = {0: "latin-1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}


def _syncsafe(b: bytes) -> int:
    return (
        ((b[0] & 0x7F) << 21) | ((b[1] & 0x7F) << 14)
        | ((b[2] & 0x7F) << 7) | (b[3] & 0x7F)
    )


def parse_id3v2(payload: bytes | None) -> dict | None:
    """MP3/any payload → {title, artist, album, year, track} (absent
    fields None) or None when no ID3v2.3/2.4 tag leads the payload."""
    if payload is None or len(payload) < 10:
        return None
    b = bytes(payload)
    if b[:3] != b"ID3":
        return None
    major = b[3]
    if major not in (3, 4):
        return None
    tag_size = _syncsafe(b[6:10])
    end = min(10 + tag_size, len(b))
    i = 10
    if b[5] & 0x40:  # extended header present: skip it
        if i + 4 > end:
            return None
        ext = _syncsafe(b[i : i + 4]) if major == 4 else int.from_bytes(b[i : i + 4], "big")
        i += ext if major == 4 else ext + 4
    out = {"title": None, "artist": None, "album": None, "year": None, "track": None}
    while i + 10 <= end:
        fid = b[i : i + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        raw_size = b[i + 4 : i + 8]
        size = _syncsafe(raw_size) if major == 4 else int.from_bytes(raw_size, "big")
        if size <= 0 or i + 10 + size > end:
            break  # corrupt frame: stop the walk, keep what we have
        body = b[i + 10 : i + 10 + size]
        try:
            key = _TEXT_FRAMES.get(fid.decode("ascii"))
        except UnicodeDecodeError:
            key = None
        if key and len(body) >= 1:
            enc = _ENCODINGS.get(body[0])
            if enc is not None:
                try:
                    text = body[1:].decode(enc).strip("\x00").strip()
                    if text and out[key] is None:
                        out[key] = text
                except (UnicodeDecodeError, LookupError):
                    pass  # undecodable text: skip the frame, not the row
        i += 10 + size
    return out  # the ID3 header matched: a tag exists, fields best-effort


def parse_id3v1(payload: bytes | None) -> dict | None:
    """ID3v1/v1.1 TAIL tag: the fixed 128-byte ``TAG`` block at the end
    of the file — title/artist/album 30 bytes each (Latin-1, NUL/space
    padded), year 4, comment 30, genre 1; v1.1 steals the comment's
    last two bytes for ``(0, track)``. Returns the same field dict as
    :func:`parse_id3v2` or None when no tail tag exists."""
    if payload is None or len(payload) < 128:
        return None
    b = bytes(payload)[-128:]
    if b[:3] != b"TAG":
        return None

    def field(lo: int, hi: int) -> str | None:
        s = b[lo:hi].split(b"\x00", 1)[0].decode("latin-1").strip()
        return s or None

    track = None
    if b[125] == 0 and b[126] != 0:  # v1.1 track marker
        track = str(b[126])
    return {
        "title": field(3, 33),
        "artist": field(33, 63),
        "album": field(63, 93),
        "year": field(93, 97),
        "track": track,
    }


def build_id3v1(
    title: str = "",
    artist: str = "",
    album: str = "",
    year: str = "",
    track: int | None = None,
) -> bytes:
    """Spec-valid 128-byte ID3v1 (or v1.1 when ``track`` is set) tail
    block, Latin-1, NUL-padded."""

    def pad(s: str, n: int) -> bytes:
        raw = s.encode("latin-1", "replace")[:n]
        return raw + b"\x00" * (n - len(raw))

    comment = bytearray(30)
    if track is not None:
        comment[28] = 0
        comment[29] = track & 0xFF
    return (
        b"TAG" + pad(title, 30) + pad(artist, 30) + pad(album, 30)
        + pad(year, 4) + bytes(comment) + bytes([255])
    )


ID3_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("title", StringType(), True),
        StructField("artist", StringType(), True),
        StructField("album", StringType(), True),
        StructField("year", StringType(), True),
        StructField("track", StringType(), True),
    ]
)


def extract_id3(media: DataFrame) -> DataFrame:
    """mapInPandas ID3 extraction — ID3v2 (leading tag) first, ID3v1
    (128-byte tail block) as the fallback, the real-world precedence.
    Arrow-batched, zero shuffle, NULL fields for untagged/non-MP3
    payloads (never a failed job)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "title", "artist", "album", "year", "track"]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else None
                p = parse_id3v2(raw)
                if p is None:
                    p = parse_id3v1(raw)
                if p is None:
                    rows.append((mid, None, None, None, None, None))
                else:
                    rows.append(
                        (mid, p["title"], p["artist"], p["album"], p["year"], p["track"])
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "payload").mapInPandas(extract, ID3_SCHEMA)


def build_id3v2(
    title: str | None = None,
    artist: str | None = None,
    album: str | None = None,
    year: str | None = None,
    track: str | None = None,
    version: int = 4,
    encoding: int = 3,
) -> bytes:
    """Spec-correct ID3v2.3/2.4 tag (fixture generator): text frames in
    any of the four encodings, syncsafe sizes where the version says so.
    Prepend to an MP3 payload."""
    if version not in (3, 4):
        raise ValueError("ID3v2.3 or 2.4 only")
    enc_name = _ENCODINGS[encoding]

    def syncsafe(v: int) -> bytes:
        return bytes(
            [(v >> 21) & 0x7F, (v >> 14) & 0x7F, (v >> 7) & 0x7F, v & 0x7F]
        )

    frames = bytearray()
    fields = [("TIT2", title), ("TPE1", artist), ("TALB", album),
              ("TDRC" if version == 4 else "TYER", year), ("TRCK", track)]
    for fid, val in fields:
        if val is None:
            continue
        body = bytes([encoding]) + val.encode(enc_name)
        size = syncsafe(len(body)) if version == 4 else len(body).to_bytes(4, "big")
        frames += fid.encode() + size + b"\x00\x00" + body
    return (
        b"ID3" + bytes([version, 0, 0]) + syncsafe(len(frames)) + bytes(frames)
    )


def documents_as_tagged_mp3(docs: DataFrame) -> DataFrame:
    """Adapter: a real CBR MP3 (two spec-valid MPEG1 Layer III frames —
    enough for the second-header sniff) prefixed with a spec-correct
    ID3v2 tag whose fields, VERSION (2.3/2.4 alternating) and text
    ENCODING (all four, cycling) derive from doc_id — closed form ⇒
    ``mm_id3_meta`` is exact-oracle-able across every version/encoding
    combination. mapInPandas, zero shuffle."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hdr = bytes([0xFF, 0xFB, 0x90, 0x00])  # 128 kbps, 44100 Hz, stereo
        frame = hdr + bytes(144 * 128000 // 44100 - 4)
        mp3 = frame + frame
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                tag = build_id3v2(
                    title=f"Track-{did % 97}",
                    artist=f"Artist-{did % 13}",
                    album=f"Album-{did % 7}",
                    year=str(1970 + did % 50),
                    track=str(1 + did % 20),
                    version=3 if did % 2 else 4,
                    encoding=did % 4,
                )
                rows.append((did, "audio", tag + mp3))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )
    return docs.select("doc_id").mapInPandas(build, schema)


def documents_as_v1_tagged_mp3(docs: DataFrame) -> DataFrame:
    """Adapter: the same two-frame CBR MP3, but tagged with a TAIL
    ID3v1 block instead of a leading v2 tag — odd doc_ids get a v1.1
    track marker, even ones plain v1.0 (track NULL), and one title is
    exactly 30 chars to pin the no-NUL-terminator edge. All fields are
    doc_id arithmetic ⇒ ``mm_id3v1_meta`` is exact-oracle-able, and
    the extractor must take the v1 FALLBACK path (no v2 tag present).
    mapInPandas, zero shuffle."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hdr = bytes([0xFF, 0xFB, 0x90, 0x00])
        frame = hdr + bytes(144 * 128000 // 44100 - 4)
        mp3 = frame + frame
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                title = f"Song-{did % 89}"
                if did % 31 == 0:
                    title = (title + "x" * 30)[:30]  # full-width field
                tag = build_id3v1(
                    title=title,
                    artist=f"Artist-{did % 13}",
                    album=f"Album-{did % 7}",
                    year=str(1970 + did % 50),
                    track=(1 + did % 20) if did % 2 else None,
                )
                rows.append((did, "audio", mp3 + tag))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )
    return docs.select("doc_id").mapInPandas(build, schema)
