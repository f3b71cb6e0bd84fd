"""FLAC VORBIS_COMMENT tag extraction — the third member of the
metadata-tag family (EXIF for images `operators/exif.py`, ID3v2 for MP3
`operators/id3.py`, Vorbis comments for FLAC/Ogg here). Pure python,
public xiph.org framing: inside FLAC, metadata block type 4 holds
little-endian length-prefixed UTF-8 ``KEY=value`` fields after a
vendor string — note the endianness flip vs. the big-endian FLAC
container around it, the classic parser trap.

Same hostile-input contract as EXIF/ID3: every length is bounded by its
container, a corrupt field is skipped per-field, a corrupt block or a
payload without tags degrades the row to NULLs — never a failed job.
Keys are case-insensitive per spec (matched lowercase); the FIRST
occurrence of a repeated key wins (deterministic under any field
order). Arrow-batched mapInPandas, zero shuffle.

Reference scope: no audio surface in process_adcp.py; LLM-pipeline lane
(SURVEY §6) — tag metadata is the cheap pre-decode gate a web-audio
corpus filters on before spending codec CPU.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def parse_vorbis_comment(payload: bytes | None) -> tuple | None:
    """FLAC bytes → ``(vendor, comments: dict[lower-key, value],
    n_comments)`` from the VORBIS_COMMENT block, or None when the
    payload is not FLAC / carries no (parseable) tag block. n_comments
    counts fields PRESENT in the stream, including ones later dropped
    as malformed or repeated."""
    if payload is None or len(payload) < 8:
        return None
    b = bytes(payload)
    if b[:4] != b"fLaC":
        return None
    i = 4
    while i + 4 <= len(b):
        hdr = b[i]
        length = int.from_bytes(b[i + 1 : i + 4], "big")
        if i + 4 + length > len(b):
            return None
        if (hdr & 0x7F) == 4:
            return _parse_block(b[i + 4 : i + 4 + length])
        i += 4 + length
        if hdr & 0x80:
            return None  # last block seen, no comment block present
    return None


def _parse_block(block: bytes) -> tuple | None:
    if len(block) < 8:
        return None
    vlen = int.from_bytes(block[0:4], "little")
    if 4 + vlen + 4 > len(block):
        return None
    vendor = block[4 : 4 + vlen].decode("utf-8", "replace")
    pos = 4 + vlen
    n = int.from_bytes(block[pos : pos + 4], "little")
    pos += 4
    comments: dict[str, str] = {}
    seen = 0
    for _ in range(min(n, 4096)):  # bound hostile counts by a sane cap
        if pos + 4 > len(block):
            break
        flen = int.from_bytes(block[pos : pos + 4], "little")
        pos += 4
        if pos + flen > len(block):
            break
        field = block[pos : pos + flen]
        pos += flen
        seen += 1
        eq = field.find(b"=")
        if eq <= 0:
            continue  # malformed field: skipped, still counted
        key = field[:eq].decode("ascii", "replace").lower()
        if key not in comments:
            comments[key] = field[eq + 1 :].decode("utf-8", "replace")
    return vendor, comments, seen


FLAC_TAGS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("vendor", StringType(), True),
        StructField("title", StringType(), True),
        StructField("artist", StringType(), True),
        StructField("date", StringType(), True),
        StructField("n_comments", LongType(), True),
    ]
)


def extract_flac_tags(media: DataFrame) -> DataFrame:
    """mapInPandas Vorbis-comment extraction: vendor + the
    title/artist/date trio (the corpus-filter fields) + total field
    count. Non-FLAC / untagged payloads yield NULLs."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "vendor", "title", "artist", "date", "n_comments"]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = parse_vorbis_comment(
                    bytes(payload) if payload is not None else None
                )
                if p is None:
                    rows.append((mid, None, None, None, None, None))
                else:
                    vendor, c, n = p
                    rows.append(
                        (mid, vendor, c.get("title"), c.get("artist"),
                         c.get("date"), n)
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "payload").mapInPandas(
        extract, FLAC_TAGS_SCHEMA
    )


def documents_as_tagged_flac(docs: DataFrame) -> DataFrame:
    """Adapter: the documents_as_flac ramp streams with a VORBIS_COMMENT
    block whose fields are doc_id arithmetic — TITLE ``doc «id» ♪``
    (UTF-8 beyond ASCII on purpose), ARTIST ``site«id % 40»``, DATE
    ``«2000 + id % 26»``, plus a GENRE field on odd ids (so n_comments
    alternates 3/4) written with a repeated-then-ignored duplicate
    TITLE on ids divisible by 10 (first occurrence must win). Keys are
    written UPPERCASE — the parser must match case-insensitively."""
    import numpy as np

    from .flaccodec import encode_flac

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 16 + did % 16
                samples = (did % 100 - 50) + np.zeros(n, dtype=np.int64)
                tags = [
                    ("TITLE", f"doc {did} ♪"),
                    ("ARTIST", f"site{did % 40}"),
                    ("DATE", str(2000 + did % 26)),
                ]
                if did % 2:
                    tags.append(("GENRE", "corpus"))
                if did % 10 == 0:
                    tags.append(("TITLE", "duplicate ignored"))
                rows.append(
                    (did, "audio", encode_flac(8000, samples[:, None], tags=tags))
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    from pyspark.sql.types import BinaryType

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )
    return docs.select("doc_id").mapInPandas(build, schema)
