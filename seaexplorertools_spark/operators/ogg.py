"""Ogg container parsing (Opus / Vorbis idents) — pure python, public
xiph.org framing. Completes the web-audio metadata coverage next to
WAV/FLAC/MP3: an Ogg stream is a sequence of ``OggS`` pages (27-byte
header + lacing table + segments); the first packet identifies the
codec (``OpusHead`` / ``\\x01vorbis``) and the LAST page's granule
position gives the stream length (48 kHz PCM samples for Opus, minus
pre-skip; codec-rate samples for Vorbis).

Scope: metadata only — Opus/Vorbis entropy decode is out of scope
(documented in README's gated-deps table); signal features stay NULL
for these rows, exactly like the pre-round-8 MP3 contract.

Hostile-input contract (the EXIF/ID3/Vorbis-tag standard): every walk
is bounded by the payload, a corrupt page ends the walk at the last
good page (partial downloads keep their metadata), non-Ogg payloads
return None. Page CRCs are NOT verified on parse (tolerant read — the
builder below emits real CRCs so strict tools accept the fixtures).
"""

from __future__ import annotations

_MAX_PAGES = 65536


def _crc_ogg(data: bytes) -> int:
    """Ogg page CRC: unreflected CRC-32, poly 0x04C11DB7, init 0, no
    final xor (xiph spec)."""
    crc = 0
    for byte in data:
        crc ^= byte << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if crc & 0x80000000 else (crc << 1) & 0xFFFFFFFF
    return crc


def parse_ogg_header(payload: bytes | None) -> tuple | None:
    """Ogg bytes → ``(sample_rate, channels, None, total_samples,
    duration_ms)`` — the audio-metadata tuple shape shared with
    WAV/FLAC/MP3 parsing (bits is None: lossy). Opus: rate is
    OpusHead's input rate (informational; granules are 48 kHz and
    duration uses them, pre-skip subtracted). Vorbis: rate from the
    ident header, granules in codec-rate samples. None for non-Ogg or
    an unrecognized first packet."""
    if payload is None or len(payload) < 28:
        return None
    b = bytes(payload)
    if b[:4] != b"OggS" or b[4] != 0:
        return None
    # first page → codec ident packet
    nseg = b[26]
    seg_end = 27 + nseg
    if seg_end > len(b):
        return None
    body_len = sum(b[27:seg_end])
    ident = b[seg_end : seg_end + body_len]
    if ident[:8] == b"OpusHead" and len(ident) >= 19:
        channels = ident[9]
        preskip = int.from_bytes(ident[10:12], "little")
        in_rate = int.from_bytes(ident[12:16], "little") or 48000
        gran_rate = 48000
    elif ident[:7] == b"\x01vorbis" and len(ident) >= 16:
        channels = ident[11]
        in_rate = int.from_bytes(ident[12:16], "little")
        preskip = 0
        gran_rate = in_rate
    else:
        return None
    if channels == 0 or in_rate == 0 or gran_rate == 0:
        return None

    # walk pages to the last complete one; its granule position is the
    # stream length. A corrupt/truncated tail keeps the last good page.
    pos = 0
    last_granule = 0
    pages = 0
    while pos + 27 <= len(b) and pages < _MAX_PAGES:
        if b[pos : pos + 4] != b"OggS":
            break
        nseg = b[pos + 26]
        if pos + 27 + nseg > len(b):
            break
        body = sum(b[pos + 27 : pos + 27 + nseg])
        if pos + 27 + nseg + body > len(b):
            break
        gran = int.from_bytes(b[pos + 6 : pos + 14], "little", signed=True)
        if gran >= 0:  # -1 marks a page with no finished packet
            last_granule = gran
        pos += 27 + nseg + body
        pages += 1
    total = max(last_granule - preskip, 0)
    return in_rate, channels, None, total, (total * 1000) // gran_rate


def _page(
    serial: int, seq: int, granule: int, body: bytes, header_type: int = 0
) -> bytes:
    """One spec-valid Ogg page (real CRC) with ≤255·255 body bytes."""
    segs = []
    rest = body
    while True:
        segs.append(min(len(rest), 255))
        rest = rest[255:]
        if segs[-1] < 255:
            break
    head = (
        b"OggS"
        + bytes([0, header_type])
        + granule.to_bytes(8, "little", signed=True)
        + serial.to_bytes(4, "little")
        + seq.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + bytes([len(segs)])
        + bytes(segs)
    )
    page = head + body
    crc = _crc_ogg(page)
    return page[:22] + crc.to_bytes(4, "little") + page[26:]


def build_ogg_opus(
    channels: int = 2,
    input_rate: int = 48000,
    preskip: int = 312,
    n_samples: int = 960,
    n_audio_pages: int = 1,
    tags: list[tuple[str, str]] | None = None,
) -> bytes:
    """Spec-valid minimal Ogg Opus stream: BOS OpusHead page, OpusTags
    page (fixed minimal body, or a real Vorbis-comment block when
    ``tags`` is given), ``n_audio_pages`` opaque audio pages splitting
    ``n_samples`` 48 kHz samples, EOS flag on the last."""
    head = (
        b"OpusHead" + bytes([1, channels])
        + preskip.to_bytes(2, "little")
        + input_rate.to_bytes(4, "little")
        + b"\x00\x00" + bytes([0])
    )
    if tags is None:
        tag_body = (
            b"OpusTags" + (4).to_bytes(4, "little") + b"spkg"
            + (0).to_bytes(4, "little")
        )
    else:
        tag_body = b"OpusTags" + _comment_block(tags)
    out = _page(7, 0, 0, head, 0x02) + _page(7, 1, 0, tag_body)
    per = n_samples // n_audio_pages if n_audio_pages else 0
    acc = 0
    for k in range(n_audio_pages):
        acc += per if k < n_audio_pages - 1 else n_samples - per * (n_audio_pages - 1)
        flags = 0x04 if k == n_audio_pages - 1 else 0
        out += _page(7, 2 + k, preskip + acc, b"\xfc" * 20, flags)
    return out


def build_ogg_vorbis(
    channels: int = 2,
    rate: int = 44100,
    n_samples: int = 4096,
    tags: list[tuple[str, str]] | None = None,
) -> bytes:
    """Spec-valid minimal Ogg Vorbis stream: BOS ident page
    [+ comment-header page when ``tags`` is given] + one EOS audio page
    carrying the final granule."""
    ident = (
        b"\x01vorbis" + (0).to_bytes(4, "little") + bytes([channels])
        + rate.to_bytes(4, "little") + b"\x00" * 12 + bytes([0xB8, 0x01])
    )
    out = _page(9, 0, 0, ident, 0x02)
    seq = 1
    if tags is not None:
        out += _page(9, seq, 0, b"\x03vorbis" + _comment_block(tags) + b"\x01")
        seq += 1
    return out + _page(9, seq, n_samples, b"\x00" * 16, 0x04)


def documents_as_ogg(docs):
    """Adapter: one REAL Ogg stream per document — even doc_ids Opus
    (input rate 48000/24000/16000 by id % 3, 960·(1 + id % 5) samples
    across 1 + id % 3 audio pages), odd ids Vorbis (rate
    44100/32000/22050, 1024·(1 + id % 7) samples); channels
    1 + (id // 2) % 2 for both. Page bodies are fixed-size so even the
    byte count is doc_id arithmetic — everything ``mm_ogg_meta`` checks
    is closed form. Arrow-batched mapInPandas, zero shuffle."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                ch = 1 + (did // 2) % 2
                if did % 2 == 0:
                    payload = build_ogg_opus(
                        channels=ch,
                        input_rate=(48000, 24000, 16000)[did % 3],
                        n_samples=960 * (1 + did % 5),
                        n_audio_pages=1 + did % 3,
                    )
                else:
                    payload = build_ogg_vorbis(
                        channels=ch,
                        rate=(44100, 32000, 22050)[did % 3],
                        n_samples=1024 * (1 + did % 7),
                    )
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


def _comment_block(tags) -> bytes:
    vendor = b"seaexplorertools_spark"
    out = bytearray(len(vendor).to_bytes(4, "little") + vendor)
    out += len(tags).to_bytes(4, "little")
    for k, v in tags:
        field = f"{k}={v}".encode("utf-8")
        out += len(field).to_bytes(4, "little") + field
    return bytes(out)


def parse_ogg_tags(payload: bytes | None) -> tuple | None:
    """Ogg bytes → the same ``(vendor, comments, n_comments)`` tuple as
    FLAC's ``parse_vorbis_comment``: OpusTags and the Vorbis comment
    header both carry a verbatim Vorbis-comment block (little-endian,
    UTF-8) — Ogg just frames it in the stream's SECOND packet/page.
    None for non-Ogg payloads or a missing/unparseable tag packet."""
    from .vorbis import _parse_block

    if payload is None or len(payload) < 28:
        return None
    b = bytes(payload)
    pos = 0
    page_no = 0
    while pos + 27 <= len(b) and page_no < 4:
        if b[pos : pos + 4] != b"OggS":
            return None
        nseg = b[pos + 26]
        if pos + 27 + nseg > len(b):
            return None
        body_len = sum(b[pos + 27 : pos + 27 + nseg])
        body = b[pos + 27 + nseg : pos + 27 + nseg + body_len]
        if page_no > 0:  # tag packet is the second packet of the stream
            if body[:8] == b"OpusTags":
                return _parse_block(body[8:])
            if body[:7] == b"\x03vorbis":
                return _parse_block(body[7:])
        pos += 27 + nseg + body_len
        page_no += 1
    return None


def extract_ogg_tags(media):
    """mapInPandas Ogg tag extraction — same output shape as FLAC's
    ``extract_flac_tags`` (vendor/title/artist/date/n_comments): one
    Vorbis-comment surface across both containers. NULLs for non-Ogg /
    untagged payloads, zero shuffle."""
    from collections.abc import Iterator

    import pandas as pd

    from .vorbis import FLAC_TAGS_SCHEMA

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "vendor", "title", "artist", "date", "n_comments"]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = parse_ogg_tags(
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


def documents_as_tagged_ogg(docs):
    """Adapter: tagged Ogg streams alternating codec framing — even
    doc_ids OpusTags, odd ids the Vorbis comment-header packet — with
    the SAME field derivations as `documents_as_tagged_flac` (title
    ``doc «id» ♪``, artist ``site«id % 40»``, date ``2000 + id % 26``,
    GENRE on odd ids, duplicate TITLE on ids divisible by 10), so one
    oracle shape pins the comment block through BOTH Ogg framings.
    mapInPandas, zero shuffle."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                tags = [
                    ("TITLE", f"doc {did} ♪"),
                    ("ARTIST", f"site{did % 40}"),
                    ("DATE", str(2000 + did % 26)),
                ]
                if did % 2:
                    tags.append(("GENRE", "corpus"))
                if did % 10 == 0:
                    tags.append(("TITLE", "duplicate ignored"))
                payload = (
                    build_ogg_opus(tags=tags) if did % 2 == 0
                    else build_ogg_vorbis(tags=tags)
                )
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
