"""EXIF metadata extraction — pure-python JPEG APP1 / TIFF IFD walk.

Image-corpus pipelines filter and normalize on EXIF long before pixels
are decoded: orientation (the 8-value rotation/mirror enum a trainer
must apply or strip), camera make/model (dedup families, quality
priors), capture timestamp (dedup windows, temporal splits) and the
Exif-IFD pixel dimensions (cheap decode-free size gate). This module
walks the public structures (JPEG segment markers → APP1 ``Exif\\0\\0``
→ TIFF header → IFD0 → Exif sub-IFD) with every offset and count
bounded by the container size — per-row degrade contract: corrupt or
hostile payloads return None / partial fields, never OOM or kill a job.

``build_exif_app1`` is the matching fixture generator (same role as
encode_png / encode_jpeg): a spec-correct little-endian TIFF block with
IFD0 + Exif sub-IFD and correct inline/offset value placement, spliced
after SOI of any JPEG — which is what lets ``mm_exif_meta`` drive the
whole segment-walk→IFD-walk path under an exact SQL oracle.

Reference scope: no EXIF surface in the reference engine
(process_adcp.py); LLM-pipeline multimodal lane (SURVEY §6).
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

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}

# IFD0 tags
_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_ORIENTATION = 0x0112
_TAG_DATETIME = 0x0132
_TAG_EXIF_IFD = 0x8769
# Exif sub-IFD tags
_TAG_DT_ORIGINAL = 0x9003
_TAG_PIXEL_X = 0xA002
_TAG_PIXEL_Y = 0xA003


def _read_ifd(tiff: bytes, off: int, little: bool) -> dict[int, tuple[int, int, bytes]]:
    """One IFD → {tag: (type, count, raw_value_bytes)}; every offset and
    byte count bounded by the TIFF block before slicing."""
    end = "little" if little else "big"
    if off < 0 or off + 2 > len(tiff):
        raise ValueError("EXIF IFD offset out of range")
    n = int.from_bytes(tiff[off : off + 2], end)
    if n > 512 or off + 2 + 12 * n + 4 > len(tiff):
        raise ValueError("EXIF IFD entry count exceeds container")
    out: dict[int, tuple[int, int, bytes]] = {}
    for k in range(n):
        e = off + 2 + 12 * k
        tag = int.from_bytes(tiff[e : e + 2], end)
        typ = int.from_bytes(tiff[e + 2 : e + 4], end)
        count = int.from_bytes(tiff[e + 4 : e + 8], end)
        size = _TYPE_SIZES.get(typ, 0) * count
        if size == 0 or size > len(tiff):
            continue  # unknown type / absurd count: skip the entry
        if size <= 4:
            raw = tiff[e + 8 : e + 8 + size]
        else:
            voff = int.from_bytes(tiff[e + 8 : e + 12], end)
            if voff + size > len(tiff):
                continue  # hostile offset: skip, don't abort the walk
            raw = tiff[voff : voff + size]
        out[tag] = (typ, count, raw)
    return out


def _as_int(entry: tuple[int, int, bytes], little: bool) -> int | None:
    typ, _count, raw = entry
    end = "little" if little else "big"
    width = {1: 1, 3: 2, 4: 4}.get(typ)
    if width is None or len(raw) < width:
        return None
    return int.from_bytes(raw[:width], end)


def _as_str(entry: tuple[int, int, bytes]) -> str | None:
    typ, _count, raw = entry
    if typ != 2:
        return None
    return raw.split(b"\x00", 1)[0].decode("ascii", "replace")


def parse_exif(payload: bytes | None) -> dict | None:
    """JPEG → EXIF fields dict (``orientation``, ``make``, ``model``,
    ``datetime``, ``datetime_original``, ``pixel_x``, ``pixel_y``; absent
    fields None) or None when the payload is not a JPEG / has no APP1
    Exif segment. Bounded segment walk; corrupt TIFF structure inside an
    APP1 returns None rather than raising (metadata is best-effort — the
    pixel path has its own guards)."""
    if payload is None or len(payload) < 4:
        return None
    b = bytes(payload)
    if b[:2] != b"\xff\xd8":
        return None
    i = 2
    tiff = None
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xDA:  # SOS: metadata segments are over
            break
        seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
        if seg_len < 2 or i + 2 + seg_len > len(b):
            return None
        if marker == 0xE1 and b[i + 4 : i + 10] == b"Exif\x00\x00":
            tiff = b[i + 10 : i + 2 + seg_len]
            break
        i += 2 + seg_len
    if tiff is None or len(tiff) < 8:
        return None
    try:
        if tiff[:2] == b"II":
            little = True
        elif tiff[:2] == b"MM":
            little = False
        else:
            return None
        end = "little" if little else "big"
        if int.from_bytes(tiff[2:4], end) != 42:
            return None
        ifd0 = _read_ifd(tiff, int.from_bytes(tiff[4:8], end), little)
        out = {
            "orientation": _as_int(ifd0[_TAG_ORIENTATION], little)
            if _TAG_ORIENTATION in ifd0 else None,
            "make": _as_str(ifd0[_TAG_MAKE]) if _TAG_MAKE in ifd0 else None,
            "model": _as_str(ifd0[_TAG_MODEL]) if _TAG_MODEL in ifd0 else None,
            "datetime": _as_str(ifd0[_TAG_DATETIME]) if _TAG_DATETIME in ifd0 else None,
            "datetime_original": None,
            "pixel_x": None,
            "pixel_y": None,
        }
        if _TAG_EXIF_IFD in ifd0:
            sub_off = _as_int(ifd0[_TAG_EXIF_IFD], little)
            if sub_off is not None:
                sub = _read_ifd(tiff, sub_off, little)
                if _TAG_DT_ORIGINAL in sub:
                    out["datetime_original"] = _as_str(sub[_TAG_DT_ORIGINAL])
                if _TAG_PIXEL_X in sub:
                    out["pixel_x"] = _as_int(sub[_TAG_PIXEL_X], little)
                if _TAG_PIXEL_Y in sub:
                    out["pixel_y"] = _as_int(sub[_TAG_PIXEL_Y], little)
        return out
    except (ValueError, IndexError):
        return None


EXIF_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("orientation", LongType(), True),
        StructField("make", StringType(), True),
        StructField("model", StringType(), True),
        StructField("datetime", StringType(), True),
        StructField("datetime_original", StringType(), True),
        StructField("pixel_x", LongType(), True),
        StructField("pixel_y", LongType(), True),
    ]
)


def extract_exif(media: DataFrame) -> DataFrame:
    """mapInPandas EXIF extraction over binary payloads — Arrow-batched,
    zero shuffle, NULL row fields for non-JPEG / EXIF-less payloads
    (never a failed job). Module-level parser: workers must import this
    package (same contract as resize_images(mode='decode'))."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "media_id", "orientation", "make", "model",
            "datetime", "datetime_original", "pixel_x", "pixel_y",
        ]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = parse_exif(bytes(payload) if payload is not None else None)
                if p is None:
                    rows.append((mid, None, None, None, None, None, None, None))
                else:
                    rows.append(
                        (
                            mid, p["orientation"], p["make"], p["model"],
                            p["datetime"], p["datetime_original"],
                            p["pixel_x"], p["pixel_y"],
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "payload").mapInPandas(extract, EXIF_SCHEMA)


def build_exif_app1(
    orientation: int | None = None,
    make: str | None = None,
    model: str | None = None,
    datetime: str | None = None,
    datetime_original: str | None = None,
    pixel_x: int | None = None,
    pixel_y: int | None = None,
    little: bool = True,
) -> bytes:
    """Spec-correct APP1 Exif segment (fixture generator): little- or
    big-endian TIFF with IFD0 (+ Exif sub-IFD when any sub field is
    set), inline values for ≤4 bytes and tail-placed data otherwise —
    splice after a JPEG's SOI with ``splice_exif``."""
    end = "little" if little else "big"

    def u16(v: int) -> bytes:
        return v.to_bytes(2, end)

    def u32(v: int) -> bytes:
        return v.to_bytes(4, end)

    ifd0_fields: list[tuple[int, int, bytes]] = []  # (tag, type, data)
    if make is not None:
        ifd0_fields.append((_TAG_MAKE, 2, make.encode() + b"\x00"))
    if model is not None:
        ifd0_fields.append((_TAG_MODEL, 2, model.encode() + b"\x00"))
    if orientation is not None:
        ifd0_fields.append((_TAG_ORIENTATION, 3, u16(orientation)))
    if datetime is not None:
        ifd0_fields.append((_TAG_DATETIME, 2, datetime.encode() + b"\x00"))
    sub_fields: list[tuple[int, int, bytes]] = []
    if datetime_original is not None:
        sub_fields.append((_TAG_DT_ORIGINAL, 2, datetime_original.encode() + b"\x00"))
    if pixel_x is not None:
        sub_fields.append((_TAG_PIXEL_X, 4, u32(pixel_x)))
    if pixel_y is not None:
        sub_fields.append((_TAG_PIXEL_Y, 4, u32(pixel_y)))

    if sub_fields:
        ifd0_fields.append((_TAG_EXIF_IFD, 4, None))  # pointer placeholder
    ifd0_fields.sort(key=lambda f: f[0])  # spec: entries ascend by tag
    sub_fields.sort(key=lambda f: f[0])

    ifd0_off = 8
    sub_off = ifd0_off + 2 + 12 * len(ifd0_fields) + 4 if sub_fields else 0
    tail_off = (
        sub_off + 2 + 12 * len(sub_fields) + 4
        if sub_fields
        else ifd0_off + 2 + 12 * len(ifd0_fields) + 4
    )
    tail = bytearray()

    def entry(tag: int, typ: int, data: bytes | None) -> bytes:
        nonlocal tail
        if data is None:  # the Exif sub-IFD pointer
            return u16(tag) + u16(typ) + u32(1) + u32(sub_off)
        count = len(data) if typ == 2 else len(data) // _TYPE_SIZES[typ]
        if len(data) <= 4:
            return u16(tag) + u16(typ) + u32(count) + data.ljust(4, b"\x00")
        off = tail_off + len(tail)
        tail += data
        return u16(tag) + u16(typ) + u32(count) + u32(off)

    ifd0_bytes = (
        u16(len(ifd0_fields))
        + b"".join(entry(t, ty, d) for t, ty, d in ifd0_fields)
        + u32(0)
    )
    sub_bytes = b""
    if sub_fields:
        sub_bytes = (
            u16(len(sub_fields))
            + b"".join(entry(t, ty, d) for t, ty, d in sub_fields)
            + u32(0)
        )
    tiff = (
        (b"II" if little else b"MM") + u16(42) + u32(ifd0_off)
        + ifd0_bytes + sub_bytes + bytes(tail)
    )
    body = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + (len(body) + 2).to_bytes(2, "big") + body


def splice_exif(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment right after a JPEG's SOI marker."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    return jpeg[:2] + app1 + jpeg[2:]


def documents_as_exif_jpeg(docs: DataFrame) -> DataFrame:
    """Adapter: a real two-tone JPEG per document (same geometry as
    multimodal.documents_as_jpeg) with a spliced spec-correct APP1 Exif
    block whose every field is a deterministic function of doc_id —
    orientation ``1 + id % 8``, make ``Maker-(id % 5)``, model
    ``M-(id % 3)``, timestamps with ``id % 60`` seconds, Exif-IFD pixel
    dims = the JPEG's real dims — alternating little/big-endian TIFF per
    row so both byte orders are driver-checked. Closed form in doc_id ⇒
    ``mm_exif_meta`` is exact-oracle-able. mapInPandas, zero shuffle."""
    import numpy as np

    from .jpegcodec import encode_jpeg

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w = 16 * (1 + did % 3)
                h = 8 * (1 + did % 4)
                img = np.empty((h, w), dtype=np.uint8)
                img[:, : w // 2] = did % 256
                img[:, w // 2 :] = (37 + 11 * did) % 256
                sec = f"{did % 60:02d}"
                app1 = build_exif_app1(
                    orientation=1 + did % 8,
                    make=f"Maker-{did % 5}",
                    model=f"M-{did % 3}",
                    datetime=f"2020:01:01 00:00:{sec}",
                    datetime_original=f"2019:12:31 23:59:{sec}",
                    pixel_x=w,
                    pixel_y=h,
                    little=did % 2 == 0,
                )
                rows.append(
                    (did, "image", splice_exif(encode_jpeg(w, h, img.tobytes()), app1))
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )
    return docs.select("doc_id").mapInPandas(build, schema)
