"""ICO (favicon) codec — pure python, the web's small-image container.

Favicons ride every crawl. An ICO is a tiny directory (ICONDIR: type 1,
entry count; 16-byte ICONDIRENTRY each) over per-entry payloads that
are either complete PNG files (modern) or raw DIBs (classic: a
BITMAPINFOHEADER whose biHeight covers the XOR mask *and* the trailing
1-bit AND mask, so the stored height is 2× the visual height,
bottom-up rows). Decode picks the LARGEST entry — the training-pipeline
semantics ("the best version of this icon") — and routes PNG entries
through the existing PNG codec; DIB entries decode the 32-bpp
BGRA-bottom-up form (the dominant real-world variant; lower depths
degrade with ValueError, the chain's per-row contract).

``decode_ico_pixels`` joins the image decode chain after TIFF;
``encode_ico`` emits spec-valid fixtures in both entry flavors, which
is what lets ``mm_ico_pixels`` pin the directory walk, the
largest-entry pick, both payload routes, the BGRA→RGB swizzle and the
bottom-up flip under one constructor oracle.

Reference parity: the reference engine has no image path
(`/root/reference/seaexplorertools/process_adcp.py`); part of the
multimodal surface the brief adds.
"""

from __future__ import annotations

_MAX_PIXELS = 16 * 1024 * 1024  # icons are small; cap hard


def _le(b: bytes, i: int, n: int) -> int:
    return int.from_bytes(b[i : i + n], "little")


def decode_ico_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode the largest entry of an ICO → (w, h, channels, row-major
    RGB(A) bytes). PNG entries keep their decoded channel count; DIB
    entries decode as RGBA (alpha from the 32-bpp pixel)."""
    b = bytes(payload)
    if len(b) < 6 or _le(b, 0, 2) != 0 or _le(b, 2, 2) != 1:
        raise ValueError("ico: bad ICONDIR")
    count = _le(b, 4, 2)
    if not 1 <= count <= 1024:
        raise ValueError("ico: implausible entry count")
    best = None  # (area, offset, size, w, h)
    for k in range(count):
        e = 6 + 16 * k
        if e + 16 > len(b):
            raise ValueError("ico: truncated directory")
        w = b[e] or 256  # 0 means 256
        h = b[e + 1] or 256
        size = _le(b, e + 8, 4)
        off = _le(b, e + 12, 4)
        if off + size > len(b) or size < 16:
            raise ValueError("ico: entry outside payload")
        if best is None or w * h > best[0]:
            best = (w * h, off, size, w, h)
    _area, off, size, w, h = best
    entry = b[off : off + size]
    if entry[:8] == b"\x89PNG\r\n\x1a\n":
        from .multimodal import decode_png_pixels

        return decode_png_pixels(entry)
    # DIB: BITMAPINFOHEADER, biHeight doubled for the AND mask
    if _le(entry, 0, 4) != 40:
        raise ValueError("ico: unsupported DIB header size")
    bw = _le(entry, 4, 4)
    bh_raw = int.from_bytes(entry[8:12], "little", signed=True)
    bpp = _le(entry, 14, 2)
    comp = _le(entry, 16, 4)
    bh = abs(bh_raw) // 2 or abs(bh_raw)
    if comp != 0 or bpp != 32:
        raise ValueError(f"ico: unsupported DIB (bpp={bpp}, comp={comp})")
    if bw * bh > _MAX_PIXELS or bw <= 0 or bh <= 0:
        raise ValueError("ico: DIB exceeds decode cap")
    row_bytes = bw * 4
    need = 40 + row_bytes * bh
    if len(entry) < need:
        raise ValueError("ico: DIB pixel data short")
    out = bytearray(bw * bh * 4)
    for y in range(bh):
        src = 40 + (bh - 1 - y) * row_bytes  # bottom-up
        dst = y * row_bytes
        row = entry[src : src + row_bytes]
        for x in range(bw):
            o = x * 4
            out[dst + o] = row[o + 2]      # R ← B position
            out[dst + o + 1] = row[o + 1]  # G
            out[dst + o + 2] = row[o]      # B ← R position
            out[dst + o + 3] = row[o + 3]  # A
    return bw, bh, 4, bytes(out)


def encode_ico(images: list[tuple[int, int, bytes]], png: bool = False) -> bytes:
    """Emit a spec-valid ICO from (w, h, rgba bytes) images — PNG
    entries when ``png`` else 32-bpp DIBs (bottom-up BGRA + an all-zero
    AND mask, biHeight doubled)."""
    payloads = []
    for w, h, rgba in images:
        if len(rgba) != w * h * 4:
            raise ValueError("encode_ico: rgba size mismatch")
        if png:
            from .multimodal import encode_png

            # encode_png takes RGB; strip alpha (fixture scope)
            rgb = bytearray()
            for i in range(0, len(rgba), 4):
                rgb += rgba[i : i + 3]
            data = encode_png(w, h, bytes(rgb))
        else:
            hdr = (
                (40).to_bytes(4, "little")
                + w.to_bytes(4, "little")
                + (2 * h).to_bytes(4, "little", signed=True)
                + (1).to_bytes(2, "little")
                + (32).to_bytes(2, "little")
                + (0).to_bytes(4, "little")
                + (0).to_bytes(4, "little")
                + (0).to_bytes(16, "little")
            )
            px = bytearray()
            for y in range(h - 1, -1, -1):  # bottom-up
                row = rgba[y * w * 4 : (y + 1) * w * 4]
                for x in range(w):
                    o = x * 4
                    px += bytes((row[o + 2], row[o + 1], row[o], row[o + 3]))
            and_stride = ((w + 31) // 32) * 4  # 1-bpp rows, 4-byte aligned
            data = hdr + bytes(px) + b"\x00" * (and_stride * h)
        payloads.append(data)
    out = bytearray((0).to_bytes(2, "little") + (1).to_bytes(2, "little")
                    + len(images).to_bytes(2, "little"))
    off = 6 + 16 * len(images)
    for (w, h, _), data in zip(images, payloads):
        out += bytes((w % 256, h % 256, 0, 0))
        out += (1).to_bytes(2, "little") + (32).to_bytes(2, "little")
        out += len(data).to_bytes(4, "little") + off.to_bytes(4, "little")
        off += len(data)
    for data in payloads:
        out += data
    return bytes(out)


def documents_as_ico(docs):
    """Adapter: per document a REAL two-entry ICO — a 2×2 decoy entry
    first (the decoder must pick the LARGER second entry) and the real
    image with pixel value ``a + b·y + c`` (a = doc_id % 180,
    b = doc_id % 3, channel offset c ∈ 0..3) at ``w = 4 + doc_id % 9 ×
    h = 3 + doc_id % 7`` — 32-bpp DIB entries for even ids (decode
    keeps RGBA, channels 4), PNG entries for odd (the builder strips
    alpha, channels 3). Values stay < 256 and the means are multiples
    of 1/4, so ``mm_ico_pixels`` pins the directory walk, the
    largest-entry pick, both payload routes, the BGRA swizzle and the
    bottom-up flip in closed form."""
    from collections.abc import Iterator

    import numpy as np
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
                w = 4 + did % 9
                h = 3 + did % 7
                a = did % 180
                b = did % 3
                img = (
                    a
                    + b * np.arange(h, dtype=np.int64)[:, None, None]
                    + np.arange(4, dtype=np.int64)[None, None, :]
                    + np.zeros((1, w, 1), dtype=np.int64)
                ).astype(np.uint8)
                decoy = np.full((2, 2, 4), a, dtype=np.uint8)
                payload = encode_ico(
                    [(2, 2, decoy.tobytes()), (w, h, img.tobytes())],
                    png=did % 2 == 1,
                )
                rows.append((did, "image", payload, w, h))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "width", "height"]
            )

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("payload", BinaryType(), False),
            StructField("width", LongType(), False),
            StructField("height", LongType(), False),
        ]
    )
    return docs.select("doc_id").mapInPandas(build, schema)
