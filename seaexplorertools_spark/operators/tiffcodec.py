"""Baseline TIFF 6.0 codec — pure python, no imaging libs.

Decodes the baseline subset real scanned-document / screenshot corpora
are dominated by: 8-bit grayscale and RGB rasters, strip-organized,
uncompressed (Compression=1) or PackBits (Compression=32773), both byte
orders (``II`` little-endian and ``MM`` big-endian), chunky planar
layout. Everything else — tiled layouts, LZW/JPEG-in-TIFF, 1/4/16-bit
depths, planar-separate — degrades with ``ValueError`` so the image
lane's per-row degrade contract holds (a hostile payload can never fail
the job).

Shares the decode-chain contract of the PNG/JPEG/GIF/BMP codecs
(multimodal._decode_image_pixels): ``decode_tiff_pixels(payload) ->
(width, height, channels, row-major pixel bytes)``. The IFD walk is the
same TIFF structure operators/exif.py walks for JPEG Exif blobs — here
it is the top-level container, and the raster itself is decoded.

Every offset/length is container-bounded before use: a crafted IFD
cannot allocate beyond ``width*height*channels`` (itself capped) or read
outside the payload.

Reference parity: the reference engine treats imagery as opaque blobs
(`/root/reference/seaexplorertools/process_adcp.py` has no image path);
this codec is part of the multimodal training-data surface the brief
adds on top.
"""

from __future__ import annotations

# TIFF field type → byte width (only the ones baseline IFDs use)
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}

_MAX_PIXELS = 64 * 1024 * 1024  # 64 MP decode cap — bounds allocation


def _read_ifd(b: bytes, off: int, bo: str) -> dict[int, list[int]]:
    """Parse one IFD into {tag: [values...]}; integer types only (the
    raster tags are all SHORT/LONG). Out-of-range entries are skipped
    per-entry, mirroring exif.py's hostile-offset rule."""
    if off + 2 > len(b):
        raise ValueError("tiff: IFD offset out of range")
    n = int.from_bytes(b[off : off + 2], bo)
    if n > 4096:
        raise ValueError("tiff: implausible IFD entry count")
    out: dict[int, list[int]] = {}
    for k in range(n):
        e = off + 2 + 12 * k
        if e + 12 > len(b):
            break
        tag = int.from_bytes(b[e : e + 2], bo)
        typ = int.from_bytes(b[e + 2 : e + 4], bo)
        cnt = int.from_bytes(b[e + 4 : e + 8], bo)
        sz = _TYPE_SIZES.get(typ)
        if sz is None or typ not in (1, 3, 4):  # BYTE/SHORT/LONG only
            continue
        total = sz * cnt
        if total <= 4:
            voff = e + 8
        else:
            voff = int.from_bytes(b[e + 8 : e + 12], bo)
            if voff + total > len(b):
                continue
        out[tag] = [
            int.from_bytes(b[voff + i * sz : voff + (i + 1) * sz], bo)
            for i in range(cnt)
        ]
    return out


def _unpackbits(data: bytes, expected: int) -> bytes:
    """Apple PackBits (TIFF Compression=32773): n in 0..127 → copy n+1
    literals; n in 129..255 (two's-complement -127..-1) → repeat next
    byte 257-n times; 128 → no-op. Output is bounded by ``expected``."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            if i + n + 1 > len(data):
                raise ValueError("tiff: packbits literal overruns strip")
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= len(data):
                raise ValueError("tiff: packbits run overruns strip")
            out += data[i : i + 1] * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ValueError("tiff: packbits strip short")
    return bytes(out[:expected])


def decode_tiff_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline TIFF to ``(width, height, channels, pixels)``
    with pixels row-major uint8 (chunky). Grayscale PhotometricInterp 0
    (WhiteIsZero) is inverted to the conventional black-is-zero scale so
    downstream statistics mean the same thing across payloads.
    Raises ValueError outside the documented baseline subset."""
    b = bytes(payload)
    if len(b) < 8:
        raise ValueError("tiff: short payload")
    if b[:4] == b"II*\x00":
        bo = "little"
    elif b[:4] == b"MM\x00*":
        bo = "big"
    else:
        raise ValueError("tiff: bad magic")
    ifd = _read_ifd(b, int.from_bytes(b[4:8], bo), bo)

    def one(tag: int, default: int | None = None) -> int:
        v = ifd.get(tag)
        if not v:
            if default is None:
                raise ValueError(f"tiff: missing tag {tag}")
            return default
        return v[0]

    width, height = one(256), one(257)
    spp = one(277, 1)
    if width <= 0 or height <= 0 or spp not in (1, 3):
        raise ValueError("tiff: unsupported geometry")
    if width * height > _MAX_PIXELS:
        raise ValueError("tiff: raster exceeds decode cap")
    bps = ifd.get(258, [8])
    if any(v != 8 for v in bps) or len(bps) not in (1, spp):
        raise ValueError("tiff: only 8-bit samples supported")
    if one(284, 1) != 1:
        raise ValueError("tiff: planar-separate not supported")
    comp = one(259, 1)
    if comp not in (1, 32773):
        raise ValueError(f"tiff: unsupported compression {comp}")
    photo = one(262, 1 if spp == 1 else 2)
    if (spp == 1 and photo not in (0, 1)) or (spp == 3 and photo != 2):
        raise ValueError("tiff: unsupported photometric interpretation")

    offsets = ifd.get(273)
    counts = ifd.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("tiff: missing/mismatched strip tables")
    rps = one(278, height)
    if rps <= 0:
        raise ValueError("tiff: bad RowsPerStrip")
    row_bytes = width * spp
    out = bytearray()
    rows_done = 0
    for off, cnt in zip(offsets, counts):
        if rows_done >= height:
            break
        if off < 0 or cnt < 0 or off + cnt > len(b):
            raise ValueError("tiff: strip outside payload")
        rows = min(rps, height - rows_done)
        expected = rows * row_bytes
        strip = b[off : off + cnt]
        if comp == 32773:
            out += _unpackbits(strip, expected)
        else:
            if cnt < expected:
                raise ValueError("tiff: strip short")
            out += strip[:expected]
        rows_done += rows
    if rows_done < height:
        raise ValueError("tiff: strips cover fewer rows than ImageLength")
    px = bytes(out)
    if photo == 0:  # WhiteIsZero → invert to black-is-zero
        px = bytes(255 - v for v in px)
    return width, height, spp, px


def encode_tiff(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 1,
    *,
    big_endian: bool = False,
    packbits: bool = False,
    rows_per_strip: int | None = None,
    photometric: int | None = None,
) -> bytes:
    """Emit a spec-valid baseline TIFF (fixture builder — the encode half
    of the round-trip tests and the ``documents_as_tiff`` adapter).
    Strip-organized chunky layout; header, IFD, then strip data."""
    if channels not in (1, 3):
        raise ValueError("encode_tiff: channels must be 1 or 3")
    if len(pixels) != width * height * channels:
        raise ValueError("encode_tiff: pixel buffer size mismatch")
    bo = "big" if big_endian else "little"
    rps = rows_per_strip or height
    photo = photometric if photometric is not None else (1 if channels == 1 else 2)

    def pack_strip(rows: bytes) -> bytes:
        if not packbits:
            return rows
        # simple run-length packer: maximal runs ≥2 as replicate packets,
        # the rest as literal packets (both packet kinds exercised)
        out = bytearray()
        i = 0
        n = len(rows)
        while i < n:
            j = i + 1
            while j < n and j - i < 128 and rows[j] == rows[i]:
                j += 1
            if j - i >= 2:
                out += bytes([257 - (j - i), rows[i]])
                i = j
            else:
                k = i + 1
                while (
                    k < n
                    and k - i < 128
                    and not (k + 1 < n and rows[k] == rows[k + 1])
                ):
                    k += 1
                out += bytes([k - i - 1]) + rows[i:k]
                i = k
        return bytes(out)

    row_bytes = width * channels
    strips = []
    y = 0
    while y < height:
        rows = min(rps, height - y)
        strips.append(pack_strip(pixels[y * row_bytes : (y + rows) * row_bytes]))
        y += rows

    entries = []  # (tag, type, count, values)
    bps = [8] * channels
    entries.append((256, 4, 1, [width]))
    entries.append((257, 4, 1, [height]))
    entries.append((258, 3, len(bps), bps))
    entries.append((259, 3, 1, [32773 if packbits else 1]))
    entries.append((262, 3, 1, [photo]))
    entries.append((273, 4, len(strips), None))  # offsets patched below
    entries.append((277, 3, 1, [channels]))
    entries.append((278, 4, 1, [rps]))
    entries.append((279, 4, len(strips), [len(s) for s in strips]))
    entries.sort(key=lambda e: e[0])

    header = (b"II*\x00" if bo == "little" else b"MM\x00*") + (8).to_bytes(4, bo)
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    # out-of-line value area directly after the IFD
    tail = bytearray()
    tail_base = ifd_off + ifd_size
    encoded = []
    for tag, typ, cnt, vals in entries:
        sz = _TYPE_SIZES[typ]
        if vals is None:  # strip offsets: reserve now, fill after layout
            encoded.append([tag, typ, cnt, None])
            tail_len = sz * cnt if sz * cnt > 4 else 0
            encoded[-1].append(tail_base + len(tail) if tail_len else None)
            tail += b"\x00" * tail_len
            continue
        raw = b"".join(v.to_bytes(sz, bo) for v in vals)
        if len(raw) <= 4:
            encoded.append([tag, typ, cnt, raw.ljust(4, b"\x00"), None])
        else:
            encoded.append([tag, typ, cnt, None, tail_base + len(tail)])
            tail += raw
    data_base = tail_base + len(tail)
    # strip offsets now known
    offs = []
    pos = data_base
    for s in strips:
        offs.append(pos)
        pos += len(s)
    for rec in encoded:
        if len(rec) == 5 and rec[3] is None and rec[0] == 273:
            sz = _TYPE_SIZES[rec[1]]
            raw = b"".join(v.to_bytes(sz, bo) for v in offs)
            if len(raw) <= 4:
                rec[3] = raw.ljust(4, b"\x00")
                rec[4] = None
            else:
                tail[rec[4] - tail_base : rec[4] - tail_base + len(raw)] = raw
    ifd = bytearray(len(entries).to_bytes(2, bo))
    for tag, typ, cnt, inline, toff in encoded:
        ifd += tag.to_bytes(2, bo) + typ.to_bytes(2, bo) + cnt.to_bytes(4, bo)
        ifd += inline if inline is not None else toff.to_bytes(4, bo)
    ifd += (0).to_bytes(4, bo)  # next-IFD pointer: none
    return header + bytes(ifd) + bytes(tail) + b"".join(strips)
