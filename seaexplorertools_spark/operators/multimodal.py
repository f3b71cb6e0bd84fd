"""Multimodal-column plumbing (engine additions).

Images/audio/video are opaque ``binary`` payloads with typed metadata
columns. The Spark-side plumbing — schema, partition-preserving
``mapInPandas`` with Arrow batches, deterministic batch shapes — is real
and tested. Decode depth is layered:

- **Header parse (real, pure-python)**: PNG/GIF/BMP/JPEG container headers
  are parsed for width/height (``parse_image_header``) — genuine features
  from genuine files, no decode library needed. ``encode_png`` writes a
  spec-valid PNG (stdlib zlib) for tests.
- **Real pixel/sample decode (pure python/numpy)**: PNG
  (``decode_png_pixels`` — filters 0-4, palette/tRNS, sub-byte and
  16-bit depths, Adam7), baseline-sequential AND progressive JPEG
  (``jpegcodec.decode_jpeg_pixels`` — huffman + IDCT + 4:2:0 + SOF2
  successive approximation, the formats that dominate image corpora),
  GIF frames (``decode_gif_pixels`` — real LZW, interlacing, local/global
  palettes), uncompressed BMP, PCM16/PCM24/float32 WAV samples
  (``decode_wav_samples``), FLAC/MP3 metadata, GIF/MP4/AVI frame spans
  (``parse_gif_frames``, ``videocontainers``).
- **Gated beyond that**: ``decode_real`` raises NotImplementedError for
  lossless/arithmetic JPEG / compressed audio samples / video frame
  pixels — PIL/soundfile/ffmpeg are not in this container. ``decode_stub`` computes
  deterministic byte stats so the pipeline shape is exercised end-to-end
  regardless, and every real lane degrades PER ROW on dirty payloads.

At 100 TB: payloads stay in the executor (never collected); mapInPandas
streams Arrow record batches so peak memory is one batch of payloads;
feature extraction is embarrassingly parallel with zero shuffle.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("sample_rate", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("byte_mean", DoubleType(), True),
        StructField("byte_entropy_proxy", DoubleType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
    ]
)


def parse_image_header(payload: bytes | None) -> tuple[int | None, int | None]:
    """(width, height) from PNG / GIF / BMP / WebP / JPEG container
    headers — pure-python byte parsing of the public formats,
    (None, None) when the payload is not a recognized image."""
    if payload is None or len(payload) < 10:
        return None, None
    b = bytes(payload)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
        return int.from_bytes(b[16:20], "big"), int.from_bytes(b[20:24], "big")
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return int.from_bytes(b[6:8], "little"), int.from_bytes(b[8:10], "little")
    if b[:2] == b"BM" and len(b) >= 26:
        w = int.from_bytes(b[18:22], "little", signed=True)
        h = int.from_bytes(b[22:26], "little", signed=True)
        return w, abs(h)  # negative BMP height = top-down rows
    if b[:4] == b"RIFF" and len(b) >= 25 and b[8:12] == b"WEBP":
        # WebP: VP8X extended header, VP8 lossy frame tag, or VP8L
        # lossless signature — dims only, the payload itself needs libwebp
        tag = b[12:16]
        if tag == b"VP8X" and len(b) >= 30:
            w = int.from_bytes(b[24:27], "little") + 1
            h = int.from_bytes(b[27:30], "little") + 1
            return w, h
        if tag == b"VP8 " and len(b) >= 30 and b[23:26] == b"\x9d\x01\x2a":
            return (
                int.from_bytes(b[26:28], "little") & 0x3FFF,
                int.from_bytes(b[28:30], "little") & 0x3FFF,
            )
        if tag == b"VP8L" and len(b) >= 25 and b[20] == 0x2F:
            bits = int.from_bytes(b[21:25], "little")
            return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
        return None, None
    if b[:2] == b"\xff\xd8":  # JPEG: walk segments to the SOF frame header
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
                i += 2
                continue
            seglen = int.from_bytes(b[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return (
                    int.from_bytes(b[i + 7 : i + 9], "big"),
                    int.from_bytes(b[i + 5 : i + 7], "big"),
                )
            i += 2 + seglen
    return None, None


def encode_png(width: int, height: int, rgb: bytes | None = None) -> bytes:
    """Spec-valid minimal PNG (8-bit RGB, stdlib zlib) — real files for
    testing the real header parse; also usable as a tiny image sink."""

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    row = width * 3
    raw = b"".join(
        b"\x00" + (rgb[y * row : (y + 1) * row] if rgb else b"\x00" * row)
        for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 1))  # pixel output is level-invariant
        + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, n_rows: int, stride: int, bpp: int) -> bytes:
    """Undo PNG scanline filters 0-4 (incl. Paeth) over ``n_rows`` rows of
    ``stride`` bytes each, ``bpp`` = filter-unit bytes per pixel (1 for
    sub-byte depths, per spec)."""
    out = bytearray()
    prev = bytearray(stride)
    i = 0
    for _y in range(n_rows):
        f = raw[i]
        i += 1
        line = bytearray(raw[i : i + stride])
        i += stride
        if f == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pr) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown PNG filter {f}")
        out += line
        prev = line
    return bytes(out)


# Adam7 interlace passes: (x_start, y_start, x_step, y_step)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def decode_png_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """Full pure-python PNG pixel decode (stdlib zlib + numpy): gray /
    gray+alpha / RGB / RGBA at depth 8 and 16 (16-bit downscaled to the
    high byte), palette (PLTE, depths 1/2/4/8, tRNS → RGBA), sub-byte
    grayscale (1/2/4-bit, scaled to full 8-bit range), and Adam7
    interlacing for all of them. Returns ``(width, height, channels,
    raster)`` with the raster row-major 8-bit, unfiltered per the PNG
    spec (filters 0-4 incl. Paeth). Raises ValueError for anything else
    — the loud boundary where a real deployment brings PIL."""
    import numpy as np

    if payload is None or payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos = 8
    idat = bytearray()
    plte = trns = None
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(payload):
        ln = struct.unpack(">I", payload[pos : pos + 4])[0]
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif typ == b"PLTE":
            plte = bytes(data)
        elif typ == b"tRNS":
            trns = bytes(data)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG without IHDR")
    valid = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8), 4: (8, 16), 6: (8, 16)}
    if ctype not in valid or depth not in valid[ctype]:
        raise ValueError(f"unsupported PNG layout (ctype={ctype}, depth={depth})")
    if interlace not in (0, 1):
        raise ValueError(f"unsupported PNG interlace {interlace}")
    if ctype == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("palette PNG without a valid PLTE chunk")
    nch_raw = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    out_ch = {0: 1, 2: 3, 3: (4 if trns else 3), 4: 2, 6: 4}[ctype]
    if w == 0 or h == 0 or w * h * out_ch > (1 << 27):
        # per-row degrade contract: a corrupt IHDR claiming a huge raster
        # (or a decompression bomb behind it) must be a ValueError, never
        # a MemoryError that kills the job
        raise ValueError(f"PNG raster too large or empty ({w}x{h}x{out_ch})")

    bits_pp = depth * nch_raw
    bpp_bytes = max(1, bits_pp // 8)

    def row_bytes(pw: int) -> int:
        return (pw * bits_pp + 7) // 8

    passes = [(0, 0, 1, 1)] if interlace == 0 else _ADAM7
    dims = []
    expected = 0
    for xs, ys, xst, yst in passes:
        pw = len(range(xs, w, xst))
        ph = len(range(ys, h, yst))
        dims.append((pw, ph))
        if pw and ph:
            expected += ph * (1 + row_bytes(pw))
    d = zlib.decompressobj()
    raw = d.decompress(bytes(idat), expected + 1)  # bounded inflate
    if len(raw) != expected or d.decompress(b"", 1):
        raise ValueError("PNG raster size mismatch")

    image = np.zeros((h, w, nch_raw), dtype=np.uint8)
    offset = 0
    for (xs, ys, xst, yst), (pw, ph) in zip(passes, dims):
        if not pw or not ph:
            continue
        rb = row_bytes(pw)
        lines = _png_unfilter(raw[offset : offset + ph * (1 + rb)], ph, rb, bpp_bytes)
        offset += ph * (1 + rb)
        arr = np.frombuffer(lines, np.uint8).reshape(ph, rb)
        if depth == 8:
            samples = arr[:, : pw * nch_raw].reshape(ph, pw, nch_raw)
        elif depth == 16:
            samples = arr[:, : pw * nch_raw * 2].reshape(ph, pw, nch_raw, 2)[..., 0]
        else:  # sub-byte: single-channel (gray or palette index), MSB-first
            bits = np.unpackbits(arr, axis=1)
            vals = (
                bits.reshape(ph, -1, depth)
                * (1 << np.arange(depth - 1, -1, -1))
            ).sum(axis=2)[:, :pw]
            samples = vals[:, :, None].astype(np.uint8)
        image[ys::yst, xs::xst, :] = samples

    if ctype == 3:
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        idx = image[:, :, 0]
        if int(idx.max()) >= len(pal):
            raise ValueError("PNG palette index out of range")
        rgb = pal[idx]
        if trns is not None:
            alpha = np.full(len(pal), 255, np.uint8)
            alpha[: min(len(trns), len(pal))] = np.frombuffer(
                trns[: len(pal)], np.uint8
            )
            out = np.concatenate([rgb, alpha[idx][:, :, None]], axis=2)
        else:
            out = rgb
    elif ctype == 0 and depth < 8:
        out = image * np.uint8({1: 255, 2: 85, 4: 17}[depth])
    else:
        out = image
    return w, h, out_ch, out.tobytes()


# one hardened per-row degrade tuple for EVERY image-decode lane —
# MemoryError/OverflowError included so a crafted payload that slips past
# the size guards still fails its row, not the job
_IMAGE_DECODE_ERRORS = (ValueError, zlib.error, struct.error, IndexError, MemoryError, OverflowError)

_PIL_IMAGE: object = "unset"  # lazy import cache: PIL.Image module or None


def _pil_image():
    """``PIL.Image`` if importable, else None (probed once per process)."""
    global _PIL_IMAGE
    if _PIL_IMAGE == "unset":
        try:
            from PIL import Image  # optional dep — absent in this container

            _PIL_IMAGE = Image
        except Exception:
            _PIL_IMAGE = None
    return _PIL_IMAGE


def _native_codecs_enabled() -> bool:
    """Dispatch policy for the image-decode hot path. The pure-python
    codec chain is exact but ~100× slower per byte than libjpeg; on a
    real image-heavy corpus the decode lane dominates executor CPU, so
    when PIL is importable we use it by default and keep the pure-python
    chain as fallback + oracle authority.

    ``SPARK_GRAFT_NATIVE_CODECS``: ``auto`` (default — PIL when
    importable), ``0``/``off`` (always pure-python), ``1``/``on`` (PIL
    when importable; still degrades per-payload to pure-python)."""
    import os

    mode = os.environ.get("SPARK_GRAFT_NATIVE_CODECS", "auto").lower()
    if mode in ("0", "off", "false", "never"):
        return False
    return _pil_image() is not None


def _decode_image_pixels_native(payload: bytes) -> tuple[int, int, int, bytes] | None:
    """PIL-backed decode normalized to the pure-python chain's channel
    conventions: (width, height, channels∈{1,2,3,4}, row-major 8-bit
    raster). Palette → RGB (RGBA with transparency), 1-bit → L, 16-bit
    gray → high byte (matching decode_png_pixels), CMYK → RGB, GIF →
    frame 0. None when PIL rejects the payload (the caller then tries
    the pure-python chain). Identity with the pure-python codecs is
    pinned in tests/test_multimodal.py::test_pil_identity_* — exact for
    the lossless formats, ±1/px for JPEG (T.81 only bounds IDCT
    accuracy; libjpeg's integer IDCT may differ from our exact float
    IDCT by one level)."""
    import io

    Image = _pil_image()
    if Image is None:
        return None
    try:
        im = Image.open(io.BytesIO(bytes(payload)))
        if getattr(im, "is_animated", False):
            im.seek(0)
        im.load()
        mode = im.mode
        if mode == "P":
            im = im.convert("RGBA" if "transparency" in im.info else "RGB")
        elif mode == "1":
            im = im.convert("L")
        elif mode in ("I", "I;16", "I;16B", "I;16L", "F"):
            import numpy as np

            arr = np.asarray(im)
            if arr.dtype.itemsize > 1:  # 16/32-bit gray → high byte
                arr = (arr.astype(np.uint32) >> (8 * (arr.dtype.itemsize - 1))).astype(np.uint8)
            return im.width, im.height, 1, arr.astype(np.uint8).tobytes()
        elif mode == "CMYK":
            im = im.convert("RGB")
        ch = {"L": 1, "LA": 2, "RGB": 3, "RGBA": 4}.get(im.mode)
        if ch is None:
            return None
        return im.width, im.height, ch, im.tobytes()
    except Exception:
        return None  # per-payload degrade — pure-python chain decides


def _decode_image_pixels(
    payload: bytes, native: bool | None = None
) -> tuple[int, int, int, bytes] | None:
    """Try PNG, JPEG (baseline + progressive), GIF (frame 0), BMP, then
    baseline TIFF; None when no codec accepts the payload. The SINGLE
    place the codec chain and its exception tuple live — decode_real /
    resize_images / image_signal_features / ahash_images all degrade
    through here.

    ``native`` — True: try PIL first (the fast path; ~10-100× on JPEG),
    falling back per-payload to the pure-python chain; False: pure
    python only (the oracle authority — contract queries pin this);
    None: the ``SPARK_GRAFT_NATIVE_CODECS`` policy (auto-dispatch when
    PIL is importable)."""
    from .icocodec import decode_ico_pixels
    from .jpegcodec import decode_jpeg_pixels
    from .tiffcodec import decode_tiff_pixels

    if native is None:
        native = _native_codecs_enabled()
    if native:
        out = _decode_image_pixels_native(payload)
        if out is not None:
            return out
    for codec in (
        decode_png_pixels,
        decode_jpeg_pixels,
        decode_gif_pixels,
        decode_bmp_pixels,
        decode_tiff_pixels,
        decode_ico_pixels,
    ):
        try:
            return codec(payload)
        except _IMAGE_DECODE_ERRORS:
            continue
    return None


def _nearest_rgb_rows(px: bytes, w0: int, h0: int, ch: int, width: int, height: int) -> bytes:
    """Nearest-neighbor resample of a row-major raster to RGB bytes
    (gray triplicates, alpha drops)."""
    rows = bytearray()
    for y in range(height):
        sy = y * h0 // height
        base = sy * w0
        for x in range(width):
            o = (base + x * w0 // width) * ch
            if ch >= 3:
                rows += px[o : o + 3]
            else:  # gray / gray+alpha → replicate luminance
                rows += px[o : o + 1] * 3
    return bytes(rows)


def resize_png_payload(payload: bytes, width: int, height: int) -> bytes:
    """Real-pixel PNG resize: decode (decode_png_pixels), nearest-neighbor
    resample, re-encode 8-bit RGB (gray triplicates, alpha drops)."""
    w0, h0, ch, px = decode_png_pixels(payload)
    return encode_png(width, height, _nearest_rgb_rows(px, w0, h0, ch, width, height))


def resize_jpeg_payload(payload: bytes, width: int, height: int) -> bytes:
    """Real-pixel JPEG resize: baseline decode (jpegcodec), nearest-
    neighbor resample, re-encode as 8-bit RGB PNG (lossless output
    container — re-JPEG-ing a training thumbnail just adds generation
    loss)."""
    from .jpegcodec import decode_jpeg_pixels

    w0, h0, ch, px = decode_jpeg_pixels(payload)
    return encode_png(width, height, _nearest_rgb_rows(px, w0, h0, ch, width, height))


def decode_real(payload: bytes, kind: str) -> dict:
    """Real decode, as deep as pure python goes: full PIXELS for PNG
    (incl. palette, sub-byte/16-bit depths, Adam7) and JPEG (baseline
    sequential AND progressive); image container headers →
    {width, height} for the rest. Lossless/arithmetic JPEG, compressed
    audio samples, and video frame pixels need PIL / soundfile / ffmpeg
    (absent in this container) and raise."""
    if kind == "image":
        decoded = _decode_image_pixels(payload)
        if decoded is not None:
            w, h, ch, px = decoded
            return {"width": w, "height": h, "channels": ch, "pixels": px}
        w, h = parse_image_header(payload)
        if w is not None:
            return {"width": w, "height": h}
    raise NotImplementedError(
        "full pixel/audio/video decode beyond 8-bit PNG + baseline JPEG "
        "requires PIL/soundfile/ffmpeg (absent in this container); header "
        "parse covers PNG/GIF/BMP/JPEG dimensions"
    )


def decode_stub(payload: bytes) -> tuple[int, float, float]:
    """Deterministic fake features from raw bytes (no decode libs needed)."""
    if payload is None or len(payload) == 0:
        return 0, float("nan"), float("nan")
    n = len(payload)
    mean = sum(payload) / n
    distinct = len(set(payload))
    return n, mean, distinct / 256.0


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — Arrow-batched,
    partition-preserving, no shuffle. Byte stats (always) + REAL image
    dimensions from PNG/GIF/BMP/JPEG header parse (NULL for unrecognized
    payloads).

    All helpers are NESTED defs so cloudpickle ships them by value — Spark
    python workers don't inherit the driver's sys.path, and a by-reference
    pickle of this module's functions would fail to import on workers when
    the engine runs from a non-PYTHONPATH checkout."""

    def parse_dims(payload):
        # worker-side copy of parse_image_header (PNG/GIF/BMP/JPEG)
        if payload is None or len(payload) < 10:
            return None, None
        b = bytes(payload)
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
            return int.from_bytes(b[16:20], "big"), int.from_bytes(b[20:24], "big")
        if b[:6] in (b"GIF87a", b"GIF89a"):
            return int.from_bytes(b[6:8], "little"), int.from_bytes(b[8:10], "little")
        if b[:2] == b"BM" and len(b) >= 26:
            w = int.from_bytes(b[18:22], "little", signed=True)
            h = int.from_bytes(b[22:26], "little", signed=True)
            return w, abs(h)
        if b[:2] == b"\xff\xd8":
            i = 2
            while i + 9 < len(b):
                if b[i] != 0xFF:
                    break
                marker = b[i + 1]
                if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
                    i += 2
                    continue
                seglen = int.from_bytes(b[i + 2 : i + 4], "big")
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    return (
                        int.from_bytes(b[i + 7 : i + 9], "big"),
                        int.from_bytes(b[i + 5 : i + 7], "big"),
                    )
                i += 2 + seglen
        return None, None

    def decode(payload):
        if payload is None or len(payload) == 0:
            return 0, float("nan"), float("nan"), None, None
        n = len(payload)
        w, h = parse_dims(payload)
        return n, sum(payload) / n, len(set(payload)) / 256.0, w, h

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                n, mean, ent, w, h = decode(payload)
                rows.append((mid, kind, n, mean, ent, w, h))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "n_bytes", "byte_mean",
                    "byte_entropy_proxy", "width", "height",
                ],
            )

    return media.mapInPandas(extract, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame_payload", BinaryType(), True),
    ]
)


def resize_images(
    media: DataFrame,
    width: int = 64,
    height: int = 64,
    per_row_dims: bool = False,
    mode: str = "stub",
    native: bool | None = None,
) -> DataFrame:
    """Image resize over binary payloads (mapInPandas, Arrow-batched,
    partition-preserving — no shuffle).

    ``mode="decode"`` does the REAL thing for 8-bit non-interlaced PNGs
    AND baseline sequential JPEGs: pure-python pixel decode
    (decode_png_pixels / jpegcodec.decode_jpeg_pixels), nearest-neighbor
    resample, RGB re-encode — payloads both decoders reject fall back to
    the stub so a mixed corpus never fails mid-job. ``mode="stub"``
    (default, and the oracle-checked contract semantics) deterministically
    truncates/pads the payload to width*height bytes so batch shapes,
    schema and partition-preservation are exercised without decode libs.
    With ``per_row_dims=True`` the target is each row's OWN
    (width, height) metadata — input-dependent outputs, which is what
    lets the contract check the whole path against integer arithmetic.

    Deployment note: ``mode="decode"`` references the module-level PNG
    codec, so workers must be able to import this package (true in local
    mode and under ``--py-files``/pip deployments) — unlike the stub
    path, whose helpers are nested for by-value pickling."""
    if mode not in ("stub", "decode"):
        raise ValueError(f"mode must be 'stub' or 'decode', got {mode!r}")
    real = mode == "decode"

    def do_resize(batches):
        for pdf in batches:
            out = []
            for mid, kind, payload, w0, h0 in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"],
                pdf["width"], pdf["height"],
            ):
                if payload is None:
                    out.append((mid, kind, None, None, None))
                    continue
                w = int(w0) if per_row_dims and pd.notna(w0) else width
                h = int(h0) if per_row_dims and pd.notna(h0) else height
                b = bytes(payload)
                if real:
                    decoded = _decode_image_pixels(b, native=native)
                    if decoded is not None:
                        w0, h0, ch, px = decoded
                        resized = encode_png(w, h, _nearest_rgb_rows(px, w0, h0, ch, w, h))
                        out.append((mid, kind, resized, w, h))
                        continue
                    # neither codec accepts it → stub below (a mixed/dirty
                    # corpus must never fail the job mid-scan)
                target = w * h
                resized = (b * (target // max(len(b), 1) + 1))[:target]
                out.append((mid, kind, resized, w, h))
            yield pd.DataFrame(out, columns=["media_id", "kind", "payload", "width", "height"])

    return media.select("media_id", "kind", "payload", "width", "height").mapInPandas(
        do_resize, RESIZED_SCHEMA
    )


def decode_bmp_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """Uncompressed 24/32-bit BI_RGB BMP → ``(width, height, channels,
    raster)``, row-major top-down RGB (BMP stores BGR bottom-up with
    4-byte row padding; negative height = already top-down). Raises
    ValueError for palettized/compressed/16-bit BMPs — rare in corpora;
    bring PIL."""
    import numpy as np

    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    b = bytes(payload)
    data_off = int.from_bytes(b[10:14], "little")
    hdr_size = int.from_bytes(b[14:18], "little")
    if hdr_size < 40:
        raise ValueError("BMP core header unsupported")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bits = int.from_bytes(b[28:30], "little")
    compression = int.from_bytes(b[30:34], "little")
    if compression != 0 or bits not in (24, 32):
        raise ValueError(
            f"unsupported BMP (bits={bits}, compression={compression}) — "
            "uncompressed 24/32-bit BI_RGB only"
        )
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0 or w * h * 3 > (1 << 27):
        raise ValueError(f"BMP raster too large or empty ({w}x{h})")
    bypp = bits // 8
    stride = (w * bypp + 3) & ~3  # rows padded to 4 bytes
    need = data_off + stride * h
    if need > len(b):
        raise ValueError("BMP pixel data truncated")
    arr = np.frombuffer(b, np.uint8, count=stride * h, offset=data_off)
    rows = arr.reshape(h, stride)[:, : w * bypp].reshape(h, w, bypp)
    if not top_down:
        rows = rows[::-1]
    rgb = rows[:, :, 2::-1]  # BGR(A) -> RGB, alpha dropped
    return w, h, 3, np.ascontiguousarray(rgb).tobytes()


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal spec-valid 24-bit BI_RGB BMP (bottom-up, padded rows) —
    fixture generator, mirroring encode_png's role."""
    stride = (width * 3 + 3) & ~3
    rows = bytearray()
    for y in range(height - 1, -1, -1):
        line = bytearray()
        for x in range(width):
            o = (y * width + x) * 3
            line += bytes([rgb[o + 2], rgb[o + 1], rgb[o]])  # RGB -> BGR
        line += b"\x00" * (stride - len(line))
        rows += line
    data_off = 54
    size = data_off + len(rows)
    hdr = b"BM" + size.to_bytes(4, "little") + b"\x00" * 4 + data_off.to_bytes(4, "little")
    info = (40).to_bytes(4, "little")
    info += width.to_bytes(4, "little", signed=True)
    info += height.to_bytes(4, "little", signed=True)
    info += (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
    info += (0).to_bytes(4, "little")  # BI_RGB
    info += len(rows).to_bytes(4, "little") + b"\x00" * 16
    return hdr + info + bytes(rows)


def parse_gif_frames(payload: bytes) -> list[dict]:
    """Real GIF block-structure walk (pure python, GIF87a/89a): locate
    every frame's image descriptor and encoded data sub-blocks without
    LZW-decoding pixels. Returns one dict per frame: ``start``/``end``
    byte offsets of the frame's descriptor+data span, the frame's
    ``width``/``height``/``left``/``top``, and the preceding Graphic
    Control Extension's ``delay_ms`` (0 when absent). Raises ValueError
    for non-GIF payloads or a truncated block stream."""
    if payload is None:
        raise ValueError("not a GIF payload")
    b = bytes(payload)
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    i = 13
    gct_flag = b[10] & 0x80
    if gct_flag:
        i += 3 * (2 << (b[10] & 0x07))  # global color table
    frames: list[dict] = []
    delay_ms = 0

    def skip_subblocks(j: int) -> int:
        while j < len(b) and b[j]:
            j += 1 + b[j]
        return j + 1  # past the 0x00 terminator

    while i < len(b):
        marker = b[i]
        if marker == 0x3B:  # trailer
            return frames
        if marker == 0x21:  # extension
            if i + 2 > len(b):
                break
            label = b[i + 1]
            if label == 0xF9 and i + 8 <= len(b):  # graphic control
                delay_ms = int.from_bytes(b[i + 4 : i + 6], "little") * 10
            i = skip_subblocks(i + 2)
        elif marker == 0x2C:  # image descriptor
            if i + 10 > len(b):
                break
            start = i
            left = int.from_bytes(b[i + 1 : i + 3], "little")
            top = int.from_bytes(b[i + 3 : i + 5], "little")
            w = int.from_bytes(b[i + 5 : i + 7], "little")
            h = int.from_bytes(b[i + 7 : i + 9], "little")
            j = i + 10
            if b[i + 9] & 0x80:  # local color table
                j += 3 * (2 << (b[i + 9] & 0x07))
            j += 1  # LZW minimum code size byte
            j = skip_subblocks(j)
            frames.append(
                {"start": start, "end": j, "width": w, "height": h,
                 "left": left, "top": top, "delay_ms": delay_ms}
            )
            delay_ms = 0
            i = j
        else:
            raise ValueError(f"corrupt GIF block marker 0x{marker:02x} at {i}")
    raise ValueError("truncated GIF block stream (no trailer)")


def _gif_lzw_decode(mcs: int, data: bytes, expected: int) -> bytes:
    """GIF-variant LZW decode (LSB-first variable-width codes, CLEAR/END,
    max 12-bit): returns exactly ``expected`` palette indices. Output is
    CAPPED at ``expected`` so a crafted stream can never balloon."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    acc = nbits = i = 0

    def read_code(sz: int) -> int:
        nonlocal acc, nbits, i
        while nbits < sz:
            if i >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[i] << nbits
            i += 1
            nbits += 8
        code = acc & ((1 << sz) - 1)
        acc >>= sz
        nbits -= sz
        return code

    table: list[bytes] = []
    code_size = mcs + 1
    prev: bytes | None = None
    out = bytearray()

    def reset():
        nonlocal table, code_size, prev
        table = [bytes([k]) for k in range(clear)] + [b"", b""]
        code_size = mcs + 1
        prev = None

    reset()
    while len(out) < expected:
        code = read_code(code_size)
        if code == clear:
            reset()
            continue
        if code == end:
            break
        if code < len(table) and code not in (clear, end):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW code")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    if len(out) < expected:
        raise ValueError("GIF LZW output short of raster size")
    return bytes(out[:expected])


def _gif_lzw_encode(mcs: int, indices: bytes) -> bytes:
    """Mini GIF LZW encoder (fixture generator): real dictionary growth,
    code-width bumps mirroring the decoder's schedule, CLEAR on a full
    table."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, sz: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += sz
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return {(k,): k for k in range(clear)}, end + 1, mcs + 1

    table, nxt, code_size = fresh()
    emit(clear, code_size)
    buf: tuple = ()
    for idx in indices:
        cand = buf + (idx,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf], code_size)
        table[cand] = nxt
        nxt += 1
        if nxt - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if nxt == 4096:
            emit(clear, code_size)
            table, nxt, code_size = fresh()
        buf = (idx,)
    if buf:
        emit(table[buf], code_size)
    emit(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif_pixels(payload: bytes, frame_index: int = 0) -> tuple[int, int, int, bytes]:
    """Real GIF pixel decode for ONE frame: locate the frame span
    (parse_gif_frames), LZW-decode its indices (incl. interlaced row
    reordering), map through the local-or-global color table → RGB.
    Returns ``(frame_width, frame_height, 3, raster)``. Frame COMPOSITION
    (disposal methods, transparency overlay onto the canvas) is out of
    scope — this is the still-image / per-frame-feature lane. Raises
    ValueError for non-GIF payloads, a missing color table, or a
    truncated/corrupt LZW stream."""
    import numpy as np

    frames = parse_gif_frames(payload)
    if not 0 <= frame_index < len(frames):
        raise ValueError(f"GIF has {len(frames)} frames, wanted {frame_index}")
    b = bytes(payload)
    gct = None
    if b[10] & 0x80:
        n = 2 << (b[10] & 0x07)
        gct = b[13 : 13 + 3 * n]
    fr = frames[frame_index]
    i = fr["start"]
    w, h = fr["width"], fr["height"]
    if w == 0 or h == 0 or w * h * 3 > (1 << 27):
        raise ValueError(f"GIF frame raster too large or empty ({w}x{h})")
    flags = b[i + 9]
    interlaced = bool(flags & 0x40)
    j = i + 10
    ct = gct
    if flags & 0x80:  # local color table
        n = 2 << (flags & 0x07)
        ct = b[j : j + 3 * n]
        j += 3 * n
    if ct is None:
        raise ValueError("GIF frame without a color table")
    mcs = b[j]
    if not 2 <= mcs <= 11:
        raise ValueError(f"corrupt GIF LZW minimum code size {mcs}")
    j += 1
    data = bytearray()
    while j < fr["end"] and b[j]:
        data += b[j + 1 : j + 1 + b[j]]
        j += 1 + b[j]
    idx = np.frombuffer(_gif_lzw_decode(mcs, bytes(data), w * h), np.uint8)
    rows = idx.reshape(h, w)
    if interlaced:
        deinter = np.empty_like(rows)
        src_row = 0
        for start, step in _GIF_INTERLACE_PASSES:
            n = len(range(start, h, step))
            deinter[start::step] = rows[src_row : src_row + n]
            src_row += n
        rows = deinter
    pal = np.frombuffer(ct, np.uint8).reshape(-1, 3)
    if int(rows.max()) >= len(pal):
        raise ValueError("GIF palette index out of range")
    return w, h, 3, np.ascontiguousarray(pal[rows]).tobytes()


def encode_gif(
    width: int,
    height: int,
    indices: bytes,
    palette: bytes,
    interlaced: bool = False,
) -> bytes:
    """Minimal spec-valid single-frame GIF89a (fixture generator): global
    color table, one image descriptor, REAL LZW-compressed data in
    255-byte sub-blocks; optional interlacing."""
    import numpy as np

    n_colors = len(palette) // 3
    bits = max(2, (n_colors - 1).bit_length())
    gct = palette + b"\x00" * (3 * ((1 << bits) - n_colors))
    out = bytearray(b"GIF89a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0x80 | (bits - 1), 0, 0]) + gct
    out += b"\x2c" + (0).to_bytes(2, "little") + (0).to_bytes(2, "little")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0x40 if interlaced else 0x00])
    idx = indices
    if interlaced:
        rows = np.frombuffer(indices, np.uint8).reshape(height, width)
        order = [
            y for start, step in _GIF_INTERLACE_PASSES for y in range(start, height, step)
        ]
        idx = np.ascontiguousarray(rows[order]).tobytes()
    mcs = max(2, bits)
    out += bytes([mcs])
    data = _gif_lzw_encode(mcs, idx)
    for k in range(0, len(data), 255):
        blockb = data[k : k + 255]
        out += bytes([len(blockb)]) + blockb
    out += b"\x00\x3b"
    return bytes(out)


def sample_frames(media: DataFrame, n_frames: int = 4, mode: str = "stub") -> DataFrame:
    """Video/animation frame sampling — one output row per (media, frame),
    the explode-shaped schema a training pipeline feeds to per-frame
    feature extraction.

    REAL container walks (each emitting the ACTUAL evenly-sampled frame
    byte spans, still codec-encoded — pixel decode is a separate concern):
    ``mode="gif"`` (block structure, ``parse_gif_frames``), ``mode="mp4"``
    (ISO BMFF sample tables, ``videocontainers.parse_mp4_frames``),
    ``mode="avi"`` (RIFF movi chunks, ``parse_avi_frames``), and
    ``mode="auto"`` which tries all three — the mixed-corpus setting.
    Payloads every walker rejects fall back to the stub slicing so a
    dirty corpus never fails. ``mode="stub"`` slices the payload into
    n_frames even chunks — the codec-free plumbing default. Deployment
    note for the real modes: module-level parsers, workers must import
    this package (same contract as resize_images(mode="decode"))."""
    modes = ("stub", "gif", "mp4", "avi", "auto")
    if mode not in modes:
        raise ValueError(f"mode must be one of {modes}, got {mode!r}")

    def do_sample(batches):
        from .videocontainers import parse_avi_frames, parse_mp4_frames

        walkers = {
            "gif": (parse_gif_frames,),
            "mp4": (parse_mp4_frames,),
            "avi": (parse_avi_frames,),
            "auto": (parse_gif_frames, parse_mp4_frames, parse_avi_frames),
        }.get(mode, ())
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    continue
                b = bytes(payload)
                frames = None
                for walk in walkers:
                    try:
                        frames = walk(b)
                        break
                    except (ValueError, IndexError):
                        continue  # wrong/corrupt container → next walker
                if frames:
                    k = min(n_frames, len(frames))
                    picks = [frames[(fi * len(frames)) // k] for fi in range(k)]
                    for fi, fr in enumerate(picks):
                        out.append((mid, fi, b[fr["start"] : fr["end"]]))
                    continue
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    out.append((mid, i, b[i * step : (i + 1) * step]))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame_payload"])

    return media.select("media_id", "payload").mapInPandas(do_sample, FRAME_SCHEMA)


VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("time_ms", LongType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("channels", LongType(), True),
        StructField("mean_px", DoubleType(), True),
        StructField("min_px", LongType(), True),
        StructField("max_px", LongType(), True),
    ]
)


def video_frame_features(
    media: DataFrame, n_frames: int = 4, native: bool | None = None
) -> DataFrame:
    """REAL per-frame pixel statistics from video containers: walk the
    container (GIF block structure / ISO-BMFF sample tables / RIFF movi
    chunks — the same auto chain as ``sample_frames``), evenly sample
    ``n_frames`` frame byte spans WITH their timestamps, and decode each
    sampled frame through the shared image codec chain — which makes
    MJPEG (JPEG-in-AVI/MP4, the dominant pre-H.264 capture format) and
    PNG/GIF/BMP-framed containers yield real pixels with no new codec.
    H.264/H.265 frame payloads are exactly what the chain rejects: those
    rows keep their container metadata (frame_idx, time_ms) with NULL
    pixel stats — per-frame degrade, never a failed job. Payloads no
    walker accepts emit no rows (a video lane on a non-video payload is
    vacuous; the caller anti-joins for coverage). Arrow-batched
    mapInPandas, zero shuffle — the video twin of image_signal_features.
    ``native`` forwards to ``_decode_image_pixels``."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .videocontainers import parse_avi_frames, parse_mp4_frames

        walkers = (parse_gif_frames, parse_mp4_frames, parse_avi_frames)
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    continue
                b = bytes(payload)
                frames = None
                for walk in walkers:
                    try:
                        frames = walk(b)
                        break
                    except (ValueError, IndexError):
                        continue
                if not frames:
                    continue
                k = min(n_frames, len(frames))
                for fi in range(k):
                    fr = frames[(fi * len(frames)) // k]
                    decoded = _decode_image_pixels(
                        b[fr["start"] : fr["end"]], native=native
                    )
                    if decoded is None:
                        rows.append(
                            (mid, fi, fr.get("time_ms"), None, None, None,
                             None, None, None)
                        )
                        continue
                    w, h, ch, px = decoded
                    arr = np.frombuffer(px, dtype=np.uint8)
                    rows.append(
                        (
                            mid, fi, fr.get("time_ms"), w, h, ch,
                            float(arr.mean()) if arr.size else None,
                            int(arr.min()) if arr.size else None,
                            int(arr.max()) if arr.size else None,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_idx", "time_ms", "width", "height",
                    "channels", "mean_px", "min_px", "max_px",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        extract, VIDEO_FRAME_SCHEMA
    )


def documents_as_mjpeg(docs: DataFrame) -> DataFrame:
    """Adapter: synthesize a REAL MJPEG AVI per document — ``2 + doc_id
    % 3`` two-tone grayscale JPEG frames (frame ``f`` halves ``(doc_id +
    31f) % 256`` / ``(37 + 11·doc_id + 17f) % 256``, dims block-aligned
    as in documents_as_jpeg), 40 ms per frame, assembled by encode_avi.
    Every frame decodes EXACTLY (flat 8×8 blocks, unit quant), so the
    sampled per-frame statistics are closed-form in (doc_id, frame_idx)
    — which is what lets ``mm_video_frames`` run the whole
    container-walk→JPEG-decode→stats path under an exact SQL oracle.
    Arrow-batched mapInPandas; partition-preserving, no shuffle."""
    import numpy as np

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .jpegcodec import encode_jpeg
        from .videocontainers import encode_avi

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w = 16 * (1 + did % 3)
                h = 8 * (1 + did % 4)
                k = 2 + did % 3
                frames = []
                for f in range(k):
                    a = (did + 31 * f) % 256
                    b = (37 + 11 * did + 17 * f) % 256
                    img = np.empty((h, w), dtype=np.uint8)
                    img[:, : w // 2] = a
                    img[:, w // 2 :] = b
                    frames.append(encode_jpeg(w, h, img.tobytes()))
                rows.append(
                    (did, "video",
                     encode_avi(frames, us_per_frame=40000, width=w, height=h))
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


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: wrap document text bytes in a PNG-shaped container (real
    signature + IHDR with doc-derived dimensions, text as body) so the
    multimodal plumbing — including the REAL header parse — can be
    exercised against the synthetic tables. Width/height are deterministic
    functions of doc_id, making the parsed dimensions oracle-checkable.
    The container is built with JVM expressions (concat of binary columns;
    unhex(lpad(hex(x))) is a 4-byte big-endian int), no UDF."""

    def be4(col):
        return F.unhex(F.lpad(F.hex(col), 8, "0"))

    width = F.lit(1) + F.col("doc_id") % 64
    height = F.lit(1) + F.col("doc_id") % 48
    payload = F.concat(
        F.lit(bytes.fromhex("89504E470D0A1A0A")),  # PNG signature
        F.lit(bytes.fromhex("0000000D")),  # IHDR length = 13
        F.lit(b"IHDR"),
        be4(width),
        be4(height),
        F.lit(bytes.fromhex("0802000000")),  # bit depth 8, RGB
        F.lit(bytes.fromhex("00000000")),  # CRC (not validated by header parse)
        F.encode(F.col("text"), "utf-8"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        payload.alias("payload"),
        width.cast("long").alias("width"),
        height.cast("long").alias("height"),
        F.lit(None).cast("long").alias("sample_rate"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("sample_rate", LongType(), True),
        StructField("channels", LongType(), True),
        StructField("bits", LongType(), True),
        StructField("n_frames", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)


def parse_wav_header(payload: bytes | None) -> dict | None:
    """Real RIFF/WAVE container parse (pure python): walks the chunk list
    for ``fmt `` and ``data`` and returns sample_rate / channels / bits /
    n_frames / duration_ms — the audio metadata layer that needs no codec
    library (sample DECODE stays gated on soundfile/ffmpeg). None when the
    payload is not a WAV."""
    if payload is None or len(payload) < 12:
        return None
    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i, fmt, data_size = 12, None, None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 8 + 16 <= len(b):
            fmt = {
                "channels": int.from_bytes(b[i + 10 : i + 12], "little"),
                "sample_rate": int.from_bytes(b[i + 12 : i + 16], "little"),
                "block_align": int.from_bytes(b[i + 20 : i + 22], "little"),
                "bits": int.from_bytes(b[i + 22 : i + 24], "little"),
            }
        elif cid == b"data":
            data_size = min(size, len(b) - i - 8)
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data_size is None or fmt["block_align"] == 0:
        return None
    n_frames = data_size // fmt["block_align"]
    return {
        "sample_rate": fmt["sample_rate"],
        "channels": fmt["channels"],
        "bits": fmt["bits"],
        "n_frames": n_frames,
        "duration_ms": (n_frames * 1000) // max(fmt["sample_rate"], 1),
    }


def decode_wav_samples(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """Real PCM sample decode, pure python/numpy, of the three formats
    that dominate real audio corpora: 16-bit integer PCM (tag 1, int16
    out), 24-bit integer PCM (tag 1, sign-extended int32 out, native
    24-bit units), and IEEE float32 (tag 3, float32 out, nominal
    [-1, 1]). Returns ``(sample_rate, channels, samples)`` with
    ``samples`` shaped [n_frames, channels]. Raises ValueError for
    non-WAV payloads, compressed codecs, or a fmt chunk whose
    block_align is 0 / inconsistent with channels·bits — the loud
    boundary where a real deployment brings soundfile/ffmpeg (and the
    guard that keeps one corrupt payload from dividing by zero)."""
    import numpy as np

    if payload is None:
        raise ValueError("not a WAV payload")
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    i, fmt, data = 12, None, None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 8 + 16 <= len(b):
            fmt = {
                "tag": int.from_bytes(b[i + 8 : i + 10], "little"),
                "channels": int.from_bytes(b[i + 10 : i + 12], "little"),
                "sample_rate": int.from_bytes(b[i + 12 : i + 16], "little"),
                "block_align": int.from_bytes(b[i + 20 : i + 22], "little"),
                "bits": int.from_bytes(b[i + 22 : i + 24], "little"),
            }
        elif cid == b"data":
            data = b[i + 8 : i + 8 + size]
        i += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("WAV without fmt/data chunks")
    tag, bits, ch = fmt["tag"], fmt["bits"], fmt["channels"]
    if (tag, bits) not in {(1, 16), (1, 24), (3, 32)} or ch < 1:
        raise ValueError(
            f"unsupported WAV encoding (tag={tag}, bits={bits})"
            " — PCM16/PCM24/float32 only; bring soundfile for the rest"
        )
    # parse_wav_header's guard, mirrored: a crafted fmt chunk with
    # block_align=0 (or mismatching channels·bytes-per-sample) must fail
    # as a per-row ValueError, never a ZeroDivisionError that kills the job
    if fmt["block_align"] != ch * (bits // 8):
        raise ValueError(
            f"corrupt WAV fmt: block_align={fmt['block_align']}"
            f" != channels({ch}) * {bits // 8}"
        )
    n_frames = len(data) // fmt["block_align"]
    data = data[: n_frames * fmt["block_align"]]
    if (tag, bits) == (1, 16):
        samples = np.frombuffer(data, dtype="<i2").reshape(n_frames, ch)
    elif (tag, bits) == (3, 32):
        samples = np.frombuffer(data, dtype="<f4").reshape(n_frames, ch)
    else:  # 24-bit PCM: 3-byte little-endian frames, sign-extended to int32
        raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        vals = (
            raw[:, 0].astype(np.int32)
            | (raw[:, 1].astype(np.int32) << 8)
            | (raw[:, 2].astype(np.int32) << 16)
        )
        vals = (vals << 8) >> 8  # sign-extend bit 23 through the int32
        samples = vals.reshape(n_frames, ch)
    return fmt["sample_rate"], ch, samples


WAV_SIGNAL_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", LongType(), True),
        StructField("channels", LongType(), True),
        StructField("n_frames", LongType(), True),
        StructField("rms", DoubleType(), True),
        StructField("peak", DoubleType(), True),
        StructField("zero_cross_rate", DoubleType(), True),
    ]
)


RESAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("src_rate", LongType(), True),
        StructField("target_rate", LongType(), True),
        StructField("n_frames", LongType(), True),
        StructField("rms", DoubleType(), True),
        StructField("peak", DoubleType(), True),
    ]
)


def resample_audio_features(
    media: DataFrame, upsample_factor: int = 2
) -> DataFrame:
    """Linear-interpolation resample of decoded audio (WAV → FLAC →
    AIFF → MP3 sniff chain) to ``src_rate × upsample_factor``, reduced to
    rms/peak of the resampled channel-mean waveform — the DSP step a
    mixed-rate audio corpus runs before batching into fixed-rate
    training windows. Output grid: t_k = k / factor over the source
    index axis, n_out = (n − 1)·factor + 1 (no extrapolation beyond the
    hull — the np.interp convention).

    Exactness note: for power-of-two factors the grid positions are
    exact dyadic doubles, so on integer-sample sources (the FLAC ramp
    fixtures) every interpolated value, and therefore rms/peak, is an
    exact double — ``mm_audio_resample`` runs factor 2 under an exact
    SQL oracle; arbitrary factors are supported and replay-pinned in
    pytest. Non-decodable payloads yield NULL features, never a failed
    job. Arrow-batched mapInPandas, zero shuffle."""
    import numpy as np

    from .aiff import decode_aiff_samples
    from .flaccodec import decode_flac_samples
    from .mp3codec import decode_mp3_samples

    if upsample_factor < 1:
        raise ValueError("upsample_factor must be >= 1")

    def decode_any(payload: bytes):
        for dec in (decode_wav_samples, decode_flac_samples, decode_aiff_samples):
            try:
                return dec(payload)
            except (ValueError, ZeroDivisionError):
                pass
        return decode_mp3_samples(payload)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        f = upsample_factor
        cols = ["media_id", "src_rate", "target_rate", "n_frames", "rms", "peak"]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    rate, ch, s = decode_any(
                        bytes(payload) if payload is not None else None
                    )
                except (ValueError, ZeroDivisionError):
                    rows.append((mid, None, None, None, None, None))
                    continue
                if len(s) < 2:
                    rows.append((mid, rate, rate * f, len(s) * f if len(s) else 0,
                                 None, None))
                    continue
                mono = s.astype(np.float64).mean(axis=1)
                n_out = (len(mono) - 1) * f + 1
                pos = np.arange(n_out, dtype=np.float64) / f
                out = np.interp(pos, np.arange(len(mono), dtype=np.float64), mono)
                rows.append((
                    mid, rate, rate * f, n_out,
                    float(np.sqrt(np.mean(out**2))),
                    float(np.max(np.abs(out))),
                ))
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "payload").mapInPandas(
        extract, RESAMPLE_SCHEMA
    )


def wav_signal_features(media: DataFrame) -> DataFrame:
    """REAL signal features from decoded samples (no codec libs): WAV
    PCM16/PCM24/float32 first, then FLAC (CONSTANT/VERBATIM/FIXED/LPC
    subframes — flaccodec.decode_flac_samples; reserved/corrupt streams
    degrade the row to NULL features), then MPEG-1 Layer III
    (mp3codec.decode_mp3_samples — side info, bit reservoir,
    scalefactors, huffman subset, requantize, IMDCT, polyphase
    synthesis; streams outside the documented decode subset degrade to
    NULL features, see mp3codec's honest-scope docstring), with AIFF
    (operators/aiff.py, big-endian PCM 8/16/24) tried between FLAC and
    MP3 — the same sniff order as extract_audio_features. Per
    payload: RMS and peak of the channel-mean waveform (in the payload's
    native sample units — int16/int24 counts, float [-1,1], or the MP3
    decoder's requantized-spectrum units) and the
    zero-crossing rate — the audio-quality trio a training-data gate
    filters on (silence ≈ rms→0, clipping ≈ peak→32767, noise ≈ high
    ZCR). Non-decodable payloads yield NULL features, never a failed job.

    Deployment note: references the module-level decoders, so workers must
    import this package (local mode / --py-files — same contract as
    resize_images(mode="decode"))."""
    import numpy as np

    from .aiff import decode_aiff_samples
    from .flaccodec import decode_flac_samples
    from .mp3codec import decode_mp3_samples

    def decode_any(payload: bytes) -> tuple[int, int, "np.ndarray"]:
        for dec in (decode_wav_samples, decode_flac_samples, decode_aiff_samples):
            try:
                return dec(payload)
            except (ValueError, ZeroDivisionError):
                pass
        return decode_mp3_samples(payload)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    rate, ch, s = decode_any(
                        bytes(payload) if payload is not None else None
                    )
                except (ValueError, ZeroDivisionError):
                    rows.append((mid, None, None, None, None, None, None))
                    continue
                if len(s) == 0:
                    rows.append((mid, rate, ch, 0, None, None, None))
                    continue
                mono = s.astype(np.float64).mean(axis=1)
                rms = float(np.sqrt(np.mean(mono**2)))
                peak = float(np.max(np.abs(mono)))
                zc = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if len(mono) > 1 else 0.0
                rows.append((mid, rate, ch, len(s), rms, peak, zc))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "channels", "n_frames",
                    "rms", "peak", "zero_cross_rate",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        extract, WAV_SIGNAL_SCHEMA
    )


def extract_audio_features(media: DataFrame) -> DataFrame:
    """mapInPandas audio-metadata extraction — Arrow-batched, zero
    shuffle. WAV (RIFF chunk walk, nested worker-side copy), then FLAC
    STREAMINFO, then MPEG Layer III frame headers, then ADTS/AAC sync
    walk, then Ogg (Opus/Vorbis), AIFF and M4A/MP4 audio tracks
    (module-level parsers
    — workers must import this package, same contract as
    resize_images(mode="decode")); unrecognized payloads yield NULL
    metadata. ``bits`` is NULL for MP3 (lossy); MP3 frame counts are the
    CBR estimate."""

    def parse(payload):
        if payload is None or len(payload) < 12:
            return None
        b = bytes(payload)
        if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            return None
        i, fmt, data_size = 12, None, None
        while i + 8 <= len(b):
            cid = b[i : i + 4]
            size = int.from_bytes(b[i + 4 : i + 8], "little")
            if cid == b"fmt " and i + 8 + 16 <= len(b):
                fmt = {
                    "channels": int.from_bytes(b[i + 10 : i + 12], "little"),
                    "sample_rate": int.from_bytes(b[i + 12 : i + 16], "little"),
                    "block_align": int.from_bytes(b[i + 20 : i + 22], "little"),
                    "bits": int.from_bytes(b[i + 22 : i + 24], "little"),
                }
            elif cid == b"data":
                data_size = min(size, len(b) - i - 8)
            i += 8 + size + (size & 1)
        if fmt is None or data_size is None or fmt["block_align"] == 0:
            return None
        nf = data_size // fmt["block_align"]
        return (
            fmt["sample_rate"], fmt["channels"], fmt["bits"], nf,
            (nf * 1000) // max(fmt["sample_rate"], 1),
        )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .aac import parse_adts_header
        from .aiff import parse_aiff_header
        from .ogg import parse_ogg_header
        from .videocontainers import parse_m4a_header

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n = len(payload) if payload is not None else 0
                p = parse(payload)
                if p is None:
                    p = parse_flac_header(payload)
                if p is None:
                    # MP3 before ADTS: both sync on 0xFF but the layer
                    # bits disambiguate (MP3=01, ADTS=00) — each parser
                    # rejects the other's streams, so order is cosmetic
                    p = parse_mp3_header(payload)
                if p is None:
                    p = parse_adts_header(payload)
                if p is None:
                    p = parse_ogg_header(payload)
                if p is None:
                    p = parse_aiff_header(payload)
                if p is None:
                    p = parse_m4a_header(payload)
                if p is None:
                    rows.append((mid, n, None, None, None, None, None))
                else:
                    rows.append((mid, n, *p))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_bytes", "sample_rate", "channels",
                    "bits", "n_frames", "duration_ms",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        extract, AUDIO_FEATURE_SCHEMA
    )


def documents_as_audio(docs: DataFrame) -> DataFrame:
    """Adapter: wrap document text bytes in a REAL RIFF/WAVE container
    (spec-valid fmt chunk; PCM 16-bit; sample_rate and channels derived
    deterministically from doc_id) so the real WAV header parse is
    exercised against the synthetic tables and the parsed metadata is
    oracle-checkable arithmetic. Built entirely with JVM expressions —
    le4/le2 are byte-reversed unhex(lpad(hex)) — no UDF on the encode
    side."""

    def le(col, nbytes):
        # little-endian n-byte integer as a binary column
        parts = [
            F.unhex(
                F.lpad(
                    F.hex((col.cast("bigint") / F.lit(256**i)).cast("bigint") % 256),
                    2,
                    "0",
                )
            )
            for i in range(nbytes)
        ]
        return F.concat(*parts)

    channels = (F.lit(1) + F.col("doc_id") % 2).cast("bigint")
    rate = (F.lit(8000) + (F.col("doc_id") % 8) * F.lit(1000)).cast("bigint")
    bits = F.lit(16).cast("bigint")
    block = channels * F.lit(2)
    data = F.encode(F.col("text"), "utf-8")
    dlen = F.octet_length(F.col("text")).cast("bigint")
    payload = F.concat(
        F.lit(b"RIFF"),
        le(F.lit(36).cast("bigint") + dlen, 4),
        F.lit(b"WAVE"),
        F.lit(b"fmt "),
        le(F.lit(16), 4),           # fmt chunk size
        le(F.lit(1), 2),            # PCM
        le(channels, 2),
        le(rate, 4),
        le(rate * block, 4),        # byte rate
        le(block, 2),
        le(bits, 2),
        F.lit(b"data"),
        le(dlen, 4),
        data,
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        payload.alias("payload"),
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
        rate.alias("sample_rate"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def documents_as_flac(docs: DataFrame) -> DataFrame:
    """Adapter: synthesize a REAL FLAC stream per document — mono 16-bit
    ramp samples ``a + b·i`` with ``n = 64 + doc_id % 64``, ``a = doc_id
    % 1000 - 500``, ``b = doc_id % 7 - 3``, rate ``8000 + (doc_id % 8) ·
    1000`` — all deterministic functions of doc_id. FLAC is lossless and
    the samples are small integers, so the decoded rms/peak/ZCR are
    EXACT doubles computable in closed form (integer sums below 2^53
    are order-independent), which is what lets ``mm_flac_signal`` run
    the whole encode→frame-decode→stats path under an exact SQL oracle.
    Ramps exercise the FIXED-predictor path; b = 0 rows the CONSTANT
    path. Arrow-batched mapInPandas; partition-preserving, no shuffle."""
    import numpy as np

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .flaccodec import encode_flac

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 64 + did % 64
                a = did % 1000 - 500
                b = did % 7 - 3
                samples = a + b * np.arange(n, dtype=np.int64)
                rate = 8000 + (did % 8) * 1000
                rows.append(
                    (did, "audio", encode_flac(rate, samples[:, None]), rate)
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "sample_rate"]
            )

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("payload", BinaryType(), False),
            StructField("sample_rate", LongType(), False),
        ]
    )
    return docs.select("doc_id").mapInPandas(build, schema)


def documents_as_mp3(docs: DataFrame, vbr: bool = False) -> DataFrame:
    """Adapter: synthesize a REAL MPEG-1 Layer III stream per document
    — spec-valid frames of DIGITAL SILENCE (``part2_3_length = 0``
    in every granule: zero spectrum in, and the whole decode chain —
    side info, scalefactors, huffman budget, requantize, IMDCT,
    overlap-add, polyphase synthesis — must produce exactly 0.0 out,
    regardless of the synthesis window; see mp3codec's honest-scope
    note). Parameters are deterministic functions of doc_id: rate ∈
    {44100, 48000, 32000} by doc_id % 3, channels 1 + doc_id % 2,
    frames 2 + doc_id % 6, bitrate index 9 + doc_id % 3 — so
    ``mm_mp3_signal``'s sample counts and zero features are exact
    closed-form SQL. ``vbr=True`` emits the real-world VBR form
    instead: a leading Xing header frame (frames field = the audio
    frame count) + audio frames cycling bitrate indexes 9/10/11 —
    the CBR length estimate is WRONG for these streams by
    construction, so ``mm_mp3_vbr`` only hashes green through the
    Xing path. Arrow-batched mapInPandas, no shuffle."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .mp3codec import encode_mp3_frames

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                rate = (44100, 48000, 32000)[did % 3]
                rows.append((
                    did,
                    "audio",
                    encode_mp3_frames(
                        sr=rate,
                        channels=1 + did % 2,
                        n_frames=2 + did % 6,
                        bitrate_idx=9 + did % 3,
                        vbr_pattern=[9, 10, 11] if vbr else None,
                        xing=vbr,
                    ),
                    rate,
                ))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "sample_rate"]
            )

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("payload", BinaryType(), False),
            StructField("sample_rate", LongType(), False),
        ]
    )
    return docs.select("doc_id").mapInPandas(build, schema)


def documents_as_aiff(docs: DataFrame) -> DataFrame:
    """Adapter: synthesize a REAL AIFF per document with the SAME ramp
    derivations as documents_as_flac — mono 16-bit samples ``a + b·i``
    with ``n = 64 + doc_id % 64``, ``a = doc_id % 1000 - 500``,
    ``b = doc_id % 7 - 3``, rate ``8000 + (doc_id % 8) · 1000`` — so
    ``mm_aiff_signal`` reuses the proven closed-form signal oracle while
    exercising the big-endian PCM decode and the 80-bit extended-float
    rate field, and ``mm_aiff_meta``'s byte count is exact container
    arithmetic (54 + 2n bytes: FORM+type 12, COMM 8+18, SSND 8+8+2n).
    Arrow-batched mapInPandas; partition-preserving, no shuffle."""
    import numpy as np

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .aiff import encode_aiff

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 64 + did % 64
                a = did % 1000 - 500
                b = did % 7 - 3
                samples = a + b * np.arange(n, dtype=np.int64)
                rate = 8000 + (did % 8) * 1000
                rows.append((did, "audio", encode_aiff(rate, samples), rate))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "sample_rate"]
            )

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("payload", BinaryType(), False),
            StructField("sample_rate", LongType(), False),
        ]
    )
    return docs.select("doc_id").mapInPandas(build, schema)


def documents_as_m4a(docs: DataFrame) -> DataFrame:
    """Adapter: synthesize a REAL minimal M4A container per document
    (videocontainers.py::encode_m4a) — rate ∈ {44100, 48000, 32000,
    22050} by doc_id % 4, channels 1 + doc_id % 2, 16-bit stsd entry,
    mdhd duration 1024·(1 + doc_id % 5) samples at timescale == rate,
    and a trailing 'free' pad box of 1 + doc_id % 50 bytes — so the
    container size (518 + doc_id % 50) and every parsed field are exact
    doc_id arithmetic for ``mm_m4a_meta``. Arrow-batched mapInPandas;
    partition-preserving, no shuffle."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .videocontainers import encode_m4a

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                rate = (44100, 48000, 32000, 22050)[did % 4]
                payload = encode_m4a(
                    rate,
                    1 + did % 2,
                    1024 * (1 + did % 5),
                    pad=1 + did % 50,
                )
                rows.append((did, "audio", payload, rate))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "sample_rate"]
            )

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("payload", BinaryType(), False),
            StructField("sample_rate", LongType(), False),
        ]
    )
    return docs.select("doc_id").mapInPandas(build, schema)


IMAGE_SIGNAL_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("channels", LongType(), True),
        StructField("mean_px", DoubleType(), True),
        StructField("min_px", LongType(), True),
        StructField("max_px", LongType(), True),
    ]
)


def image_signal_features(media: DataFrame, native: bool | None = None) -> DataFrame:
    """REAL pixel statistics from decoded rasters (PNG via
    decode_png_pixels, baseline JPEG via jpegcodec) — per payload the
    decoded width/height/channels plus mean/min/max pixel value, the
    exposure/blank-image trio an image-corpus gate filters on (all-black
    scans ≈ mean→0, blown-out ≈ min→255, flat ≈ min==max). Payloads
    neither codec accepts yield NULL features, never a failed job.

    Deployment note: references the module-level codecs, so workers must
    import this package (same contract as resize_images(mode="decode")).

    ``native`` forwards to ``_decode_image_pixels`` (None = auto-dispatch
    to PIL when importable; False = pure-python oracle authority)."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows_cols = ["media_id", "width", "height", "channels", "mean_px", "min_px", "max_px"]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                decoded = (
                    _decode_image_pixels(bytes(payload), native=native)
                    if payload is not None else None
                )
                if decoded is None:
                    rows.append((mid, None, None, None, None, None, None))
                    continue
                w, h, ch, px = decoded
                arr = np.frombuffer(px, dtype=np.uint8)
                rows.append(
                    (
                        mid, w, h, ch,
                        float(arr.mean()) if arr.size else None,
                        int(arr.min()) if arr.size else None,
                        int(arr.max()) if arr.size else None,
                    )
                )
            yield pd.DataFrame(rows, columns=rows_cols)

    return media.select("media_id", "payload").mapInPandas(
        extract, IMAGE_SIGNAL_SCHEMA
    )


def documents_as_jpeg(docs: DataFrame) -> DataFrame:
    """Adapter: synthesize a REAL baseline JPEG per document — two-tone
    grayscale, left half ``doc_id % 256``, right half
    ``(37 + 11·doc_id) % 256``, dimensions deterministic functions of
    doc_id with BLOCK-ALIGNED halves (width = 16·(1+id%3), height =
    8·(1+id%4)). Every 8×8 block is flat and the encoder's quantization
    table is all-ones, so the decode is EXACT (see jpegcodec docstring)
    and the decoded pixel statistics are closed-form in doc_id — which is
    what lets ``mm_image_features`` run the whole encode→decode→stats
    path under an exact integer/double SQL oracle. Arrow-batched
    mapInPandas; partition-preserving, no shuffle."""
    import numpy as np

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .jpegcodec import encode_jpeg

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w = 16 * (1 + did % 3)
                h = 8 * (1 + did % 4)
                a = did % 256
                b = (37 + 11 * did) % 256
                img = np.empty((h, w), dtype=np.uint8)
                img[:, : w // 2] = a
                img[:, w // 2 :] = b
                rows.append((did, "image", encode_jpeg(w, h, img.tobytes()), w, h))
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


def documents_as_tiff(docs: DataFrame) -> DataFrame:
    """Adapter: synthesize a REAL baseline TIFF per document
    (operators/tiffcodec.py::encode_tiff) with pixel value
    ``a + b·y + c`` at row y / channel c, where ``a = doc_id % 200``,
    ``b = doc_id % 4``, ``w = 8 + doc_id % 9``, ``h = 5 + doc_id % 7``
    and channels 1 (even ids, grayscale) or 3 (odd ids, RGB) — max value
    199 + 3·10 + 2 = 231 < 256, so no wraparound and the decoded
    mean/min/max are closed-form in doc_id (the mean is a multiple of
    1/4 ⇒ IEEE-exact). The container variants rotate independently of
    the value pattern: byte order ``MM`` when (doc_id//2) is odd,
    PackBits when doc_id % 3 == 0, multi-strip (RowsPerStrip=4) when
    doc_id % 5 == 0 — one oracle pins both endiannesses, both
    compressions and the strip walk. Arrow-batched mapInPandas;
    partition-preserving, no shuffle."""
    import numpy as np

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .tiffcodec import encode_tiff

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w = 8 + did % 9
                h = 5 + did % 7
                ch = 1 if did % 2 == 0 else 3
                a = did % 200
                b = did % 4
                img = (
                    a
                    + b * np.arange(h, dtype=np.int64)[:, None, None]
                    + np.arange(ch, dtype=np.int64)[None, None, :]
                    + np.zeros((1, w, 1), dtype=np.int64)
                ).astype(np.uint8)
                payload = encode_tiff(
                    w,
                    h,
                    img.tobytes(),
                    ch,
                    big_endian=bool((did // 2) % 2),
                    packbits=did % 3 == 0,
                    rows_per_strip=4 if did % 5 == 0 else None,
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


AHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("ahash", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
    ]
)


def ahash_images(
    media: DataFrame, hash_size: int = 8, native: bool | None = False
) -> DataFrame:
    """Perceptual average-hash over REAL decoded pixels (PNG or baseline
    JPEG): nearest-downsample the channel-mean luma to hash_size², then
    one bit per cell (luma > mean), emitted as a lowercase hex string
    (strings group/join cleanly — no int64 sign traps at 64 bits).
    Identical hashes ⇒ perceptually-near-identical images regardless of
    container, re-encode, or resolution — the image twin of MinHash
    dedup: hash equality is a plain groupBy/equi-join, no O(n²) pixel
    comparisons. Non-decodable payloads yield a NULL hash (kept, never a
    failed job). Arrow-batched mapInPandas, zero shuffle. ``native``
    forwards to ``_decode_image_pixels`` but DEFAULTS TO False here
    (unlike the feature operators): hash-equality joins are exact-match
    sensitive, and PIL's JPEG IDCT is only ±1/px vs the pure-python
    chain — an environment-dependent decoder would silently move images
    between dedup buckets across clusters. Pass ``native=None`` to
    opt back into auto-dispatch, or True to force PIL."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hs = hash_size
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                decoded = (
                    _decode_image_pixels(bytes(payload), native=native)
                    if payload is not None else None
                )
                if decoded is None:
                    rows.append((mid, None, None, None))
                    continue
                w, h, ch, px = decoded
                arr = (
                    np.frombuffer(px, dtype=np.uint8)
                    .reshape(h, w, ch)
                    .mean(axis=2, dtype=np.float64)
                )
                ys = (np.arange(hs) * h) // hs
                xs = (np.arange(hs) * w) // hs
                small = arr[np.ix_(ys, xs)]
                bits = (small > small.mean()).ravel()
                val = 0
                for bit in bits:  # row-major, MSB-first within the integer
                    val = (val << 1) | int(bit)
                rows.append((mid, format(val, f"0{hs * hs // 4}x"), w, h))
            yield pd.DataFrame(rows, columns=["media_id", "ahash", "width", "height"])

    return media.select("media_id", "payload").mapInPandas(extract, AHASH_SCHEMA)


def parse_flac_header(payload: bytes | None) -> tuple | None:
    """FLAC STREAMINFO parse (pure python, public format spec): returns
    ``(sample_rate, channels, bits, total_samples, duration_ms)`` or None
    for non-FLAC / truncated payloads. STREAMINFO is the mandatory first
    metadata block: 20-bit sample rate, 3-bit channels-1, 5-bit bits-1,
    36-bit total samples, bit-packed at byte 10 of the block."""
    if payload is None or len(payload) < 4:
        return None
    b = bytes(payload)
    if b[:4] != b"fLaC":
        return None
    i = 4
    while i + 4 <= len(b):
        hdr = b[i]
        length = int.from_bytes(b[i + 1 : i + 4], "big")
        block = b[i + 4 : i + 4 + length]
        if (hdr & 0x7F) == 0:  # STREAMINFO
            if len(block) < 18:
                return None
            sr = (block[10] << 12) | (block[11] << 4) | (block[12] >> 4)
            ch = ((block[12] >> 1) & 0x07) + 1
            bits = (((block[12] & 1) << 4) | (block[13] >> 4)) + 1
            total = ((block[13] & 0x0F) << 32) | int.from_bytes(
                block[14:18], "big"
            )
            if sr == 0:
                return None
            return sr, ch, bits, total, (total * 1000) // sr
        if hdr & 0x80:  # last-metadata-block flag, STREAMINFO never seen
            return None
        i += 4 + length
    return None


_MP3_BITRATE_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_MP3_BITRATE_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
_MP3_SAMPLERATE = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def parse_mp3_header(payload: bytes | None) -> tuple | None:
    """MPEG Layer III frame-header parse (pure python, ISO 11172-3 /
    13818-3 tables): returns ``(sample_rate, channels, None,
    total_samples, duration_ms)`` — bits is None (lossy codec). Sample
    count: when the first frame carries a Xing/Info VBR header with the
    frames field (the LAME/real-world VBR form), total = xing_frames ×
    samples-per-frame EXACTLY (the Xing frame itself is not audio);
    otherwise the CBR estimate payload_bytes // frame_length ×
    samples-per-frame. Skips a leading ID3v2 tag (syncsafe size), scans
    (capped at 64 KiB) for an 11-bit frame sync VALIDATED by a second
    consecutive frame header — a stray 0xFF Ex in non-audio binary
    stays None. None for non-MP3 / reserved headers."""
    if payload is None or len(payload) < 4:
        return None
    b = bytes(payload)
    i = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        i = 10 + (
            ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14)
            | ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
        )
    # scan for a frame sync, but only accept a candidate whose frame is
    # followed by a second consecutive header with the same version /
    # layer / sample-rate (the standard MP3 sniff) — a lone 0xFF Ex in
    # arbitrary binary (images, video, random bytes) must stay None.
    # Sync scan is capped: real MP3s put frame 0 right after the tag.
    scan_end = min(len(b) - 4, i + 65536)
    while i <= scan_end:
        if not (b[i] == 0xFF and (b[i + 1] & 0xE0) == 0xE0):
            i += 1
            continue
        h1, h2, h3 = b[i + 1], b[i + 2], b[i + 3]
        version = (h1 >> 3) & 3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
        layer = (h1 >> 1) & 3  # 1 = Layer III
        br_idx, sr_idx, padding = h2 >> 4, (h2 >> 2) & 3, (h2 >> 1) & 1
        if layer != 1 or version == 1 or br_idx in (0, 15) or sr_idx == 3:
            i += 1
            continue  # free-format / reserved — keep scanning
        v1 = version == 3
        bitrate = (_MP3_BITRATE_V1_L3 if v1 else _MP3_BITRATE_V2_L3)[br_idx] * 1000
        sr = _MP3_SAMPLERATE[version][sr_idx]
        spf = 1152 if v1 else 576
        frame_len = (spf // 8) * bitrate // sr + padding
        if frame_len < 4:
            i += 1
            continue
        j = i + frame_len
        if j + 4 <= len(b):
            # second header must sync and agree on version/layer/sr
            if not (
                b[j] == 0xFF
                and (b[j + 1] & 0xE0) == 0xE0
                and ((b[j + 1] >> 3) & 3) == version
                and ((b[j + 1] >> 1) & 3) == layer
                and ((b[j + 2] >> 2) & 3) == sr_idx
            ):
                i += 1
                continue
        elif j != len(b):
            i += 1
            continue  # single frame must exactly fill the payload
        channels = 1 if ((h3 >> 6) & 3) == 3 else 2
        # Xing/Info VBR header: sits after the side info of the first
        # frame; its frames field is the exact audio frame count
        side = (17 if channels == 1 else 32) if v1 else (9 if channels == 1 else 17)
        x = i + 4 + (2 if not (h1 & 1) else 0) + side
        if b[x : x + 4] in (b"Xing", b"Info") and x + 12 <= len(b):
            flags = int.from_bytes(b[x + 4 : x + 8], "big")
            if flags & 1:  # frames field present
                total = int.from_bytes(b[x + 8 : x + 12], "big") * spf
                return sr, channels, None, total, (total * 1000) // sr
        n_mp3_frames = (len(b) - i) // max(frame_len, 1)
        total = n_mp3_frames * spf
        return sr, channels, None, total, (total * 1000) // sr
    return None


def dhash_images(
    media: DataFrame, hash_size: int = 8, native: bool | None = False
) -> DataFrame:
    """Perceptual difference-hash (dHash) over REAL decoded pixels — the
    gradient twin of ``ahash_images``: nearest-downsample the channel-
    mean luma to (hash_size+1) × hash_size, one bit per cell where the
    RIGHT neighbor is brighter (horizontal gradient sign), hex-string
    output. More robust than aHash to global brightness/contrast shifts
    (gradients survive them); same join-on-equality dedup shape, no
    O(n²) pixel compares. Non-decodable payloads yield a NULL hash.
    Arrow-batched mapInPandas, zero shuffle. ``native`` defaults to
    False for the same reason as ``ahash_images`` — hash equality must
    not depend on which decoder an executor happens to have."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hs = hash_size
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                decoded = (
                    _decode_image_pixels(bytes(payload), native=native)
                    if payload is not None else None
                )
                if decoded is None:
                    rows.append((mid, None, None, None))
                    continue
                w, h, ch, px = decoded
                arr = (
                    np.frombuffer(px, dtype=np.uint8)
                    .reshape(h, w, ch)
                    .mean(axis=2, dtype=np.float64)
                )
                ys = (np.arange(hs) * h) // hs
                xs = (np.arange(hs + 1) * w) // (hs + 1)
                small = arr[np.ix_(ys, xs)]
                bits = (small[:, 1:] > small[:, :-1]).ravel()
                val = 0
                for bit in bits:  # row-major, MSB-first within the integer
                    val = (val << 1) | int(bit)
                rows.append((mid, format(val, f"0{hs * hs // 4}x"), w, h))
            yield pd.DataFrame(rows, columns=["media_id", "ahash", "width", "height"])

    out = media.select("media_id", "payload").mapInPandas(extract, AHASH_SCHEMA)
    return out.withColumnRenamed("ahash", "dhash")
