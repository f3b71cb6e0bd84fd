"""Multimodal plumbing shapes: feature extraction (incl. the REAL image
header parse on genuine files), resize, frame sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seaexplorertools_spark.operators.multimodal import (
    decode_real,
    documents_as_media,
    encode_png,
    extract_features,
    parse_image_header,
    resize_images,
    sample_frames,
)


def test_feature_extraction_shapes(spark, sf_dir):
    media = documents_as_media(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    feats = extract_features(media).collect()
    assert len(feats) == media.count()
    for r in feats[:20]:
        assert r["n_bytes"] > 0
        assert 0 <= r["byte_mean"] <= 255
        assert 0 < r["byte_entropy_proxy"] <= 1
        # the PNG-shaped container carries doc-derived dims → real parse
        assert r["width"] == 1 + r["media_id"] % 64
        assert r["height"] == 1 + r["media_id"] % 48


def test_decode_real_on_genuine_png():
    """decode_real parses a spec-valid PNG (zlib-compressed IDAT, correct
    CRCs) produced by encode_png — a real file, not a crafted prefix."""
    png = encode_png(37, 21, bytes(range(256)) * (37 * 21 * 3 // 256 + 1))
    out = decode_real(png, "image")
    # round 5: decode_real goes all the way to PIXELS for 8-bit PNGs
    assert out["width"] == 37 and out["height"] == 21
    assert out["channels"] == 3 and len(out["pixels"]) == 37 * 21 * 3
    with pytest.raises(NotImplementedError):
        decode_real(b"not an image at all padded....", "image")
    with pytest.raises(NotImplementedError):
        decode_real(png, "video")


def test_parse_image_header_formats():
    gif = b"GIF89a" + (640).to_bytes(2, "little") + (480).to_bytes(2, "little") + b"\x00" * 8
    assert parse_image_header(gif) == (640, 480)
    bmp = b"BM" + b"\x00" * 16 + (800).to_bytes(4, "little") + (-600 % 2**32).to_bytes(4, "little") + b"\x00" * 4
    assert parse_image_header(bmp) == (800, 600)  # top-down BMP height
    # minimal JPEG: SOI + APP0 + SOF0(h=7,w=9) segment
    jpeg = (
        b"\xff\xd8" + b"\xff\xe0" + (4).to_bytes(2, "big") + b"JF"
        + b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08"
        + (7).to_bytes(2, "big") + (9).to_bytes(2, "big") + b"\x03" + b"\x00" * 6
    )
    assert parse_image_header(jpeg) == (9, 7)
    assert parse_image_header(b"plain text payload") == (None, None)
    assert parse_image_header(None) == (None, None)
    # WebP: VP8X (extended), VP8 (lossy frame tag), VP8L (lossless)
    vp8x = (
        b"RIFF" + bytes(4) + b"WEBP" + b"VP8X" + (10).to_bytes(4, "little")
        + bytes(4) + (639).to_bytes(3, "little") + (479).to_bytes(3, "little")
    )
    assert parse_image_header(vp8x) == (640, 480)
    vp8 = (
        b"RIFF" + bytes(4) + b"WEBP" + b"VP8 " + (12).to_bytes(4, "little")
        + bytes(3) + b"\x9d\x01\x2a"
        + (320).to_bytes(2, "little") + (200).to_bytes(2, "little") + bytes(2)
    )
    assert parse_image_header(vp8) == (320, 200)
    bits = (99) | (49 << 14)  # w-1=99, h-1=49
    vp8l = (
        b"RIFF" + bytes(4) + b"WEBP" + b"VP8L" + (9).to_bytes(4, "little")
        + b"\x2f" + bits.to_bytes(4, "little") + bytes(4)
    )
    assert parse_image_header(vp8l) == (100, 50)
    # WebP with an unknown first chunk stays unrecognized, not misparsed
    junk = b"RIFF" + bytes(4) + b"WEBP" + b"XXXX" + bytes(20)
    assert parse_image_header(junk) == (None, None)


def test_resize_produces_fixed_payload(spark, sf_dir):
    media = documents_as_media(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    resized = resize_images(media, 32, 16)
    rows = resized.collect()
    assert len(rows) == media.count()
    for r in rows[:20]:
        assert len(r["payload"]) == 32 * 16
        assert (r["width"], r["height"]) == (32, 16)


def test_frame_sampling_explodes_rows(spark, sf_dir):
    media = documents_as_media(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    frames = sample_frames(resize_images(media, 64, 64), 4)
    counts = frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    assert all(r["n"] == 4 for r in counts)
    assert len(counts) == media.count()


def test_wav_header_parse_against_stdlib_wave(spark):
    import io
    import wave as wavemod

    from seaexplorertools_spark.operators.multimodal import (
        extract_audio_features,
        parse_wav_header,
    )

    # genuine WAV written by the stdlib — independent of our encoder
    buf = io.BytesIO()
    with wavemod.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(b"\x01\x02\x03\x04" * 1000)  # 1000 stereo frames
    raw = buf.getvalue()

    p = parse_wav_header(raw)
    assert p == {
        "sample_rate": 44100,
        "channels": 2,
        "bits": 16,
        "n_frames": 1000,
        "duration_ms": 1000 * 1000 // 44100,
    }
    # non-WAV payloads are rejected, not misparsed
    assert parse_wav_header(b"\x89PNG\r\n\x1a\nXXXXXXXX") is None
    assert parse_wav_header(None) is None

    # distributed path sees the same metadata
    df = spark.createDataFrame([(1, bytearray(raw))], ["media_id", "payload"])
    row = extract_audio_features(df).collect()[0]
    assert (row["sample_rate"], row["channels"], row["bits"], row["n_frames"]) == (
        44100, 2, 16, 1000,
    )
    assert row["n_bytes"] == len(raw)


def test_png_pixel_codec_roundtrip_all_filters():
    """decode_png_pixels inverts encode_png exactly, and unfilters
    Sub/Up/Average/Paeth rasters produced by a independent re-filtering of
    the same image."""
    import struct
    import zlib

    from seaexplorertools_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png,
    )

    w, h = 7, 5
    rgb = bytes((x * 37 + y * 11 + c * 101) % 256 for y in range(h) for x in range(w) for c in range(3))
    png = encode_png(w, h, rgb)
    dw, dh, ch, px = decode_png_pixels(png)
    assert (dw, dh, ch) == (w, h, 3)
    assert px == rgb

    # hand-build a PNG using every filter type, one per row (5 rows)
    stride = w * 3
    rows = [rgb[y * stride : (y + 1) * stride] for y in range(h)]

    def filt(ftype, cur, prev):
        out = bytearray()
        for x in range(stride):
            a = cur[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((cur[x] - pred) & 0xFF)
        return bytes(out)

    raw = b""
    prev = bytes(stride)
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        raw += bytes([ftype]) + filt(ftype, rows[y], prev)
        prev = rows[y]

    def chunk(typ, data):
        return struct.pack(">I", len(data)) + typ + data + struct.pack(
            ">I", zlib.crc32(typ + data) & 0xFFFFFFFF
        )

    png2 = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    dw, dh, ch, px = decode_png_pixels(png2)
    assert px == rgb  # every filter type unfiltered exactly


def test_png_decode_rejects_unsupported():
    import pytest as _pytest

    from seaexplorertools_spark.operators.multimodal import decode_png_pixels

    with _pytest.raises(ValueError):
        decode_png_pixels(b"JFIF not a png")


def test_resize_decode_mode_survives_corrupt_png(spark):
    """A payload with a VALID PNG magic but corrupt IDAT (zlib.error) or a
    truncated IHDR (struct.error) must fall back to the stub, not abort the
    job — a dirty corpus is the normal case at scale."""
    from seaexplorertools_spark.operators.multimodal import (
        decode_real,
        encode_png,
        resize_images,
    )

    good = encode_png(4, 4, bytes(48))
    corrupt = bytearray(good)
    corrupt[40] ^= 0xFF  # flip a byte inside the IDAT stream
    truncated = good[:20]  # mid-IHDR
    rows = [
        (1, "image", bytearray(corrupt), 4, 4),
        (2, "image", bytearray(truncated), 4, 4),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, width int, height int"
    )
    out = {
        r["media_id"]: bytes(r["payload"])
        for r in resize_images(media, width=2, height=2, mode="decode").collect()
    }
    assert len(out[1]) == 4 and len(out[2]) == 4  # stub: width*height bytes
    # decode_real degrades to the header parse instead of crashing
    got = decode_real(bytes(corrupt), "image")
    assert got == {"width": 4, "height": 4}


def test_resize_images_decode_mode_real_pixels(spark):
    """mode='decode': a real 4x4 gradient PNG nearest-neighbor-resampled to
    2x2 — output pixels equal the exact source pixels the NN map selects;
    a non-PNG payload falls back to the stub on the same run."""
    import numpy as np

    from seaexplorertools_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png,
        resize_images,
    )

    w0 = h0 = 4
    rgb = bytes(
        (x * 50 + y * 13 + c * 7) % 256
        for y in range(h0) for x in range(w0) for c in range(3)
    )
    png = encode_png(w0, h0, rgb)
    rows = [
        (1, "image", bytearray(png), w0, h0),
        (2, "image", bytearray(b"rawbytesnotpng"), 3, 3),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, width int, height int"
    )
    out = {
        r["media_id"]: r
        for r in resize_images(media, width=2, height=2, mode="decode").collect()
    }
    dw, dh, ch, px = decode_png_pixels(bytes(out[1]["payload"]))
    assert (dw, dh, ch) == (2, 2, 3)
    src = np.frombuffer(rgb, dtype=np.uint8).reshape(h0, w0, 3)
    want = bytes(
        int(src[y * h0 // 2, x * w0 // 2, c])
        for y in range(2) for x in range(2) for c in range(3)
    )
    assert px == want
    # non-PNG row used the stub: width*height bytes of cycled payload
    stub = bytes(out[2]["payload"])
    assert len(stub) == 4 and stub == (b"rawbytesnotpng" * 1)[:4]


def test_wav_sample_decode_and_signal_features(spark):
    """decode_wav_samples returns the EXACT PCM16 frames the stdlib wave
    module wrote; wav_signal_features' rms/peak/zcr equal a direct numpy
    computation on the known waveform; non-PCM16 payloads degrade to NULL
    features instead of failing the job."""
    import io
    import wave as wavemod

    import numpy as np

    from seaexplorertools_spark.operators.multimodal import (
        decode_wav_samples,
        wav_signal_features,
    )

    t = np.arange(2000)
    mono = (10000 * np.sin(2 * np.pi * t / 50)).astype(np.int16)
    stereo = np.stack([mono, (mono // 2)], axis=1)
    buf = io.BytesIO()
    with wavemod.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(stereo.astype("<i2").tobytes())
    raw = buf.getvalue()

    rate, ch, s = decode_wav_samples(raw)
    assert (rate, ch) == (16000, 2)
    assert np.array_equal(s, stereo)

    df = spark.createDataFrame(
        [(1, bytearray(raw)), (2, bytearray(b"not audio at all"))],
        ["media_id", "payload"],
    )
    rows = {r["media_id"]: r for r in wav_signal_features(df).collect()}
    m = stereo.astype(np.float64).mean(axis=1)
    assert rows[1]["n_frames"] == 2000
    assert rows[1]["rms"] == pytest.approx(float(np.sqrt(np.mean(m**2))))
    assert rows[1]["peak"] == pytest.approx(float(np.max(np.abs(m))))
    want_zc = float(np.mean(np.signbit(m[1:]) != np.signbit(m[:-1])))
    assert rows[1]["zero_cross_rate"] == pytest.approx(want_zc)
    assert rows[2]["rms"] is None and rows[2]["sample_rate"] is None

    with pytest.raises(ValueError):
        decode_wav_samples(b"RIFFxxxxWAVE")  # no fmt/data chunks


def _build_gif(n_frames=5, w=4, h=3, delays=(10, 20, 30, 40, 50)):
    """Hand-assemble a spec-valid GIF89a with n animated frames (tiny LZW
    data sub-blocks; pixel content irrelevant to the boundary walk)."""
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | 0x00, 0, 0])  # GCT flag, 2-entry table
    out += b"\x00\x00\x00\xff\xff\xff"  # global color table (2 x RGB)
    frames = []
    for i in range(n_frames):
        # graphic control extension with a per-frame delay
        out += b"\x21\xf9\x04\x00" + (delays[i] // 10).to_bytes(2, "little") + b"\x00\x00"
        start = len(out)
        out += b"\x2c"  # image descriptor
        out += (0).to_bytes(2, "little") + (0).to_bytes(2, "little")
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out += b"\x00"  # no local color table
        out += b"\x02"  # LZW min code size
        data = bytes([i + 1] * 3)  # fake LZW bytes
        out += bytes([len(data)]) + data + b"\x00"
        frames.append((start, len(out)))
    out += b"\x3b"  # trailer
    return bytes(out), frames


def test_gif_frame_walk_and_real_sampling(spark):
    """parse_gif_frames finds every frame's exact byte span and delay;
    sample_frames(mode='gif') emits REAL frame spans (evenly sampled),
    and falls back to stub slicing for non-GIF payloads."""
    from seaexplorertools_spark.operators.multimodal import (
        parse_gif_frames,
        sample_frames,
    )

    gif, spans = _build_gif()
    frames = parse_gif_frames(gif)
    assert [(f["start"], f["end"]) for f in frames] == spans
    assert [f["delay_ms"] for f in frames] == [10, 20, 30, 40, 50]
    assert all((f["width"], f["height"]) == (4, 3) for f in frames)

    df = spark.createDataFrame(
        [(1, bytearray(gif)), (2, bytearray(b"AVI-ish opaque payload bytes"))],
        ["media_id", "payload"],
    )
    rows = sample_frames(df, n_frames=2, mode="gif").collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    got = sorted(
        (r["frame_idx"], bytes(r["frame_payload"])) for r in by_media[1]
    )
    # 2 of 5 frames, evenly sampled: indices 0 and 2
    assert got[0][1] == gif[spans[0][0] : spans[0][1]]
    assert got[1][1] == gif[spans[2][0] : spans[2][1]]
    assert len(by_media[2]) == 2  # stub fallback still yields frames

    with pytest.raises(ValueError):
        parse_gif_frames(b"GIF89a\x00")  # truncated


def _build_wav(tag, bits, channels, rate, data, block_align=None):
    """Hand-assemble a RIFF/WAVE payload (stdlib wave only writes PCM
    integers, so float32 / corrupt-fmt cases are built by hand)."""
    ba = channels * bits // 8 if block_align is None else block_align
    fmt = (
        int(tag).to_bytes(2, "little")
        + int(channels).to_bytes(2, "little")
        + int(rate).to_bytes(4, "little")
        + int(rate * ba).to_bytes(4, "little")
        + int(ba).to_bytes(2, "little")
        + int(bits).to_bytes(2, "little")
    )
    body = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_wav_decode_float32_roundtrip(spark):
    import numpy as np

    from seaexplorertools_spark.operators.multimodal import (
        decode_wav_samples,
        wav_signal_features,
    )

    mono = np.linspace(-1.0, 1.0, 400, dtype=np.float32)
    raw = _build_wav(3, 32, 1, 8000, mono.astype("<f4").tobytes())
    rate, ch, s = decode_wav_samples(raw)
    assert (rate, ch) == (8000, 1)
    assert s.dtype == np.float32 and np.array_equal(s[:, 0], mono)

    df = spark.createDataFrame([(1, bytearray(raw))], ["media_id", "payload"])
    row = wav_signal_features(df).collect()[0]
    m = mono.astype(np.float64)
    assert row["n_frames"] == 400
    assert row["rms"] == pytest.approx(float(np.sqrt(np.mean(m**2))))
    assert row["peak"] == pytest.approx(1.0)


def test_wav_decode_pcm24_sign_extension():
    import numpy as np

    from seaexplorertools_spark.operators.multimodal import decode_wav_samples

    vals = np.array([-(2**23), 2**23 - 1, 0, 12345, -1, -654321], dtype=np.int32)
    data = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    raw = _build_wav(1, 24, 2, 44100, data)  # 2 channels -> 3 frames
    rate, ch, s = decode_wav_samples(raw)
    assert (rate, ch) == (44100, 2)
    assert s.dtype == np.int32 and s.shape == (3, 2)
    assert np.array_equal(s.ravel(), vals)


def test_wav_corrupt_block_align_degrades_per_row(spark):
    """A crafted WAV with valid magic, tag=1, bits=16 but block_align=0
    must raise ValueError from the decoder (not ZeroDivisionError) and
    yield NULL features in the Spark path — one dirty payload never
    fails the job (ADVICE r5)."""
    import numpy as np

    from seaexplorertools_spark.operators.multimodal import (
        decode_wav_samples,
        wav_signal_features,
    )

    good = _build_wav(1, 16, 1, 8000, np.arange(50, dtype="<i2").tobytes())
    bad = _build_wav(1, 16, 1, 8000, b"\x00\x01" * 10, block_align=0)
    mismatched = _build_wav(1, 16, 2, 8000, b"\x00\x01" * 10, block_align=2)
    for payload in (bad, mismatched):
        with pytest.raises(ValueError, match="corrupt WAV fmt"):
            decode_wav_samples(payload)

    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(bad)), (3, bytearray(mismatched))],
        ["media_id", "payload"],
    )
    rows = {r["media_id"]: r for r in wav_signal_features(df).collect()}
    assert rows[1]["n_frames"] == 50 and rows[1]["rms"] is not None
    assert rows[2]["rms"] is None and rows[3]["rms"] is None


def test_resize_decode_mode_handles_jpeg_and_mixed_corpus(spark):
    """mode='decode' resizes real JPEG pixels (via the baseline decoder)
    alongside PNGs; garbage and truncated-JPEG payloads fall back to the
    stub — one mixed batch, zero job failures."""
    import numpy as np

    from seaexplorertools_spark.operators.jpegcodec import encode_jpeg
    from seaexplorertools_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png,
        resize_images,
    )

    flat = np.full((16, 16), 200, np.uint8)
    jp = encode_jpeg(16, 16, flat.tobytes(), channels=1)
    png = encode_png(4, 4, bytes(range(48)))
    rows = [
        (1, "image", bytearray(jp), 8, 8),
        (2, "image", bytearray(png), 8, 8),
        (3, "image", bytearray(b"garbage-bytes"), 8, 8),
        (4, "image", bytearray(jp[: len(jp) // 2]), 8, 8),  # truncated JPEG
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, width long, height long"
    )
    out = {r["media_id"]: r for r in resize_images(df, 8, 8, mode="decode").collect()}
    # JPEG row: real decode — flat 200 grayscale → all-200 RGB PNG
    w, h, ch, px = decode_png_pixels(bytes(out[1]["payload"]))
    assert (w, h, ch) == (8, 8, 3) and set(px) == {200}
    # PNG row: still the real PNG lane
    w, h, ch, _ = decode_png_pixels(bytes(out[2]["payload"]))
    assert (w, h, ch) == (8, 8, 3)
    # garbage + truncated rows: stub payloads of width*height bytes
    assert len(bytes(out[3]["payload"])) == 64
    assert len(bytes(out[4]["payload"])) == 64


def test_image_signal_features_mixed(spark):
    import numpy as np

    from seaexplorertools_spark.operators.jpegcodec import encode_jpeg
    from seaexplorertools_spark.operators.multimodal import (
        encode_png,
        image_signal_features,
    )

    two = np.zeros((8, 16), np.uint8)
    two[:, :8] = 10
    two[:, 8:] = 250
    jp = encode_jpeg(16, 8, two.tobytes(), channels=1)
    png = encode_png(2, 2, bytes([0, 0, 0, 255, 255, 255, 10, 20, 30, 40, 50, 60]))
    df = spark.createDataFrame(
        [(1, bytearray(jp)), (2, bytearray(png)), (3, bytearray(b"nope"))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in image_signal_features(df).collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["channels"]) == (16, 8, 1)
    assert rows[1]["mean_px"] == 130.0  # (10+250)/2 — exact flat-block decode
    assert (rows[1]["min_px"], rows[1]["max_px"]) == (10, 250)
    assert (rows[2]["width"], rows[2]["channels"]) == (2, 3)
    assert rows[2]["min_px"] == 0 and rows[2]["max_px"] == 255
    assert rows[3]["width"] is None and rows[3]["mean_px"] is None


def test_documents_as_jpeg_payloads_are_real_jpegs(spark, sf_dir):
    import numpy as np

    from seaexplorertools_spark.operators.jpegcodec import decode_jpeg_pixels
    from seaexplorertools_spark.operators.multimodal import documents_as_jpeg

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
    for r in documents_as_jpeg(docs).collect():
        did = r["media_id"]
        w, h, ch, px = decode_jpeg_pixels(bytes(r["payload"]))
        assert (w, h, ch) == (16 * (1 + did % 3), 8 * (1 + did % 4), 1)
        arr = np.frombuffer(px, np.uint8).reshape(h, w)
        assert set(arr[:, : w // 2].ravel()) == {did % 256}
        assert set(arr[:, w // 2 :].ravel()) == {(37 + 11 * did) % 256}


def test_ahash_images_groups_perceptual_duplicates(spark):
    """Identical content hashed through DIFFERENT containers (PNG vs
    JPEG) and DIFFERENT resolutions lands in one ahash bucket; distinct
    content lands elsewhere; garbage hashes NULL."""
    import numpy as np

    from seaexplorertools_spark.operators.jpegcodec import encode_jpeg
    from seaexplorertools_spark.operators.multimodal import ahash_images, encode_png

    def two_tone(w, h, a, b):
        img = np.zeros((h, w), np.uint8)
        img[:, : w // 2] = a
        img[:, w // 2 :] = b
        return img

    jp_small = encode_jpeg(16, 16, two_tone(16, 16, 30, 220).tobytes())
    jp_large = encode_jpeg(64, 32, two_tone(64, 32, 30, 220).tobytes())  # same scene, other res
    img = two_tone(16, 16, 30, 220)
    png_rgb = encode_png(16, 16, np.repeat(img[:, :, None], 3, axis=2).tobytes())
    jp_flip = encode_jpeg(16, 16, two_tone(16, 16, 220, 30).tobytes())  # mirrored tones

    df = spark.createDataFrame(
        [
            (1, bytearray(jp_small)),
            (2, bytearray(jp_large)),
            (3, bytearray(png_rgb)),
            (4, bytearray(jp_flip)),
            (5, bytearray(b"garbage")),
        ],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in ahash_images(df).collect()}
    assert out[1]["ahash"] == "0f" * 8  # dark left half → right bits set
    assert out[1]["ahash"] == out[2]["ahash"] == out[3]["ahash"]
    assert out[4]["ahash"] == "f0" * 8
    assert out[4]["ahash"] != out[1]["ahash"]
    assert out[5]["ahash"] is None
    assert (out[2]["width"], out[2]["height"]) == (64, 32)


def test_flac_and_mp3_header_parse(spark):
    """Hand-assembled FLAC STREAMINFO and CBR MP3 (with ID3v2 prefix)
    through the same audio-feature lane as WAV; garbage stays NULL."""
    from seaexplorertools_spark.operators.multimodal import (
        extract_audio_features,
        parse_flac_header,
        parse_mp3_header,
    )

    # FLAC: 44100 Hz, 2ch, 16-bit, 88200 samples (2 s)
    sr, ch, bits, total = 44100, 2, 16, 88200
    packed = bytes(
        [
            (sr >> 12) & 0xFF,
            (sr >> 4) & 0xFF,
            ((sr & 0x0F) << 4) | ((ch - 1) << 1) | ((bits - 1) >> 4),
            (((bits - 1) & 0x0F) << 4) | ((total >> 32) & 0x0F),
        ]
    ) + (total & 0xFFFFFFFF).to_bytes(4, "big")
    streaminfo = bytes(10) + packed + bytes(16)  # md5 tail
    flac = b"fLaC" + bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    assert parse_flac_header(flac) == (44100, 2, 16, 88200, 2000)

    # MP3: MPEG1 Layer III, 128 kbps, 44100 Hz, stereo, 10 CBR frames
    hdr = bytes([0xFF, 0xFB, 0x90, 0x00])  # sync|V1|L3|nocrc, 128k|44100|nopad
    frame_len = 144 * 128000 // 44100  # 417
    frames = (hdr + bytes(frame_len - 4)) * 10
    id3 = b"ID3" + bytes([4, 0, 0, 0, 0, 0, 20]) + bytes(20)
    mp3 = id3 + frames
    got = parse_mp3_header(mp3)
    assert got[0] == 44100 and got[1] == 2 and got[2] is None
    assert got[3] == 10 * 1152 and got[4] == (10 * 1152 * 1000) // 44100

    assert parse_flac_header(b"junk") is None and parse_mp3_header(b"junk") is None

    # a lone valid-looking frame header buried in non-audio binary must
    # NOT be accepted — the sniff requires a second consecutive header
    # (round-6 ADVICE: images/video/random bytes were yielding garbage
    # sample_rate/duration through the last-resort MP3 fallback)
    stray = bytes(100) + hdr + bytes(300)  # frame_len=417 > remaining
    assert parse_mp3_header(stray) is None
    rng_junk = bytes([(i * 197 + 13) % 256 for i in range(4096)])
    assert parse_mp3_header(b"\x00" * 7 + hdr + rng_junk) is None
    # but a single frame that exactly fills the payload is legitimate
    assert parse_mp3_header(hdr + bytes(frame_len - 4))[0] == 44100
    # and VBR-style frames (different bitrate, same version/layer/sr) pass
    hdr2 = bytes([0xFF, 0xFB, 0x70, 0x00])  # 112 kbps
    fl2 = 144 * 112000 // 44100
    assert parse_mp3_header(hdr2 + bytes(fl2 - 4) + hdr + bytes(frame_len - 4))[0] == 44100

    df = spark.createDataFrame(
        [(1, bytearray(flac)), (2, bytearray(mp3)), (3, bytearray(b"junk"))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in extract_audio_features(df).collect()}
    assert rows[1]["sample_rate"] == 44100 and rows[1]["bits"] == 16
    assert rows[1]["n_frames"] == 88200 and rows[1]["duration_ms"] == 2000
    assert rows[2]["sample_rate"] == 44100 and rows[2]["bits"] is None
    assert rows[3]["sample_rate"] is None


def test_png_bomb_and_huge_ihdr_degrade():
    """A crafted IHDR claiming a giant raster, or a small IDAT inflating
    past the declared raster, must ValueError — bounded inflate, no
    MemoryError."""
    import struct
    import zlib as _zlib

    import pytest as _pytest

    from seaexplorertools_spark.operators.multimodal import decode_png_pixels

    def chunk(typ, data):
        return struct.pack(">I", len(data)) + typ + data + struct.pack(
            ">I", _zlib.crc32(typ + data) & 0xFFFFFFFF
        )

    huge = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 60000, 60000, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", _zlib.compress(b"\x00" * 100))
        + chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="too large"):
        decode_png_pixels(huge)

    # 2x2 declared, IDAT inflates to far more than the raster
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", _zlib.compress(b"\x00" * 10_000_000))
        + chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="size mismatch"):
        decode_png_pixels(bomb)


def _raw_png(w, h, depth, ctype, raw, plte=None, trns=None, interlace=0):
    """Assemble a PNG from a pre-filtered raw scanline stream."""
    import struct as _struct
    import zlib as _zlib

    def chunk(typ, data):
        return _struct.pack(">I", len(data)) + typ + data + _struct.pack(
            ">I", _zlib.crc32(typ + data) & 0xFFFFFFFF
        )

    out = b"\x89PNG\r\n\x1a\n" + chunk(
        b"IHDR", _struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    )
    if plte is not None:
        out += chunk(b"PLTE", plte)
    if trns is not None:
        out += chunk(b"tRNS", trns)
    return out + chunk(b"IDAT", _zlib.compress(raw)) + chunk(b"IEND", b"")


def test_png_palette_depths_and_trns():
    import numpy as np

    from seaexplorertools_spark.operators.multimodal import decode_png_pixels

    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 7, 7])  # 4 entries

    # 8-bit palette, 4x2, filter 0 rows
    idx = [[0, 1, 2, 3], [3, 2, 1, 0]]
    raw = b"".join(b"\x00" + bytes(r) for r in idx)
    w, h, ch, px = decode_png_pixels(_raw_png(4, 2, 8, 3, raw, plte=pal))
    assert (w, h, ch) == (4, 2, 3)
    got = np.frombuffer(px, np.uint8).reshape(2, 4, 3)
    assert tuple(got[0, 0]) == (255, 0, 0) and tuple(got[1, 0]) == (7, 7, 7)

    # same with tRNS: entry 0 transparent -> RGBA
    w, h, ch, px = decode_png_pixels(
        _raw_png(4, 2, 8, 3, raw, plte=pal, trns=bytes([0]))
    )
    assert ch == 4
    got = np.frombuffer(px, np.uint8).reshape(2, 4, 4)
    assert got[0, 0, 3] == 0 and got[0, 1, 3] == 255

    # 4-bit palette: 5 pixels/row -> 3 packed bytes, MSB-first nibbles
    nib_rows = [[0, 1, 2, 3, 1], [3, 3, 0, 1, 2]]
    raw4 = b""
    for r in nib_rows:
        packed = bytearray()
        for i in range(0, 6, 2):
            hi = r[i] if i < 5 else 0
            lo = r[i + 1] if i + 1 < 5 else 0
            packed.append((hi << 4) | lo)
        raw4 += b"\x00" + bytes(packed)
    w, h, ch, px = decode_png_pixels(_raw_png(5, 2, 4, 3, raw4, plte=pal))
    got = np.frombuffer(px, np.uint8).reshape(2, 5, 3)
    pal3 = np.frombuffer(pal, np.uint8).reshape(4, 3)
    for y in range(2):
        for x in range(5):
            assert tuple(got[y, x]) == tuple(pal3[nib_rows[y][x]]), (y, x)

    # out-of-range index must ValueError, not IndexError
    bad = b"\x00" + bytes([9, 0, 0, 0]) + b"\x00" + bytes([0, 0, 0, 0])
    with pytest.raises(ValueError, match="palette index"):
        decode_png_pixels(_raw_png(4, 2, 8, 3, bad, plte=pal))


def test_png_1bit_gray_and_16bit_rgb():
    import numpy as np

    from seaexplorertools_spark.operators.multimodal import decode_png_pixels

    # 1-bit gray, 10 px/row (2 packed bytes), pattern scaled to 0/255
    bits = [1, 0, 1, 1, 0, 0, 1, 0, 1, 1]
    packed = bytes([0b10110010, 0b11000000])
    raw = b"\x00" + packed
    w, h, ch, px = decode_png_pixels(_raw_png(10, 1, 1, 0, raw))
    assert (w, h, ch) == (10, 1, 1)
    assert list(px) == [255 * b for b in bits]

    # 16-bit RGB downscales to the high byte
    pix16 = [(0x1234, 0xFF00, 0x0001), (0xABCD, 0x0000, 0x8081)]
    row = b"".join(v.to_bytes(2, "big") for p in pix16 for v in p)
    w, h, ch, px = decode_png_pixels(_raw_png(2, 1, 16, 2, b"\x00" + row))
    assert (w, h, ch) == (2, 1, 3)
    assert list(px) == [0x12, 0xFF, 0x00, 0xAB, 0x00, 0x80]


def test_png_adam7_interlace_roundtrip():
    """An Adam7-interlaced image decodes pixel-identically to its
    non-interlaced twin (8-bit RGB, filter-0 rows, pass layout from the
    public spec)."""
    import numpy as np

    from seaexplorertools_spark.operators.multimodal import (
        _ADAM7,
        decode_png_pixels,
    )

    rng = np.random.default_rng(5)
    w0, h0 = 11, 9  # odd dims exercise empty/partial passes
    img = rng.integers(0, 256, (h0, w0, 3), dtype=np.uint8)

    plain_raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h0))
    _, _, _, want = decode_png_pixels(_raw_png(w0, h0, 8, 2, plain_raw))

    inter_raw = b""
    for xs, ys, xst, yst in _ADAM7:
        sub = img[ys::yst, xs::xst]
        if sub.size == 0:
            continue
        inter_raw += b"".join(b"\x00" + sub[y].tobytes() for y in range(sub.shape[0]))
    _, _, _, got = decode_png_pixels(_raw_png(w0, h0, 8, 2, inter_raw, interlace=1))
    assert got == want == img.tobytes()


def test_gif_pixel_decode_lzw_palette_interlace():
    """Real LZW decode: indices round-trip through the mini encoder's
    genuine dictionary growth; interlaced frames deinterlace to the same
    pixels; corrupt streams and out-of-range indices ValueError."""
    import numpy as np

    from seaexplorertools_spark.operators.multimodal import (
        decode_gif_pixels,
        encode_gif,
    )

    rng = np.random.default_rng(3)
    pal = bytes(rng.integers(0, 256, (16, 3), dtype=np.uint8).ravel())
    pal_arr = np.frombuffer(pal, np.uint8).reshape(16, 3)
    idx = rng.integers(0, 16, (9, 13), dtype=np.uint8)
    want = pal_arr[idx].tobytes()
    for inter in (False, True):
        gif = encode_gif(13, 9, idx.tobytes(), pal, interlaced=inter)
        w, h, ch, px = decode_gif_pixels(gif)
        assert (w, h, ch) == (13, 9, 3) and px == want, inter

    # dictionary growth past several width bumps (20k symbols, 4 colors)
    big = ((np.arange(20000) * 7919) % 4).astype(np.uint8)
    gif = encode_gif(200, 100, big.tobytes(), bytes(range(12)))
    _, _, _, px = decode_gif_pixels(gif)
    assert px == np.frombuffer(bytes(range(12)), np.uint8).reshape(4, 3)[
        big.reshape(100, 200)
    ].tobytes()

    gif = encode_gif(13, 9, idx.tobytes(), pal)
    with pytest.raises(ValueError):
        decode_gif_pixels(gif[: len(gif) - 30])  # truncated LZW/trailer
    with pytest.raises(ValueError):
        decode_gif_pixels(gif, frame_index=5)


def test_bmp_pixel_decode_roundtrip_and_rejects():
    import numpy as np

    from seaexplorertools_spark.operators.multimodal import (
        decode_bmp_pixels,
        encode_bmp,
    )

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)  # stride padding hits
    w, h, ch, px = decode_bmp_pixels(encode_bmp(5, 7, img.tobytes()))
    assert (w, h, ch) == (5, 7, 3) and px == img.tobytes()
    with pytest.raises(ValueError):
        decode_bmp_pixels(b"BM" + bytes(60))  # zero dims/bits
    bmp = bytearray(encode_bmp(5, 7, img.tobytes()))
    bmp[30] = 1  # RLE8 compression flag
    with pytest.raises(ValueError, match="unsupported BMP"):
        decode_bmp_pixels(bytes(bmp))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp_pixels(bytes(encode_bmp(5, 7, img.tobytes())[:-10]))


def test_image_chain_covers_gif_and_bmp(spark):
    """image_signal_features + ahash now see GIF and BMP payloads through
    the shared codec chain."""
    import numpy as np

    from seaexplorertools_spark.operators.multimodal import (
        encode_bmp,
        encode_gif,
        image_signal_features,
    )

    flat_idx = np.zeros((8, 8), np.uint8)
    gif = encode_gif(8, 8, flat_idx.tobytes(), bytes([40, 40, 40]))
    bmp = encode_bmp(4, 4, bytes([200] * 48))
    df = spark.createDataFrame(
        [(1, bytearray(gif)), (2, bytearray(bmp))], "media_id long, payload binary"
    )
    rows = {r["media_id"]: r for r in image_signal_features(df).collect()}
    assert (rows[1]["width"], rows[1]["channels"], rows[1]["mean_px"]) == (8, 3, 40.0)
    assert (rows[2]["width"], rows[2]["mean_px"]) == (4, 200.0)


def test_native_dispatch_plumbing_without_pil(monkeypatch):
    """The PIL auto-dispatch must be a pure no-op in this container (PIL
    absent): policy resolves to pure-python, native=True degrades to the
    pure-python chain per payload, and the env kill-switch wins."""
    import numpy as np

    from seaexplorertools_spark.operators import multimodal as mm
    from seaexplorertools_spark.operators.jpegcodec import encode_jpeg

    assert mm._pil_image() is None  # container contract: no PIL here
    assert mm._native_codecs_enabled() is False
    monkeypatch.setenv("SPARK_GRAFT_NATIVE_CODECS", "off")
    assert mm._native_codecs_enabled() is False

    img = np.full((16, 16), 90, np.uint8)
    jp = encode_jpeg(16, 16, img.tobytes())
    for native in (None, True, False):
        assert mm._decode_image_pixels(jp, native=native) == (
            16, 16, 1, img.tobytes()
        )


def test_pil_identity_against_pure_python_chain():
    """When PIL IS importable (real deployments), its normalized decode
    must equal the pure-python oracle authority: byte-exact for the
    lossless formats (PNG gray/RGB/RGBA/palette, GIF frame 0, BMP), and
    within ±1/px for JPEG (T.81 only bounds IDCT accuracy — libjpeg's
    integer IDCT may differ from the exact float IDCT by one level)."""
    import numpy as np
    import pytest as _pytest

    from seaexplorertools_spark.operators import multimodal as mm
    from seaexplorertools_spark.operators.jpegcodec import encode_jpeg

    if mm._pil_image() is None:
        _pytest.skip("PIL not installed in this container")

    rng = np.random.default_rng(31)
    fixtures = []
    gray = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    rgb = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    rgba = rng.integers(0, 256, (12, 20, 4), dtype=np.uint8)
    fixtures.append(("png-gray", mm.encode_png(40, 24, gray.tobytes(), channels=1), 0))
    fixtures.append(("png-rgb", mm.encode_png(24, 16, rgb.tobytes()), 0))
    fixtures.append(("png-rgba", mm.encode_png(20, 12, rgba.tobytes(), channels=4), 0))
    gif, _ = _build_gif()
    fixtures.append(("gif", gif, 0))
    fixtures.append(("jpeg-gray", encode_jpeg(40, 24, gray.tobytes()), 1))
    fixtures.append(("jpeg-rgb", encode_jpeg(24, 16, rgb.tobytes(), channels=3), 1))

    for name, payload, tol in fixtures:
        pure = mm._decode_image_pixels(payload, native=False)
        nat = mm._decode_image_pixels_native(payload)
        assert nat is not None, name
        assert nat[:3] == pure[:3], name  # dims + channel convention
        a = np.frombuffer(nat[3], np.uint8).astype(np.int16)
        b = np.frombuffer(pure[3], np.uint8).astype(np.int16)
        assert a.shape == b.shape, name
        assert int(np.abs(a - b).max(initial=0)) <= tol, name


def test_dhash_brightness_invariance_vs_ahash(spark):
    """dHash's selling point: a global brightness shift flips aHash
    groups apart but keeps dHash groups together (gradient signs
    survive +k). Also: cross-container PNG == JPEG dhash equality."""
    import numpy as np

    from seaexplorertools_spark.operators.jpegcodec import encode_jpeg
    from seaexplorertools_spark.operators.multimodal import (
        ahash_images,
        dhash_images,
        encode_png,
    )

    rng = np.random.default_rng(51)
    base = rng.integers(40, 120, (32, 32), dtype=np.uint8)
    brighter = (base + 80).astype(np.uint8)  # no wrap: max 199
    rows = [
        (1, bytearray(encode_jpeg(32, 32, base.tobytes()))),
        (2, bytearray(encode_jpeg(32, 32, brighter.tobytes()))),
        (3, bytearray(encode_png(32, 32, np.repeat(base[:, :, None], 3, 2).tobytes()))),
        (4, bytearray(b"junk")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    dh = {r["media_id"]: r["dhash"] for r in dhash_images(df).collect()}
    ah = {r["media_id"]: r["ahash"] for r in ahash_images(df).collect()}
    # JPEG is lossy (±1/px) but gradients of a +80 shift survive decode
    assert dh[1] == dh[2]  # brightness-shifted duplicate found
    assert dh[4] is None
    # PNG of the SAME gray pixels: identical luma → identical dhash
    assert dh[3] == dh[1]
    # aHash groups the identical-pixel pair too (sanity), and both
    # hashes are 16 hex chars
    assert ah[3] == ah[1] and len(dh[1]) == 16
