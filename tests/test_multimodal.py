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
    assert decode_real(png, "image") == {"width": 37, "height": 21}
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
