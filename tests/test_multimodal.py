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
