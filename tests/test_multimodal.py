"""Multimodal plumbing shapes: feature extraction, resize, frame sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from seaexplorertools_spark.operators.multimodal import (
    documents_as_media,
    extract_features,
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
