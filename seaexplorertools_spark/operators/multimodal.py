"""Multimodal-column plumbing (engine additions).

Images/audio/video are opaque ``binary`` payloads with typed metadata
columns. The Spark-side plumbing — schema, partition-preserving
``mapInPandas`` with Arrow batches, deterministic batch shapes — is real
and tested; the actual media decode is STUBBED (the decode libraries are
not in this container): ``decode_stub`` computes deterministic fake
features from the bytes so the pipeline shape can be exercised end-to-end,
and ``decode_real`` raises NotImplementedError where a PIL/ffmpeg call
would go.

At 100 TB: payloads stay in the executor (never collected); mapInPandas
streams Arrow record batches so peak memory is one batch of payloads;
feature extraction is embarrassingly parallel with zero shuffle.
"""

from __future__ import annotations

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
    ]
)


def decode_real(payload: bytes, kind: str):
    """Placeholder for the real decoder (PIL / soundfile / ffmpeg)."""
    raise NotImplementedError(
        "media decode libraries are not available in this container; "
        "use decode_stub for pipeline testing"
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
    partition-preserving, no shuffle.

    The decode step is a NESTED def (same logic as ``decode_stub``) so
    cloudpickle ships it by value — Spark python workers don't inherit the
    driver's sys.path, and a by-reference pickle of this module's functions
    would fail to import on workers when the engine runs from a
    non-PYTHONPATH checkout."""

    def decode(payload: bytes) -> tuple[int, float, float]:
        if payload is None or len(payload) == 0:
            return 0, float("nan"), float("nan")
        n = len(payload)
        return n, sum(payload) / n, len(set(payload)) / 256.0

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                n, mean, ent = decode(payload)
                rows.append((mid, kind, n, mean, ent))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "n_bytes", "byte_mean", "byte_entropy_proxy"]
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


def resize_images(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Image resize plumbing (decode/encode STUBBED): real code would
    PIL-decode, resize, re-encode; the stub deterministically truncates/pads
    the payload to width*height bytes so batch shapes, schema and
    partition-preservation are exercised end-to-end."""
    target = width * height

    def do_resize(batches):
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if payload is None:
                    out.append((mid, kind, None, None, None))
                    continue
                b = bytes(payload)
                resized = (b * (target // max(len(b), 1) + 1))[:target]
                out.append((mid, kind, resized, width, height))
            yield pd.DataFrame(out, columns=["media_id", "kind", "payload", "width", "height"])

    return media.select("media_id", "kind", "payload").mapInPandas(do_resize, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame sampling plumbing (decode STUBBED): real code would
    ffmpeg-seek; the stub slices the payload into n_frames even chunks —
    one output row per (media, frame), the explode-shaped schema a training
    pipeline feeds to per-frame feature extraction."""

    def do_sample(batches):
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    continue
                b = bytes(payload)
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    out.append((mid, i, b[i * step : (i + 1) * step]))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame_payload"])

    return media.select("media_id", "payload").mapInPandas(do_sample, FRAME_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as fake media payloads so the
    multimodal plumbing can be exercised against the synthetic tables."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
        F.lit(None).cast("long").alias("sample_rate"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
