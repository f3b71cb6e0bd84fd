"""AIFF codec: encode↔decode roundtrips (8/16/24-bit, mono/stereo),
80-bit extended-float rate field, sniff-chain integration (no WAV/FLAC
collision), truncation/rejection hardening, and the Spark audio lane."""

from __future__ import annotations

import numpy as np
import pytest

from seaexplorertools_spark.operators.aiff import (
    _f80_decode,
    _f80_encode,
    decode_aiff_samples,
    encode_aiff,
    parse_aiff_header,
)


@pytest.mark.parametrize("bits", [8, 16, 24])
@pytest.mark.parametrize("ch", [1, 2])
def test_roundtrip(bits, ch):
    rng = np.random.default_rng(bits + ch)
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    arr = rng.integers(lo, hi + 1, (321, ch), dtype=np.int64)
    payload = encode_aiff(44100, arr, bits=bits)
    rate, channels, out = decode_aiff_samples(payload)
    assert (rate, channels) == (44100, ch)
    assert np.array_equal(out, arr)


@pytest.mark.parametrize("rate", [8000, 11025, 22050, 44100, 48000, 96000])
def test_extended_float_rates(rate):
    assert _f80_decode(_f80_encode(float(rate))) == float(rate)
    payload = encode_aiff(rate, np.zeros(4, dtype=np.int64))
    assert parse_aiff_header(payload)[0] == rate


def test_header_fields():
    payload = encode_aiff(22050, np.zeros((100, 2), dtype=np.int64), bits=16)
    rate, ch, bits, nf, dur = parse_aiff_header(payload)
    assert (rate, ch, bits, nf) == (22050, 2, 16, 100)
    assert dur == 100 * 1000 // 22050


def test_sniff_no_collision():
    """AIFF payloads are not claimed by the WAV/FLAC decoders and
    vice versa."""
    from seaexplorertools_spark.operators.flaccodec import (
        decode_flac_samples,
        encode_flac,
    )
    from seaexplorertools_spark.operators.multimodal import decode_wav_samples

    aiff = encode_aiff(8000, np.arange(32, dtype=np.int64))
    with pytest.raises(ValueError):
        decode_wav_samples(aiff)
    with pytest.raises(ValueError):
        decode_flac_samples(aiff)
    flac = encode_flac(8000, np.arange(32, dtype=np.int64)[:, None])
    assert parse_aiff_header(flac) is None
    with pytest.raises(ValueError):
        decode_aiff_samples(flac)


def test_rejections_and_truncation():
    assert parse_aiff_header(None) is None
    assert parse_aiff_header(b"") is None
    assert parse_aiff_header(b"FORM\x00\x00\x00\x04WAVE") is None
    good = encode_aiff(8000, np.arange(64, dtype=np.int64))
    # truncating inside SSND clamps frame count instead of failing
    rate, ch, out = decode_aiff_samples(good)
    assert len(out) == 64
    cut = good[: len(good) - 20]
    # the chunk walk stops at the truncated SSND; COMM already parsed →
    # decode degrades to ValueError (no SSND span) rather than garbage
    with pytest.raises(ValueError):
        decode_aiff_samples(cut)
    # non-audio FORM type
    with pytest.raises(ValueError):
        decode_aiff_samples(b"FORM" + (4).to_bytes(4, "big") + b"AIFC")


def test_ssnd_offset_field():
    """A nonzero SSND offset shifts the sample data start."""
    payload = bytearray(encode_aiff(8000, np.array([100, -100, 50], dtype=np.int64)))
    i = payload.find(b"SSND")
    size = int.from_bytes(payload[i + 4 : i + 8], "big")
    body = payload[i + 8 : i + 8 + size]
    new_body = (4).to_bytes(4, "big") + body[4:8] + b"\x00\x00\x00\x00" + body[8:]
    rebuilt = (
        bytes(payload[:i])
        + b"SSND"
        + len(new_body).to_bytes(4, "big")
        + bytes(new_body)
    )
    rebuilt = (
        rebuilt[:4]
        + (len(rebuilt) - 8).to_bytes(4, "big")
        + rebuilt[8:]
    )
    rate, ch, out = decode_aiff_samples(rebuilt)
    assert out[:, 0].tolist() == [100, -100, 50]


def test_spark_audio_lane(spark):
    """documents_as_aiff → wav_signal_features and extract_audio_features
    on a mixed batch (AIFF + garbage + NULL): per-row degrade, exact
    closed-form features for a known id."""
    import pandas as pd

    from seaexplorertools_spark.operators.multimodal import (
        documents_as_aiff,
        extract_audio_features,
        wav_signal_features,
    )

    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    sig = {r["media_id"]: r for r in wav_signal_features(documents_as_aiff(docs)).collect()}
    for did, r in sig.items():
        n = 64 + did % 64
        a, b = did % 1000 - 500, did % 7 - 3
        v = a + b * np.arange(n)
        assert r["sample_rate"] == 8000 + (did % 8) * 1000
        assert r["n_frames"] == n
        assert r["peak"] == float(np.max(np.abs(v)))
        assert r["rms"] == pytest.approx(float(np.sqrt(np.mean(v.astype(float) ** 2))), abs=0)
    meta = {r["media_id"]: r for r in extract_audio_features(documents_as_aiff(docs)).collect()}
    for did, r in meta.items():
        n = 64 + did % 64
        assert r["n_bytes"] == 54 + 2 * n
        assert (r["bits"], r["channels"], r["n_frames"]) == (16, 1, n)
    # mixed batch with undecodable payloads degrades per-row
    mixed = spark.createDataFrame(
        pd.DataFrame({"media_id": [1, 2], "payload": [b"garbage", None]})
    )
    rows = wav_signal_features(mixed).collect()
    assert all(r["rms"] is None for r in rows) and len(rows) == 2
