"""Baseline TIFF codec: encoder↔decoder roundtrips across byte order ×
compression × strip layout × channel count, PackBits packet-level cases,
photometric-0 inversion, rejection hardening, chain integration
(_decode_image_pixels sniff), and the Spark image-signal lane."""

from __future__ import annotations

import numpy as np
import pytest

from seaexplorertools_spark.operators.tiffcodec import (
    _unpackbits,
    decode_tiff_pixels,
    encode_tiff,
)


def _rand(w, h, ch, seed=0):
    rng = np.random.default_rng(seed)
    return bytes(rng.integers(0, 256, w * h * ch, dtype=np.uint8))


@pytest.mark.parametrize("ch", [1, 3])
@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("packbits", [False, True])
@pytest.mark.parametrize("rps", [None, 3])
def test_roundtrip_matrix(ch, big_endian, packbits, rps):
    w, h = 13, 9
    px = _rand(w, h, ch, seed=ch + 2 * big_endian + 4 * packbits)
    payload = encode_tiff(
        w, h, px, ch, big_endian=big_endian, packbits=packbits, rows_per_strip=rps
    )
    assert decode_tiff_pixels(payload) == (w, h, ch, px)


def test_packbits_run_compression_wins_on_flat_rows():
    # constant image: replicate packets should beat the raw size
    w, h = 64, 32
    px = bytes([77]) * (w * h)
    flat = encode_tiff(w, h, px, 1, packbits=True)
    raw = encode_tiff(w, h, px, 1, packbits=False)
    assert len(flat) < len(raw)
    assert decode_tiff_pixels(flat) == (w, h, 1, px)


def test_unpackbits_packets():
    # literal(3 bytes) + replicate(4×9) + noop(128) + literal(1)
    data = bytes([2, 1, 2, 3]) + bytes([253, 9]) + bytes([128]) + bytes([0, 5])
    assert _unpackbits(data, 8) == bytes([1, 2, 3, 9, 9, 9, 9, 5])
    with pytest.raises(ValueError):
        _unpackbits(bytes([5, 1, 2]), 6)  # literal overruns strip
    with pytest.raises(ValueError):
        _unpackbits(bytes([200]), 3)  # run missing its value byte
    with pytest.raises(ValueError):
        _unpackbits(bytes([0, 7]), 3)  # short output


def test_photometric_zero_inverts():
    px = bytes([0, 100, 255, 10])
    payload = encode_tiff(4, 1, px, 1, photometric=0)
    w, h, ch, out = decode_tiff_pixels(payload)
    assert (w, h, ch) == (4, 1, 1)
    assert out == bytes(255 - v for v in px)


def test_rejections():
    good = encode_tiff(4, 4, _rand(4, 4, 1), 1)
    cases = [
        b"",                       # empty
        b"II*\x00",                # header only
        b"XX*\x00" + good[4:],     # bad magic
        good[:20],                 # truncated IFD
    ]
    for payload in cases:
        with pytest.raises(ValueError):
            decode_tiff_pixels(payload)
    # IFD offset out of range
    bad = bytearray(good)
    bad[4:8] = (len(good) + 50).to_bytes(4, "little")
    with pytest.raises(ValueError):
        decode_tiff_pixels(bytes(bad))


def test_reject_16bit_and_bad_strip():
    # hand-build a 16-bit BitsPerSample variant by patching the encoder
    # output: find the 258 entry and bump its inline value
    payload = bytearray(encode_tiff(4, 2, _rand(4, 2, 1), 1))
    n = int.from_bytes(payload[8:10], "little")
    for k in range(n):
        e = 10 + 12 * k
        if int.from_bytes(payload[e : e + 2], "little") == 258:
            payload[e + 8 : e + 10] = (16).to_bytes(2, "little")
    with pytest.raises(ValueError):
        decode_tiff_pixels(bytes(payload))
    # strip offset pointing outside the payload
    payload = bytearray(encode_tiff(4, 2, _rand(4, 2, 1), 1))
    n = int.from_bytes(payload[8:10], "little")
    for k in range(n):
        e = 10 + 12 * k
        if int.from_bytes(payload[e : e + 2], "little") == 273:
            payload[e + 8 : e + 12] = (len(payload) + 9).to_bytes(4, "little")
    with pytest.raises(ValueError):
        decode_tiff_pixels(bytes(payload))


def test_decode_cap():
    # width*height over the 64 MP cap must refuse before allocating
    payload = bytearray(encode_tiff(8, 8, _rand(8, 8, 1), 1))
    n = int.from_bytes(payload[8:10], "little")
    for k in range(n):
        e = 10 + 12 * k
        if int.from_bytes(payload[e : e + 2], "little") in (256, 257):
            payload[e + 8 : e + 12] = (100_000).to_bytes(4, "little")
    with pytest.raises(ValueError):
        decode_tiff_pixels(bytes(payload))


def test_chain_dispatch():
    """_decode_image_pixels picks the TIFF codec and no other codec
    claims a TIFF payload (and vice versa)."""
    from seaexplorertools_spark.operators.multimodal import (
        _decode_image_pixels,
        encode_bmp,
        encode_png,
    )

    w, h = 6, 5
    px = _rand(w, h, 3, seed=7)
    tiff = encode_tiff(w, h, px, 3, big_endian=True)
    assert _decode_image_pixels(tiff, native=False) == (w, h, 3, px)
    # PNG/BMP payloads still route to their own codecs
    png = encode_png(2, 2, bytes(range(12)))
    assert _decode_image_pixels(png, native=False)[0:2] == (2, 2)
    bmp = encode_bmp(2, 2, bytes(range(12)))
    assert _decode_image_pixels(bmp, native=False)[0:2] == (2, 2)
    with pytest.raises(ValueError):
        decode_tiff_pixels(png)


def test_spark_lane(spark):
    """documents_as_tiff → image_signal_features end-to-end on a mixed
    batch, closed-form stats for a known doc_id."""
    from seaexplorertools_spark.operators.multimodal import (
        documents_as_tiff,
        image_signal_features,
    )

    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    out = image_signal_features(documents_as_tiff(docs), native=False)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 12
    for did, r in rows.items():
        w = 8 + did % 9
        h = 5 + did % 7
        ch = 1 if did % 2 == 0 else 3
        a, b = did % 200, did % 4
        assert (r["width"], r["height"], r["channels"]) == (w, h, ch)
        assert r["min_px"] == a
        assert r["max_px"] == a + b * (h - 1) + ch - 1
        assert r["mean_px"] == a + b * (h - 1) / 2.0 + (ch - 1) / 2.0
