"""ICO codec: DIB and PNG entry round-trips, largest-entry pick,
BGRA swizzle + bottom-up flip, hostile degrade, chain dispatch, and
the Spark image lane."""

from __future__ import annotations

import numpy as np
import pytest

from seaexplorertools_spark.operators.icocodec import (
    decode_ico_pixels,
    encode_ico,
)


def _rgba(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return bytes(rng.integers(0, 256, w * h * 4, dtype=np.uint8))


def test_dib_roundtrip_swizzle_and_flip():
    w, h = 7, 5
    rgba = _rgba(w, h)
    assert decode_ico_pixels(encode_ico([(w, h, rgba)])) == (w, h, 4, rgba)


def test_png_entry_routes_through_png_codec():
    w, h = 6, 4
    rgba = _rgba(w, h, seed=1)
    w2, h2, ch, px = decode_ico_pixels(encode_ico([(w, h, rgba)], png=True))
    assert (w2, h2, ch) == (w, h, 3)
    assert px == bytes(v for i, v in enumerate(rgba) if i % 4 != 3)


def test_largest_entry_wins_regardless_of_order():
    big = _rgba(9, 8, seed=2)
    small = _rgba(2, 2, seed=3)
    for order in ([(2, 2, small), (9, 8, big)], [(9, 8, big), (2, 2, small)]):
        assert decode_ico_pixels(encode_ico(order)) == (9, 8, 4, big)


def test_hostile():
    for bad in (b"", b"\x00\x00\x01\x00", b"\x00\x00\x02\x00\x01\x00",
                b"\x01\x00\x01\x00\x01\x00" + b"\x00" * 32):
        with pytest.raises(ValueError):
            decode_ico_pixels(bad)
    # entry pointing outside the payload
    good = bytearray(encode_ico([(2, 2, _rgba(2, 2))]))
    good[18:22] = (len(good) + 10).to_bytes(4, "little")  # entry offset
    with pytest.raises(ValueError):
        decode_ico_pixels(bytes(good))


def test_chain_dispatch():
    from seaexplorertools_spark.operators.multimodal import _decode_image_pixels

    w, h = 5, 4
    rgba = _rgba(w, h, seed=4)
    assert _decode_image_pixels(encode_ico([(w, h, rgba)]), native=False) == (
        w, h, 4, rgba,
    )


def test_spark_lane(spark):
    from seaexplorertools_spark.operators.icocodec import documents_as_ico
    from seaexplorertools_spark.operators.multimodal import image_signal_features

    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    rows = {r["media_id"]: r for r in
            image_signal_features(documents_as_ico(docs), native=False).collect()}
    for did, r in rows.items():
        w, h = 4 + did % 9, 3 + did % 7
        ch = 4 if did % 2 == 0 else 3
        a, b = did % 180, did % 3
        assert (r["width"], r["height"], r["channels"]) == (w, h, ch)
        assert r["min_px"] == a
        assert r["max_px"] == a + b * (h - 1) + ch - 1
        assert r["mean_px"] == a + b * (h - 1) / 2.0 + (ch - 1) / 2.0
