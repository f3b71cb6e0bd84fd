"""Baseline JPEG codec (operators/jpegcodec.py) — roundtrips against
hand-assembled JPEGs from the minimal spec-valid encoder, exactness on
flat blocks (the property mm_image_features' exact oracle relies on),
restart markers, subsampling, and loud rejection of unsupported streams.
No PIL/libjpeg in this container, so the encoder IS the fixture
generator — it shares only the public T.81 constants (zigzag, DCT
matrix) with the decoder, and every entropy bit it writes is re-derived
by the decoder's independent Huffman walk."""

from __future__ import annotations

import numpy as np
import pytest

from seaexplorertools_spark.operators.jpegcodec import (
    decode_jpeg_pixels,
    encode_jpeg,
)


def _roundtrip(img: np.ndarray, **kw):
    if img.ndim == 2:
        h, w = img.shape
        jp = encode_jpeg(w, h, img.tobytes(), channels=1, **kw)
    else:
        h, w, _ = img.shape
        jp = encode_jpeg(w, h, img.tobytes(), channels=3, **kw)
    dw, dh, ch, px = decode_jpeg_pixels(jp)
    assert (dw, dh) == (w, h)
    got = np.frombuffer(px, np.uint8)
    return got.reshape(h, w) if ch == 1 else got.reshape(h, w, ch)


def test_flat_gray_is_exact():
    """Flat 8×8 blocks with unit quantization survive DCT→quant→IDCT
    bit-exactly: DC = 8·(v-128) is exact in float64, every AC rounds
    to 0."""
    for v in (0, 1, 127, 128, 200, 255):
        img = np.full((16, 24), v, np.uint8)
        assert np.array_equal(_roundtrip(img), img), v


def test_two_tone_gray_is_exact():
    img = np.zeros((16, 32), np.uint8)
    img[:, :16] = 50
    img[:, 16:] = 180
    assert np.array_equal(_roundtrip(img), img)


def test_random_gray_within_unit_quant_error():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    err = np.abs(_roundtrip(img).astype(int) - img.astype(int)).max()
    assert err <= 1, err


def test_rgb_444_roundtrip():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    err = np.abs(_roundtrip(img).astype(int) - img.astype(int)).max()
    # unit quant: only the two BT.601 color-transform roundings remain
    assert err <= 4, err


def test_rgb_420_flat_color():
    img = np.full((16, 16, 3), (90, 140, 40), np.uint8)
    err = np.abs(_roundtrip(img, subsample="420").astype(int) - img.astype(int)).max()
    assert err <= 2, err  # box-averaged flat chroma is still flat


def test_non_multiple_of_8_dimensions():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (13, 21), dtype=np.uint8)
    err = np.abs(_roundtrip(img).astype(int) - img.astype(int)).max()
    assert err <= 1, err


def test_restart_markers():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    h, w = img.shape
    jp = encode_jpeg(w, h, img.tobytes(), channels=1, restart_interval=4)
    assert b"\xff\xdd" in jp  # DRI segment present
    assert any(bytes([0xFF, 0xD0 + k]) in jp for k in range(8))  # RSTn used
    err = np.abs(_roundtrip(img, restart_interval=4).astype(int) - img.astype(int)).max()
    assert err <= 1, err


def test_coarse_quantization_still_decodes():
    q = np.full((8, 8), 16.0)
    q[0, 0] = 8
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    got = _roundtrip(img, quant=q)
    # lossy but bounded: error within ~half the largest quant step × DCT gain
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 64


def test_rejects_unsupported_and_garbage():
    with pytest.raises(ValueError, match="lossless|baseline"):
        decode_jpeg_pixels(b"\xff\xd8\xff\xc3\x00\x05aaa")  # SOF3 lossless
    with pytest.raises(ValueError):
        decode_jpeg_pixels(b"not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg_pixels(None)
    with pytest.raises(ValueError):
        decode_jpeg_pixels(b"\xff\xd8\xff\xd9")  # SOI+EOI, no scan
    # truncated mid-entropy: valid headers, cut stream
    img = np.full((16, 16), 90, np.uint8)
    jp = encode_jpeg(16, 16, img.tobytes())
    with pytest.raises(ValueError):
        decode_jpeg_pixels(jp[: len(jp) // 2])


def test_dimensions_match_header_parse():
    """The independent header walker (parse_image_header) agrees with the
    full decode on dimensions."""
    from seaexplorertools_spark.operators.multimodal import parse_image_header

    img = np.zeros((40, 56), np.uint8)
    jp = encode_jpeg(56, 40, img.tobytes())
    assert parse_image_header(jp) == (56, 40)


def test_corrupt_sof_dimensions_fail_cheaply():
    """A 400-byte payload claiming 30000x30000 must raise ValueError from
    the size guards BEFORE any plane allocation (per-row degrade contract
    — previously a job-killing MemoryError)."""
    import numpy as np

    img = np.full((8, 8), 70, np.uint8)
    jp = bytearray(encode_jpeg(8, 8, img.tobytes()))
    i = jp.index(bytes([0xFF, 0xC0]))  # SOF0 marker
    jp[i + 5 : i + 7] = (30000).to_bytes(2, "big")  # height
    jp[i + 7 : i + 9] = (30000).to_bytes(2, "big")  # width
    with pytest.raises(ValueError, match="inconsistent with entropy|too large"):
        decode_jpeg_pixels(bytes(jp))


def test_progressive_decodes_identically_to_sequential():
    """Progressive transmission is a LOSSLESS reorganization of the same
    quantized coefficients, so the progressive decode must equal the
    sequential decode bit-for-bit — across gray / 4:4:4 / 4:2:0, odd
    dims, and a coarse quant table (zero-heavy bands drive multi-block
    EOB runs and ZRLs through the AC-first and AC-refine paths)."""
    import numpy as np

    from seaexplorertools_spark.operators.jpegcodec import encode_jpeg_progressive

    rng = np.random.default_rng(11)
    coarse = np.full((8, 8), 24.0)
    coarse[0, 0] = 8
    cases = [
        (rng.integers(0, 256, (24, 40), dtype=np.uint8), dict(channels=1)),
        (rng.integers(0, 256, (13, 21), dtype=np.uint8), dict(channels=1)),
        (np.full((16, 16), 77, np.uint8), dict(channels=1)),  # flat = exact
        (rng.integers(0, 256, (16, 24, 3), dtype=np.uint8), dict(channels=3)),
        (rng.integers(0, 256, (18, 26, 3), dtype=np.uint8), dict(channels=3, subsample="420")),
        (rng.integers(0, 256, (32, 48), dtype=np.uint8), dict(channels=1, quant=coarse)),
        ((rng.integers(0, 2, (40, 64)) * 255).astype(np.uint8), dict(channels=1, quant=coarse)),
    ]
    for img, kw in cases:
        h, w = img.shape[:2]
        seq = decode_jpeg_pixels(encode_jpeg(w, h, img.tobytes(), **kw))
        pro = decode_jpeg_pixels(encode_jpeg_progressive(w, h, img.tobytes(), **kw))
        assert pro == seq, (img.shape, kw)


def test_progressive_flat_is_exact():
    import numpy as np

    from seaexplorertools_spark.operators.jpegcodec import encode_jpeg_progressive

    img = np.zeros((16, 32), np.uint8)
    img[:, :16] = 50
    img[:, 16:] = 180
    w, h, ch, px = decode_jpeg_pixels(encode_jpeg_progressive(32, 16, img.tobytes()))
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(16, 32), img)


def test_progressive_flat_large_images_decode():
    """T.81 G.1.2.2: one AC EOB-run symbol (~2 bytes) legally covers up
    to 32767 blocks, so a big flat image codes far more units than
    8*entropy_bytes. The per-bit structural bound only holds for DC
    scans; AC scans must accept these (round-6 ADVICE regression)."""
    import numpy as np

    from seaexplorertools_spark.operators.jpegcodec import encode_jpeg_progressive

    for n in (96, 256):
        img = np.full((n, n), 128, np.uint8)
        w, h, ch, px = decode_jpeg_pixels(
            encode_jpeg_progressive(n, n, img.tobytes())
        )
        assert (w, h, ch) == (n, n, 1)
        assert np.array_equal(np.frombuffer(px, np.uint8).reshape(n, n), img)
    # flat color 4:2:0 too — interleaved DC + 6 AC scans, all EOB-run heavy
    img = np.full((120, 120, 3), 200, np.uint8)
    seq = decode_jpeg_pixels(encode_jpeg(120, 120, img.tobytes(), channels=3, subsample="420"))
    pro = decode_jpeg_pixels(
        encode_jpeg_progressive(120, 120, img.tobytes(), channels=3, subsample="420")
    )
    assert pro == seq


def test_progressive_rejections():
    import numpy as np

    from seaexplorertools_spark.operators.jpegcodec import encode_jpeg_progressive

    img = np.full((16, 16), 90, np.uint8)
    jp = encode_jpeg_progressive(16, 16, img.tobytes())
    with pytest.raises(ValueError):
        decode_jpeg_pixels(jp[: len(jp) // 2])  # truncated mid-scan
    # corrupt SOF dims under progressive: same cheap structural guard
    jp = bytearray(jp)
    i = jp.index(bytes([0xFF, 0xC2]))
    jp[i + 5 : i + 7] = (30000).to_bytes(2, "big")
    jp[i + 7 : i + 9] = (30000).to_bytes(2, "big")
    with pytest.raises(ValueError, match="inconsistent with entropy|too large"):
        decode_jpeg_pixels(bytes(jp))
