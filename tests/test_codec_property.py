"""Property-based codec tests — no Spark session needed (pure python
surfaces), so these are cheap to run in volume.

- JPEG: for ARBITRARY dims and pixels, decode(encode(img)) stays within
  1 LSB at unit quantization (gray; the only residual error is the one
  rint in FDCT quantize + one in the output clip), for every
  (subsample, restart) combination the encoder can produce.
- MP4/AVI: for ARBITRARY frame counts and sizes, the walkers return
  spans that slice back the exact planted payloads in order.
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from seaexplorertools_spark.operators.jpegcodec import (
    decode_jpeg_pixels,
    encode_jpeg,
)
from seaexplorertools_spark.operators.videocontainers import (
    encode_avi,
    encode_mp4,
    parse_avi_frames,
    parse_mp4_frames,
)

COMMON = dict(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))


@settings(**COMMON)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    restart=st.sampled_from([0, 1, 3]),
)
def test_jpeg_gray_roundtrip_within_one_lsb(w, h, seed, restart):
    img = np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)
    jp = encode_jpeg(w, h, img.tobytes(), channels=1, restart_interval=restart)
    dw, dh, ch, px = decode_jpeg_pixels(jp)
    assert (dw, dh, ch) == (w, h, 1)
    got = np.frombuffer(px, np.uint8).reshape(h, w)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 1


@settings(**COMMON)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    sub=st.sampled_from(["444", "420"]),
)
def test_jpeg_flat_color_roundtrip(w, h, seed, sub):
    """Flat color survives any dims/subsampling within the two BT.601
    rounding steps (chroma box-average of a flat plane is the same flat
    plane, padding replicates edges — still flat blocks)."""
    rgb = np.random.default_rng(seed).integers(0, 256, 3)
    img = np.full((h, w, 3), rgb, dtype=np.uint8)
    jp = encode_jpeg(w, h, img.tobytes(), channels=3, subsample=sub)
    dw, dh, ch, px = decode_jpeg_pixels(jp)
    assert (dw, dh, ch) == (w, h, 3)
    got = np.frombuffer(px, np.uint8).reshape(h, w, 3)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 2


@st.composite
def frame_lists(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    return [
        bytes(draw(st.binary(min_size=1, max_size=60)))
        for _ in range(n)
    ]


@settings(**COMMON)
@given(frames=frame_lists())
def test_mp4_walker_roundtrips_any_frame_list(frames):
    mp4 = encode_mp4(frames)
    got = parse_mp4_frames(mp4)
    assert [mp4[f["start"] : f["end"]] for f in got] == frames
    assert [f["size"] for f in got] == [len(x) for x in frames]


@settings(**COMMON)
@given(frames=frame_lists(), us=st.integers(min_value=1000, max_value=100000))
def test_avi_walker_roundtrips_any_frame_list(frames, us):
    avi = encode_avi(frames, us_per_frame=us)
    got = parse_avi_frames(avi)
    assert [avi[f["start"] : f["end"]] for f in got] == frames
    assert [f["time_ms"] for f in got] == [(i * us) // 1000 for i in range(len(frames))]


@settings(**COMMON)
@given(
    w=st.integers(min_value=1, max_value=32),
    h=st.integers(min_value=1, max_value=32),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    coarse=st.booleans(),
)
def test_progressive_equals_sequential_property(w, h, seed, coarse):
    """For ANY dims/pixels/quant, the progressive decode equals the
    sequential decode bit-for-bit (lossless coefficient reorganization)."""
    from seaexplorertools_spark.operators.jpegcodec import encode_jpeg_progressive

    img = np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)
    q = None
    if coarse:
        q = np.full((8, 8), 20.0)
        q[0, 0] = 8
    seq = decode_jpeg_pixels(encode_jpeg(w, h, img.tobytes(), channels=1, quant=q))
    pro = decode_jpeg_pixels(
        encode_jpeg_progressive(w, h, img.tobytes(), channels=1, quant=q)
    )
    assert pro == seq
