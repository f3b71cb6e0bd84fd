"""MP4/AVI container walkers (operators/videocontainers.py) against
hand-assembled fixtures from the module's own minimal writers — frame
spans are verified by slicing the DISTINCT payload planted in each
frame, so an off-by-one anywhere in the box/chunk walk fails loudly."""

from __future__ import annotations

import pytest

from seaexplorertools_spark.operators.videocontainers import (
    encode_avi,
    encode_mp4,
    parse_avi_frames,
    parse_mp4_frames,
)

FRAMES = [bytes([i]) * (10 + 3 * i) for i in range(7)]  # distinct content+size


def test_mp4_frame_spans_and_metadata():
    mp4 = encode_mp4(FRAMES, timescale=1000, delta=40, width=64, height=48)
    got = parse_mp4_frames(mp4)
    assert len(got) == len(FRAMES)
    for i, fr in enumerate(got):
        assert mp4[fr["start"] : fr["end"]] == FRAMES[i], i
        assert fr["size"] == len(FRAMES[i])
        assert fr["time_ms"] == i * 40  # delta 40 @ timescale 1000
        assert fr["keyframe"] is True  # no stss ⇒ all sync per spec
        assert (fr["width"], fr["height"]) == (64, 48)


def test_mp4_keyframe_table():
    mp4 = encode_mp4(FRAMES, keyframes={1, 4})
    got = parse_mp4_frames(mp4)
    assert [fr["keyframe"] for fr in got] == [True, False, False, True, False, False, False]


def test_mp4_odd_frame_count_exercises_stsc_runs():
    frames = FRAMES[:5]  # 2+2+1 chunks → two stsc runs
    got = parse_mp4_frames(encode_mp4(frames))
    assert [encode_mp4(frames)[f["start"]:f["end"]] for f in got] == frames


def test_mp4_rejections():
    with pytest.raises(ValueError):
        parse_mp4_frames(b"not an mp4 at all...")
    with pytest.raises(ValueError):
        parse_mp4_frames(None)
    mp4 = encode_mp4(FRAMES)
    with pytest.raises(ValueError):
        parse_mp4_frames(mp4[: len(mp4) // 2])  # truncated box walk
    # mdat shorter than the sample tables claim → span check fires
    cut = mp4.replace(FRAMES[6], b"\x00", 1)
    with pytest.raises(ValueError):
        parse_mp4_frames(cut)


def test_avi_frame_spans_and_metadata():
    avi = encode_avi(FRAMES, us_per_frame=33333, width=32, height=24)
    got = parse_avi_frames(avi)
    assert len(got) == len(FRAMES)
    for i, fr in enumerate(got):
        assert avi[fr["start"] : fr["end"]] == FRAMES[i], i
        assert fr["time_ms"] == (i * 33333) // 1000
        assert (fr["width"], fr["height"]) == (32, 24)


def test_avi_word_alignment():
    # odd-sized frames force pad bytes between chunks; spans must skip them
    frames = [b"x" * 3, b"y" * 5, b"z" * 4]
    avi = encode_avi(frames)
    got = parse_avi_frames(avi)
    assert [avi[f["start"]:f["end"]] for f in got] == frames


def test_avi_multiple_movi_lists_monotonic_time():
    """RIFF/AVIX extended files legally carry several movi LISTs; frame
    indices (and so time_ms) must accumulate across them, not restart
    at 0 per LIST (round-6 ADVICE regression)."""
    def chunk(cid, body):
        return cid + len(body).to_bytes(4, "little") + body + (b"\x00" if len(body) & 1 else b"")

    one = encode_avi(FRAMES, us_per_frame=40000)
    movi2 = chunk(b"LIST", b"movi" + b"".join(chunk(b"00dc", f) for f in FRAMES))
    # splice a second movi LIST onto the RIFF body, then fix the RIFF size
    body = one[8:] + movi2  # "AVI " + hdrl + movi + movi2
    avi = b"RIFF" + len(body).to_bytes(4, "little") + body
    got = parse_avi_frames(avi)
    assert len(got) == 2 * len(FRAMES)
    times = [f["time_ms"] for f in got]
    assert times == sorted(times) and len(set(times)) == len(times)
    assert times[len(FRAMES)] == (len(FRAMES) * 40000) // 1000
    for i, fr in enumerate(got):
        assert avi[fr["start"]:fr["end"]] == FRAMES[i % len(FRAMES)]


def test_avi_rejections():
    with pytest.raises(ValueError):
        parse_avi_frames(b"RIFFxxxxWAVEnot-a-movie")
    with pytest.raises(ValueError):
        parse_avi_frames(None)
    avi = encode_avi(FRAMES)
    with pytest.raises(ValueError):
        parse_avi_frames(avi[: len(avi) // 2])


def test_sample_frames_auto_mixed_corpus(spark):
    """mode='auto' walks GIF, MP4 and AVI payloads in ONE batch, emits the
    real evenly-sampled spans for each, and stub-slices garbage — the
    mixed-corpus contract."""
    from seaexplorertools_spark.operators.multimodal import sample_frames
    from tests.test_multimodal import _build_gif

    mp4 = encode_mp4(FRAMES)
    avi = encode_avi(FRAMES)
    gif, _ = _build_gif()
    rows = [
        (1, bytearray(mp4)),
        (2, bytearray(avi)),
        (3, bytearray(gif)),
        (4, bytearray(b"not-a-container-at-all-just-bytes")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = sample_frames(df, n_frames=4, mode="auto").collect()
    by_id: dict[int, list] = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    # 7 real frames sampled to 4: indices 0,1,3,5 of FRAMES
    picks = [FRAMES[(fi * 7) // 4] for fi in range(4)]
    for mid in (1, 2):
        got = [bytes(r["frame_payload"]) for r in sorted(by_id[mid], key=lambda r: r["frame_idx"])]
        assert got == picks, mid
    assert len(by_id[3]) == 4  # real GIF spans (content checked in test_multimodal)
    assert len(by_id[4]) == 4  # stub slices


def test_corrupt_sample_counts_fail_cheaply():
    """A tiny MP4 whose stsz/stts counts are corrupted to huge values
    must raise ValueError from the per-box bounds BEFORE materializing
    count-sized lists (previously ~GBs and minutes on a 300-byte file)."""
    import time

    mp4 = bytearray(encode_mp4(FRAMES))
    i = mp4.index(b"stsz")
    good = bytes(mp4)
    mp4[i + 12 : i + 16] = (0xFFFFFFF0).to_bytes(4, "big")  # sample_count
    t0 = time.time()
    with pytest.raises(ValueError, match="exceeds its box size"):
        parse_mp4_frames(bytes(mp4))
    assert time.time() - t0 < 0.5

    mp4 = bytearray(good)
    i = mp4.index(b"stts")
    mp4[i + 8 : i + 12] = (0x0FFFFFFF).to_bytes(4, "big")  # entry_count
    t0 = time.time()
    with pytest.raises(ValueError, match="exceeds its box size"):
        parse_mp4_frames(bytes(mp4))
    assert time.time() - t0 < 0.5


def test_video_frame_features_mjpeg_and_degrade(spark):
    """video_frame_features: MJPEG AVI and MP4 frames decode to real
    pixel stats; an H.264-like (undecodable) frame keeps its container
    metadata with NULL stats; non-containers emit no rows."""
    import numpy as np

    from seaexplorertools_spark.operators.jpegcodec import encode_jpeg
    from seaexplorertools_spark.operators.multimodal import video_frame_features

    def jpeg(val, w=16, h=8):
        img = np.full((h, w), val, np.uint8)
        return encode_jpeg(w, h, img.tobytes())

    mj_avi = encode_avi([jpeg(10), jpeg(20), jpeg(30), jpeg(40)], us_per_frame=40000)
    mj_mp4 = encode_mp4([jpeg(50), jpeg(60)])
    mixed = encode_avi([jpeg(70), b"\x00\x00\x00\x01\x67deadbeef" * 4])  # frame 2 ~ H.264 NAL
    df = spark.createDataFrame(
        [
            (1, bytearray(mj_avi)),
            (2, bytearray(mj_mp4)),
            (3, bytearray(mixed)),
            (4, bytearray(b"not a video container")),
        ],
        "media_id long, payload binary",
    )
    rows = video_frame_features(df, n_frames=2).collect()
    by = {}
    for r in rows:
        by.setdefault(r["media_id"], []).append(r)
    # AVI: 4 frames sampled at idx 0 and 2 -> values 10 and 30, 40 ms apart ×2
    a = sorted(by[1], key=lambda r: r["frame_idx"])
    assert [r["mean_px"] for r in a] == [10.0, 30.0]
    assert [r["time_ms"] for r in a] == [0, 80]
    assert all((r["width"], r["height"], r["channels"]) == (16, 8, 1) for r in a)
    # MP4: both frames
    m = sorted(by[2], key=lambda r: r["frame_idx"])
    assert [r["mean_px"] for r in m] == [50.0, 60.0]
    # mixed: JPEG frame real, NAL-ish frame NULL stats but metadata kept
    x = sorted(by[3], key=lambda r: r["frame_idx"])
    assert x[0]["mean_px"] == 70.0
    assert x[1]["mean_px"] is None and x[1]["time_ms"] == 40
    assert 4 not in by  # non-container: vacuous, no rows


# ---------------------------------------------------------------- M4A audio


def test_m4a_header_roundtrip():
    from seaexplorertools_spark.operators.videocontainers import (
        encode_m4a,
        parse_m4a_header,
    )

    for rate, ch, n, pad in [(44100, 2, 132300, 0), (22050, 1, 1024, 13),
                             (48000, 2, 4096, 49)]:
        p = encode_m4a(rate, ch, n, pad=pad)
        assert parse_m4a_header(p) == (rate, ch, 16, n, n * 1000 // rate)
        assert len(p) == 509 + ((8 + pad) if pad else 0)


def test_m4a_rejects_and_video_mp4_not_claimed():
    from seaexplorertools_spark.operators.videocontainers import (
        encode_mp4,
        parse_m4a_header,
        parse_mp4_frames,
    )

    assert parse_m4a_header(None) is None
    assert parse_m4a_header(b"") is None
    assert parse_m4a_header(b"\x00" * 64) is None
    # a VIDEO-only MP4 must not be claimed by the audio parser, and the
    # M4A fixture must not be claimed by the video walk
    vid = encode_mp4([b"frame0", b"frame1"])
    assert parse_m4a_header(vid) is None
    from seaexplorertools_spark.operators.videocontainers import encode_m4a

    with __import__("pytest").raises(ValueError):
        parse_mp4_frames(encode_m4a(44100, 2, 1024))


def test_m4a_spark_lane(spark):
    from seaexplorertools_spark.operators.multimodal import (
        documents_as_m4a,
        extract_audio_features,
    )

    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    rows = {r["media_id"]: r for r in
            extract_audio_features(documents_as_m4a(docs)).collect()}
    for did, r in rows.items():
        rate = (44100, 48000, 32000, 22050)[did % 4]
        n = 1024 * (1 + did % 5)
        assert r["n_bytes"] == 518 + did % 50
        assert (r["sample_rate"], r["channels"], r["bits"]) == (rate, 1 + did % 2, 16)
        assert (r["n_frames"], r["duration_ms"]) == (n, n * 1000 // rate)
