"""MPEG-1 Layer III decoder (operators/mp3codec.py): exact silence
class, an independent numpy replay of the nonzero fixture pipeline
(requantize → alias → IMDCT → overlap-add → frequency inversion →
polyphase synthesis, re-derived here from the public closed-form math
rather than calling the decoder's helpers), bit-reservoir offsets,
degrade boundaries of the documented subset, and the Spark lane."""

from __future__ import annotations

import math

import numpy as np
import pytest

from seaexplorertools_spark.operators.mp3codec import (
    _SFB_LONG,
    decode_mp3_samples,
    encode_mp3_frames,
    synthesis_prototype,
)


def test_silence_is_exact_zero_everywhere():
    for sr in (44100, 48000, 32000):
        for ch in (1, 2):
            for nf in (1, 3, 7):
                b = encode_mp3_frames(sr=sr, channels=ch, n_frames=nf)
                rate, c, s = decode_mp3_samples(b)
                assert (rate, c) == (sr, ch)
                assert s.shape == (1152 * nf, ch)
                assert np.all(s == 0.0)  # exact, not approx


def _replay(pairs, quads, global_gain, n_frames, proto):
    """Independent pipeline replay for the fixture class: long blocks,
    zero scalefactors, mono, identical spectrum in every granule."""
    is_ = np.zeros(576)
    i = 0
    for x, y in pairs:
        is_[i], is_[i + 1] = x, y
        i += 2
    for quad in quads:
        for v in quad:
            is_[i] = v
            i += 1
    xr = np.sign(is_) * np.abs(is_) ** (4.0 / 3.0) * 2.0 ** (
        0.25 * (global_gain - 210)
    )
    # alias reduction (8 butterflies per subband boundary)
    ci = np.array([-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037])
    cs, ca = 1.0 / np.sqrt(1 + ci**2), ci / np.sqrt(1 + ci**2)
    xa = xr.copy()
    for sb in range(1, 32):
        for k in range(8):
            a, b = xa[18 * sb - 1 - k], xa[18 * sb + k]
            xa[18 * sb - 1 - k] = a * cs[k] - b * ca[k]
            xa[18 * sb + k] = b * cs[k] + a * ca[k]
    # 36-point IMDCT + sine window per subband
    n = np.arange(36)[:, None]
    k36 = np.arange(18)[None, :]
    imdct = np.cos(np.pi / 72 * (2 * n + 1 + 18) * (2 * k36 + 1))
    win = np.sin(np.pi / 36 * (np.arange(36) + 0.5))
    # direct-form synthesis tensor
    p = np.arange(16)[:, None, None]
    j = np.arange(32)[None, :, None]
    kk = np.arange(32)[None, None, :]
    idx = (32 * p + j).squeeze(-1)
    T = 32.0 * proto[idx][..., None] * np.cos((2 * kk + 1) * (32 * p + j + 16) * np.pi / 64)

    overlap = np.zeros((32, 18))
    hist = np.zeros((16, 32))
    out = []
    for _ in range(n_frames * 2):  # granules
        ss = np.empty((32, 18))
        for sb in range(32):
            x36 = (imdct @ xa[sb * 18 : (sb + 1) * 18]) * win
            ss[sb] = x36[:18] + overlap[sb]
            overlap[sb] = x36[18:]
        ss[1::2, 1::2] *= -1.0
        for t in range(18):
            hist[1:] = hist[:-1].copy()
            hist[0] = ss[:, t]
            out.append(np.einsum("pjk,pk->j", T, hist))
    return np.concatenate(out)


def test_nonzero_fixture_matches_independent_replay():
    pairs = [(1, 0), (0, 1), (1, 1), (1, 1)]
    quads = [(1, 0, -1, 0), (0, 1, 0, -1)]
    gg = 224
    b = encode_mp3_frames(
        sr=44100, channels=1, n_frames=3, granule_payload=(pairs, quads),
        global_gain=gg,
    )
    sr, ch, s = decode_mp3_samples(b)
    expected = _replay(pairs, quads, gg, 3, synthesis_prototype())
    assert s.shape == (3456, 1)
    assert float(np.max(np.abs(s))) > 1.0  # genuinely nonzero signal
    np.testing.assert_allclose(s[:, 0], expected, atol=1e-9)


def test_global_gain_scales_output_exactly():
    pairs = [(1, 1)]
    lo = decode_mp3_samples(
        encode_mp3_frames(granule_payload=(pairs, []), global_gain=210)
    )[2]
    hi = decode_mp3_samples(
        encode_mp3_frames(granule_payload=(pairs, []), global_gain=218)
    )[2]
    np.testing.assert_allclose(hi, lo * 4.0, atol=1e-12)  # 2^(8/4)


def test_bit_reservoir_backpointer():
    """Frame 2's main_data_begin points back into frame 1's padding
    zeros — the granule data must be read from the reservoir, not the
    current frame, and still decode as silence."""
    base = encode_mp3_frames(sr=44100, channels=1, n_frames=2)
    frame_len = len(base) // 2
    f1, f2 = bytearray(base[:frame_len]), bytearray(base[frame_len:])
    # set frame 2's main_data_begin = 8 (side info starts at byte 4;
    # first 9 bits are main_data_begin)
    f2[4] = 8 >> 1
    f2[5] = (8 & 1) << 7 | (f2[5] & 0x7F)
    sr, ch, s = decode_mp3_samples(bytes(f1 + f2))
    assert s.shape == (2304, 1) and np.all(s == 0.0)


def test_reservoir_underrun_emits_silence_not_garbage():
    base = encode_mp3_frames(sr=44100, channels=1, n_frames=1)
    f = bytearray(base)
    f[4] = 255 >> 1  # main_data_begin far beyond any reservoir
    f[5] = (255 & 1) << 7 | (f[5] & 0x7F)
    sr, ch, s = decode_mp3_samples(bytes(f))
    assert np.all(s == 0.0)


def test_unsupported_features_raise_value_error():
    # huffman table outside the subset: patch table_select bits
    b = bytearray(encode_mp3_frames(granule_payload=([(1, 0)], []), n_frames=1))
    # gr0/ch0 table_select[0] sits after 9+5+4+12+9+8+4+1 = 52 bits of
    # side info (side info starts at byte 4): bits 52..56
    bitpos = 4 * 8 + 52
    for i, bit in enumerate(f"{16:05b}"):
        byte, off = (bitpos + i) >> 3, 7 - ((bitpos + i) & 7)
        b[byte] = (b[byte] & ~(1 << off)) | (int(bit) << off)
    with pytest.raises(ValueError, match="subset"):
        decode_mp3_samples(bytes(b))
    # MPEG-2 version bits
    b2 = bytearray(encode_mp3_frames(n_frames=1))
    b2[1] = 0xF3  # version = 2 (MPEG-2), layer III
    with pytest.raises(ValueError):
        decode_mp3_samples(bytes(b2))
    with pytest.raises(ValueError):
        decode_mp3_samples(b"\x00" * 64)


def test_truncated_tail_frame_is_dropped():
    b = encode_mp3_frames(sr=44100, channels=1, n_frames=3)
    sr, ch, s = decode_mp3_samples(b[: len(b) - 10])
    assert s.shape == (2304, 1)  # 2 whole frames survive


def test_ms_stereo_silence_decodes():
    b = bytearray(encode_mp3_frames(sr=44100, channels=2, n_frames=1))
    b[3] = (1 << 6) | (2 << 4)  # joint stereo, M/S on
    sr, ch, s = decode_mp3_samples(bytes(b))
    assert ch == 2 and np.all(s == 0.0)


def test_sfb_edges_cover_576_and_are_monotone():
    for sr, edges in _SFB_LONG.items():
        assert edges[0] == 0 and edges[-1] == 576 and len(edges) == 23
        assert all(a < b for a, b in zip(edges, edges[1:]))


def test_spark_lane_mixed_payloads(spark):
    """WAV → FLAC → MP3 sniff order with degrade: one lane, four payload
    kinds, no failed job."""
    from seaexplorertools_spark.operators.mp3codec import encode_mp3_frames
    from seaexplorertools_spark.operators.multimodal import wav_signal_features

    mp3 = encode_mp3_frames(sr=48000, channels=1, n_frames=2)
    bad = b"\xff\xe0 not really audio"
    rows = [(1, bytearray(mp3)), (2, bytearray(bad)), (3, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in wav_signal_features(df).collect()}
    assert got[1]["n_frames"] == 2304 and got[1]["rms"] == 0.0
    assert got[1]["sample_rate"] == 48000
    assert got[2]["rms"] is None and got[3]["rms"] is None


def test_documents_as_mp3_contract_shape(spark):
    from seaexplorertools_spark.operators.multimodal import (
        documents_as_mp3,
        wav_signal_features,
    )

    docs = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
    out = wav_signal_features(documents_as_mp3(docs)).collect()
    for r in out:
        did = r["media_id"]
        assert r["sample_rate"] == (44100, 48000, 32000)[did % 3]
        assert r["channels"] == 1 + did % 2
        assert r["n_frames"] == 1152 * (2 + did % 6)
        assert r["rms"] == 0.0 and r["peak"] == 0.0
        assert r["zero_cross_rate"] == 0.0


def test_vbr_stream_with_xing_header():
    """Per-frame bitrates vary; the Xing frame is metadata, not audio —
    decode skips it, parse uses its exact frame count."""
    from seaexplorertools_spark.operators.multimodal import parse_mp3_header

    b = encode_mp3_frames(
        sr=44100, channels=1, n_frames=5, bitrate_idx=9,
        vbr_pattern=[9, 10, 11], xing=True,
    )
    sr, ch, s = decode_mp3_samples(b)
    assert s.shape == (5 * 1152, 1) and np.all(s == 0.0)  # Xing skipped
    rate, channels, bits, total, dur = parse_mp3_header(b)
    assert total == 5 * 1152  # exact via Xing, NOT the CBR estimate
    # the CBR estimate over this payload would be wrong by construction:
    flens = [144 * br * 1000 // 44100 for br in (128, 160, 192)]
    xing_len = flens[0]
    payload_audio = xing_len + sum(flens[k % 3] for k in range(5))
    assert len(b) == payload_audio
    assert (len(b) // flens[0]) * 1152 != total


def test_info_magic_also_recognized():
    from seaexplorertools_spark.operators.multimodal import parse_mp3_header

    b = bytearray(encode_mp3_frames(sr=48000, n_frames=3, xing=True))
    pos = b.find(b"Xing")
    b[pos : pos + 4] = b"Info"  # CBR files write 'Info' with same layout
    assert parse_mp3_header(bytes(b))[3] == 3 * 1152
    sr, ch, s = decode_mp3_samples(bytes(b))
    assert s.shape == (3 * 1152, 1)


def test_resample_audio_features_replay(spark):
    """Arbitrary (non-dyadic) factor pinned by a direct numpy replay,
    plus the degrade contract."""
    import io
    import wave as wavemod

    from seaexplorertools_spark.operators.multimodal import (
        resample_audio_features,
    )

    rng = np.random.default_rng(11)
    sig = rng.integers(-20000, 20000, (500, 2)).astype("<i2")
    buf = io.BytesIO()
    with wavemod.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(sig.tobytes())
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue())), (2, bytearray(b"junk"))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in
            resample_audio_features(df, upsample_factor=3).collect()}
    mono = sig.astype(np.float64).mean(axis=1)
    n_out = (len(mono) - 1) * 3 + 1
    out = np.interp(np.arange(n_out) / 3.0, np.arange(len(mono)), mono)
    assert rows[1]["src_rate"] == 8000 and rows[1]["target_rate"] == 24000
    assert rows[1]["n_frames"] == n_out
    assert rows[1]["rms"] == pytest.approx(float(np.sqrt(np.mean(out**2))), rel=1e-12)
    assert rows[1]["peak"] == pytest.approx(float(np.max(np.abs(out))), rel=1e-12)
    assert rows[2]["rms"] is None
