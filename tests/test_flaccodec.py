"""FLAC codec: encoder↔decoder roundtrips for every subframe type and
channel assignment, bit-level decode of hand-built frames (wasted bits,
escape partitions, multi-partition Rice), rejection hardening, and the
WAV → FLAC → MP3 chain through the signal-feature lane."""

from __future__ import annotations

import numpy as np
import pytest

from seaexplorertools_spark.operators import flaccodec as fc
from seaexplorertools_spark.operators.flaccodec import (
    decode_flac_samples,
    encode_flac,
)


def test_roundtrip_subframe_types_and_bits():
    rng = np.random.default_rng(41)
    cases = [
        ("verbatim", 16, rng.integers(-30000, 30000, (1500, 1))),
        ("fixed", 16, np.cumsum(rng.integers(-50, 50, (2100, 2)), axis=0)),
        ("constant", 16, np.full((700, 1), -123)),
        ("auto", 8, rng.integers(-120, 120, (1030, 2))),
        ("auto", 24, rng.integers(-(1 << 22), 1 << 22, (999, 1))),
    ]
    for sub, bits, arr in cases:
        payload = encode_flac(44100, arr, bits=bits, subframe=sub)
        sr, ch, out = decode_flac_samples(payload)
        assert sr == 44100 and ch == arr.shape[1]
        assert np.array_equal(out, arr), (sub, bits)


def test_roundtrip_block_boundaries_and_mid_side():
    rng = np.random.default_rng(42)
    # n not a multiple of block_size → short last frame (16-bit size tail)
    arr = np.cumsum(rng.integers(-40, 40, (2500, 2)), axis=0)
    for stereo in ("independent", "mid_side"):
        payload = encode_flac(22050, arr, block_size=1024, stereo=stereo)
        sr, ch, out = decode_flac_samples(payload)
        assert np.array_equal(out, arr), stereo
    # single-frame file and empty file
    one = encode_flac(8000, arr[:10])
    assert np.array_equal(decode_flac_samples(one)[2], arr[:10])
    sr, ch, empty = decode_flac_samples(encode_flac(8000, arr[:0]))
    assert (sr, ch, empty.shape) == (8000, 2, (0, 2))


def _hand_frame(sub_bits, bs, bits=8, sr_hz=8000, ch=1):
    """Build fLaC + STREAMINFO + ONE hand-crafted mono frame whose
    subframe section is produced by ``sub_bits(bw)`` — lets tests drive
    decoder paths the fixture encoder never emits."""
    meta = encode_flac(sr_hz, np.zeros((0, ch), dtype=np.int64), bits=bits)
    # patch STREAMINFO total_samples to bs (bytes 14..18 of the block,
    # which starts at offset 8 = 4 magic + 4 block header)
    meta = bytearray(meta)
    meta[8 + 14 : 8 + 18] = int(bs).to_bytes(4, "big")
    bw = fc._BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 2)
    bw.write(7, 4)  # 16-bit block size tail
    bw.write(0, 4)  # rate from STREAMINFO
    bw.write(ch - 1, 4)
    bw.write({8: 1, 16: 4}[bits], 3)
    bw.write(0, 1)
    for byte in fc._utf8_number(0):
        bw.write(byte, 8)
    bw.write(bs - 1, 16)
    bw.align()
    hdr = bw.bytes()
    body = fc._BitWriter()
    sub_bits(body)
    body.align()
    frame = hdr + bytes([fc._crc8(hdr)]) + body.bytes()
    frame += fc._crc16(frame).to_bytes(2, "big")
    return bytes(meta) + frame


def test_wasted_bits_shift():
    """Samples [8, 16, 24, 32] have 3 wasted low bits: a VERBATIM
    subframe coding [1, 2, 3, 4] at bps-3 with wasted=3 must decode to
    the originals (spec 9.2.2: left-shift after reconstruction)."""
    def sub(bw):
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        bw.write(1, 1)  # wasted-bits flag
        bw.write(0, 2)  # unary 2 -> wasted = 3
        bw.write(1, 1)
        for v in (1, 2, 3, 4):
            bw.write(v, 8 - 3)

    sr, ch, out = decode_flac_samples(_hand_frame(sub, bs=4))
    assert out[:, 0].tolist() == [8, 16, 24, 32]


def test_rice_escape_partition_raw_bits():
    """Escape parameter (0b1111) switches a partition to n-bit raw
    two's-complement residuals."""
    vals = [5, -3, 7, -8]

    def sub(bw):
        bw.write(0, 1)
        bw.write(8, 6)  # FIXED order 0
        bw.write(0, 1)
        bw.write(0, 2)  # method 0
        bw.write(0, 4)  # partition order 0
        bw.write(15, 4)  # escape
        bw.write(5, 5)  # 5-bit raw residuals
        for v in vals:
            bw.write(v & 0x1F, 5)

    sr, ch, out = decode_flac_samples(_hand_frame(sub, bs=4))
    assert out[:, 0].tolist() == vals


def test_multi_partition_rice_order2():
    """Partition order 2 over a fixed order-1 subframe: first partition
    holds bs/4 - 1 residuals, the rest bs/4 — per-partition params."""
    samples = [3, 4, 6, 9, 13, 18, 24, 31]  # deltas 1,2,3,4,5,6,7
    deltas = [1, 2, 3, 4, 5, 6, 7]

    def rice(bw, v, k):
        z = (-v << 1) - 1 if v < 0 else v << 1
        bw.write_unary(z >> k)
        if k:
            bw.write(z, k)

    def sub(bw):
        bw.write(0, 1)
        bw.write(9, 6)  # FIXED order 1
        bw.write(0, 1)
        bw.write(samples[0], 8)  # warmup
        bw.write(0, 2)  # method 0
        bw.write(2, 4)  # partition order 2 -> 4 partitions of bs/4 = 2
        params = [0, 1, 2, 3]
        di = 0
        for p, k in enumerate(params):
            n = 2 - (1 if p == 0 else 0)
            bw.write(k, 4)
            for _ in range(n):
                rice(bw, deltas[di], k)
                di += 1

    sr, ch, out = decode_flac_samples(_hand_frame(sub, bs=8))
    assert out[:, 0].tolist() == samples


def test_rejections_and_bomb_guards():
    rng = np.random.default_rng(43)
    arr = rng.integers(-1000, 1000, (600, 1))
    good = encode_flac(16000, arr)

    with pytest.raises(ValueError):
        decode_flac_samples(None)
    with pytest.raises(ValueError):
        decode_flac_samples(b"RIFFnotflac")
    with pytest.raises(ValueError):
        decode_flac_samples(good[: len(good) - 40])  # truncated mid-frame

    # corrupt header CRC-8: flip a bit in the first frame header
    meta_end = good.index(b"\xff\xf8", 4)
    bad = bytearray(good)
    bad[meta_end + 3] ^= 0x01
    with pytest.raises(ValueError, match="CRC-8|sample size|block size|reserved|channel"):
        decode_flac_samples(bytes(bad))

    # corrupt frame body: CRC-16 catches what structure checks miss
    bad = bytearray(good)
    bad[-10] ^= 0x40
    with pytest.raises(ValueError):
        decode_flac_samples(bytes(bad))

    # STREAMINFO bomb: tiny payload claiming 2^35 samples must refuse
    # BEFORE allocating (bound untrusted counts by container size)
    bomb = bytearray(good[:200])
    bomb[8 + 13] = (bomb[8 + 13] & 0xF0) | 0x08  # total_samples high bits
    with pytest.raises(ValueError, match="too large"):
        decode_flac_samples(bytes(bomb))

    # reserved subframe type (2) and spec-dead negative qlp shift
    def reserved(bw):
        bw.write(0, 1)
        bw.write(2, 6)
        bw.write(0, 1)

    with pytest.raises(ValueError, match="reserved"):
        decode_flac_samples(_hand_frame(reserved, bs=4))

    def neg_shift(bw):
        bw.write(0, 1)
        bw.write(32, 6)  # LPC order 1
        bw.write(0, 1)
        bw.write(0, 8)  # warmup
        bw.write(11, 4)  # precision 12
        bw.write(0x1F, 5)  # shift = -1
        bw.write(1, 12)

    with pytest.raises(ValueError, match="negative"):
        decode_flac_samples(_hand_frame(neg_shift, bs=4))


def test_lpc_roundtrip_and_escape():
    """LPC subframes (the form nearly all real FLAC uses): quantized
    coefficients + arithmetic shift invert exactly for any coefficient
    set — smooth signals, high orders, mid/side stereo."""
    rng = np.random.default_rng(45)
    t = np.arange(5000)
    sig = (2500 * np.sin(t / 40) + rng.integers(-60, 60, 5000)).astype(np.int64)
    mono = sig[:, None]
    for coefs in (None, [0.5], [2.2, -1.6, 0.35], [1.0] * 8):
        payload = encode_flac(48000, mono, subframe="lpc", lpc_coefs=coefs)
        sr, ch, out = decode_flac_samples(payload)
        assert np.array_equal(out, mono), coefs
    stereo = np.stack([sig, (sig * 0.7).astype(np.int64)], axis=1)
    payload = encode_flac(48000, stereo, subframe="lpc", stereo="mid_side")
    assert np.array_equal(decode_flac_samples(payload)[2], stereo)
    # LPC compresses the smooth signal better than verbatim
    assert len(encode_flac(48000, mono, subframe="lpc")) < len(
        encode_flac(48000, mono, subframe="verbatim")
    )
    # channel shorter than the order falls back to a valid verbatim
    short = mono[:3]
    payload = encode_flac(8000, short, subframe="lpc", lpc_coefs=[1.0] * 8)
    assert np.array_equal(decode_flac_samples(payload)[2], short)


def test_signal_feature_lane_wav_flac_mp3_chain(spark):
    """wav_signal_features decodes WAV first, then FLAC; MP3 and junk
    stay NULL — and the FLAC row's rms/peak/ZCR equal the numpy truth."""
    import io
    import wave as wavemod

    from seaexplorertools_spark.operators.multimodal import wav_signal_features

    rng = np.random.default_rng(44)
    sig = np.cumsum(rng.integers(-200, 200, (3000, 2)), axis=0).clip(-30000, 30000)

    buf = io.BytesIO()
    with wavemod.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(sig.astype("<i2").tobytes())
    wav = buf.getvalue()
    flac = encode_flac(16000, sig)

    hdr = bytes([0xFF, 0xFB, 0x90, 0x00])
    mp3 = hdr + bytes(144 * 128000 // 44100 - 4)

    df = spark.createDataFrame(
        [
            (1, bytearray(wav)),
            (2, bytearray(flac)),
            (3, bytearray(mp3)),
            (4, bytearray(b"not audio at all")),
        ],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in wav_signal_features(df).collect()}

    mono = sig.astype(np.float64).mean(axis=1)
    rms = float(np.sqrt(np.mean(mono**2)))
    peak = float(np.max(np.abs(mono)))
    zc = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    for mid in (1, 2):  # WAV and FLAC agree on the same samples
        r = rows[mid]
        assert (r["sample_rate"], r["channels"], r["n_frames"]) == (16000, 2, 3000)
        assert r["rms"] == pytest.approx(rms, rel=1e-12)
        assert r["peak"] == pytest.approx(peak, rel=1e-12)
        assert r["zero_cross_rate"] == pytest.approx(zc, rel=1e-12)
    # row 3's zero-filled frame became a VALID MPEG-1 Layer III silence
    # frame once mp3codec landed (round 8): all-zero side info means
    # part2_3_length 0 in every granule — the full decode chain must
    # yield exactly-zero PCM, not a degrade
    r3 = rows[3]
    assert (r3["sample_rate"], r3["channels"], r3["n_frames"]) == (44100, 2, 1152)
    assert r3["rms"] == 0.0 and r3["peak"] == 0.0 and r3["zero_cross_rate"] == 0.0
    assert rows[4]["rms"] is None
