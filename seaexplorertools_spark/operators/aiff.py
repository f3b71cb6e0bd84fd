"""AIFF (Audio Interchange File Format) — pure-python parse + decode.

The big-endian sibling of RIFF/WAVE: an IFF ``FORM`` container of type
``AIFF`` whose ``COMM`` chunk carries channels / frame count / sample
width and the sample rate as an 80-bit IEEE-754 extended float (the one
place that format survives in the wild), and whose ``SSND`` chunk holds
big-endian PCM. Decode supports 8/16/24-bit PCM (the baseline AIFF
forms); AIFF-C compressed variants degrade with ValueError so the audio
lane's per-row degrade contract holds.

Joins the sniff chain WAV → FLAC → MP3 → Ogg → AIFF in
multimodal.extract_audio_features and the sample-decode chain in
wav_signal_features — AIFF is lossless, so like FLAC the decoded
rms/peak/ZCR of small-integer fixtures are exact closed forms and the
whole encode→decode→stats path sits under an exact SQL oracle
(``mm_aiff_signal`` / ``mm_aiff_meta``).

Reference parity: the reference engine has no audio path
(`/root/reference/seaexplorertools/process_adcp.py`); this is part of
the multimodal training-data surface the brief adds.
"""

from __future__ import annotations


def _f80_encode(value: float) -> bytes:
    """80-bit IEEE-754 extended float (sign·15-bit exponent·64-bit
    mantissa with explicit integer bit) — the COMM sampleRate field."""
    if value <= 0:
        raise ValueError("aiff: sample rate must be positive")
    mant = float(value)
    exp = 16383 + 63
    while mant < (1 << 63):
        mant *= 2.0
        exp -= 1
    while mant >= (1 << 64):
        mant /= 2.0
        exp += 1
    return exp.to_bytes(2, "big") + int(mant).to_bytes(8, "big")


def _f80_decode(b: bytes) -> float:
    if len(b) != 10:
        raise ValueError("aiff: bad extended-float width")
    se = int.from_bytes(b[:2], "big")
    mant = int.from_bytes(b[2:], "big")
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    if exp == 0x7FFF:
        raise ValueError("aiff: non-finite sample rate")
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def _walk_chunks(b: bytes):
    """Yield (chunk_id, start, size) for the FORM's local chunks, each
    span bounded by the payload. IFF pads odd-sized chunks by one byte."""
    if len(b) < 12 or b[:4] != b"FORM" or b[8:12] != b"AIFF":
        raise ValueError("aiff: not a FORM/AIFF payload")
    end = min(8 + int.from_bytes(b[4:8], "big"), len(b))
    i = 12
    while i + 8 <= end:
        cid = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "big")
        if size < 0 or i + 8 + size > end:
            break  # truncated tail chunk: stop, keep what parsed
        yield cid, i + 8, size
        i += 8 + size + (size & 1)


def parse_aiff_header(payload: bytes | None) -> tuple | None:
    """(sample_rate, channels, bits, n_frames, duration_ms) from the
    COMM chunk, or None when the payload is not AIFF — the sniff-chain
    contract shared with parse_wav/flac/mp3/ogg headers."""
    if payload is None or len(payload) < 12:
        return None
    b = bytes(payload)
    try:
        for cid, off, size in _walk_chunks(b):
            if cid == b"COMM" and size >= 18:
                ch = int.from_bytes(b[off : off + 2], "big")
                nf = int.from_bytes(b[off + 2 : off + 6], "big")
                bits = int.from_bytes(b[off + 6 : off + 8], "big")
                rate = _f80_decode(b[off + 8 : off + 18])
                if ch <= 0 or bits <= 0 or rate <= 0:
                    return None
                irate = int(round(rate))
                return (irate, ch, bits, nf, (nf * 1000) // max(irate, 1))
    except ValueError:
        return None
    return None


def decode_aiff_samples(payload: bytes) -> tuple[int, int, "object"]:
    """(rate, channels, int samples [n_frames, channels]) from 8/16/24-bit
    big-endian PCM. Frame count is the COMM value clamped to what the
    SSND chunk actually holds (truncation degrades gracefully)."""
    import numpy as np

    if payload is None:
        raise ValueError("aiff: null payload")
    b = bytes(payload)
    comm = parse_aiff_header(b)
    if comm is None:
        raise ValueError("aiff: no COMM chunk")
    rate, ch, bits, nf, _ = comm
    if bits not in (8, 16, 24):
        raise ValueError(f"aiff: unsupported sample width {bits}")
    ssnd = None
    for cid, off, size in _walk_chunks(b):
        if cid == b"SSND" and size >= 8:
            data_off = int.from_bytes(b[off : off + 4], "big")
            data = b[off + 8 + data_off : off + size]
            ssnd = data
            break
    if ssnd is None:
        raise ValueError("aiff: no SSND chunk")
    bw = bits // 8
    n = min(nf, len(ssnd) // (bw * ch))
    raw = ssnd[: n * bw * ch]
    if bits == 8:
        s = np.frombuffer(raw, dtype=np.int8).astype(np.int64)
    elif bits == 16:
        s = np.frombuffer(raw, dtype=">i2").astype(np.int64)
    else:  # 24-bit: sign-extend manually
        a = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
        s = (a[:, 0] << 16) | (a[:, 1] << 8) | a[:, 2]
        s -= (s >> 23) << 24
    return rate, ch, s.reshape(-1, ch)


def encode_aiff(rate: int, samples, bits: int = 16) -> bytes:
    """Emit a spec-valid AIFF (fixture builder): FORM/AIFF with COMM
    (80-bit extended rate) + SSND (offset 0, big-endian PCM)."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    nf, ch = arr.shape
    if bits == 16:
        data = arr.astype(">i2").tobytes()
    elif bits == 8:
        data = arr.astype(np.int8).tobytes()
    elif bits == 24:
        flat = arr.reshape(-1) & 0xFFFFFF
        out = np.empty((flat.size, 3), dtype=np.uint8)
        out[:, 0] = (flat >> 16) & 0xFF
        out[:, 1] = (flat >> 8) & 0xFF
        out[:, 2] = flat & 0xFF
        data = out.tobytes()
    else:
        raise ValueError("encode_aiff: bits must be 8/16/24")
    comm = (
        ch.to_bytes(2, "big")
        + nf.to_bytes(4, "big")
        + bits.to_bytes(2, "big")
        + _f80_encode(float(rate))
    )
    ssnd_body = (0).to_bytes(4, "big") + (0).to_bytes(4, "big") + data
    chunks = b"COMM" + len(comm).to_bytes(4, "big") + comm
    chunks += b"SSND" + len(ssnd_body).to_bytes(4, "big") + ssnd_body
    if len(ssnd_body) & 1:
        chunks += b"\x00"
    return b"FORM" + (4 + len(chunks)).to_bytes(4, "big") + b"AIFF" + chunks
