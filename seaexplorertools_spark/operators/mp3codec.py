"""MPEG-1 Audio Layer III sample decoder (pure python, built from the
public ISO/IEC 11172-3 structure — the lossy-audio twin of
``flaccodec``; reference scope: process_adcp.py has no audio surface,
this is the LLM-pipeline lane's web-corpus format coverage).

Decodes real Layer III streams to PCM: frame sync + header, side info,
bit reservoir (``main_data_begin``), scalefactors (long/short/mixed,
scfsi), Huffman spectral decode, requantization, short-block
reordering, M/S stereo, alias reduction, 36/12-point IMDCT with the
four closed-form block windows, overlap-add, frequency inversion, and
the 32-band polyphase synthesis bank. Signal features over the result
(rms/peak/ZCR) ride ``multimodal.wav_signal_features`` exactly like
WAV and FLAC.

HONEST SCOPE — what is exact and what is approximate in this offline
container (no spec PDF, no codec libs to consult):

- Everything structural above is implemented from closed-form public
  math and is exact: the IMDCT/window formulas, alias-reduction
  coefficients (ci → cs/ca), requantization exponents, side-info
  layout, slen/pretab tables, scalefactor-band edges.
- Huffman coverage is the subset this author can state with
  confidence: table 0 (no codewords — all-zero region), table 1, and
  count1 table B (fixed 4-bit complement codes). A granule selecting
  any other table degrades the WHOLE payload to NULL signal features
  (metadata survives via ``parse_mp3_header``) — never a wrong sample,
  never a failed job. Real-world coverage is therefore thin; the
  fixture class (silence + small-table frames) decodes exactly.
- The polyphase synthesis PROTOTYPE WINDOW is NOT ISO Table B.3 (512
  hand-designed constants with no closed form — not reconstructable
  offline). The bank is implemented in the direct cosine-modulated
  form x_t[j] = Σ_p Σ_k S_{t-p}[k]·32·h[32p+j]·cos((2k+1)(32p+j+16)π/64)
  — mathematically equivalent to the spec's V/U/D fast structure with
  D[n] = ±h[n] sign-folding — with h a documented closed-form near-PR
  prototype (Hann-windowed sinc, cutoff π/64, passband gain calibrated
  to 1). Consequence: PCM from real-world streams differs from a
  conformant decoder by the window-approximation error; the SILENCE
  class (all-zero spectrum) is exactly zero under ANY window, which is
  what the exact SQL oracle (``mm_mp3_signal``) pins, and the nonzero
  fixture class is pinned by an independent numpy replay in pytest.

Scale contract: mirrors flaccodec — driver-side pure function applied
inside Arrow-batched ``mapInPandas`` lanes, per-row degrade, and
container-bounded allocation (``_MAX_FRAMES``/``_MAX_SAMPLES`` caps a
hostile header can't exceed).
"""

from __future__ import annotations

import math

_MAX_FRAMES = 1 << 16
_MAX_SAMPLES = 1 << 26  # ≈ 64M mono samples — bounds the output buffer

_BITRATE_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_SAMPLERATE_V1 = (44100, 48000, 32000)

# scalefactor-band edges (MPEG-1 long blocks, 23 edges / 22 bands) and
# short blocks (14 edges / 13 bands) per sample rate — ISO 11172-3
# Table B.8 as widely republished.
_SFB_LONG = {
    44100: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110,
            134, 162, 196, 238, 288, 342, 418, 576],
    48000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106,
            128, 156, 190, 230, 276, 330, 384, 576],
    32000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126,
            156, 194, 240, 296, 364, 448, 550, 576],
}
_SFB_SHORT = {
    44100: [0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192],
    48000: [0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192],
    32000: [0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192],
}
_PRETAB = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0]
# scalefac_compress → (slen1, slen2)
_SLEN = [(0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
         (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3)]

# Huffman subset (see module docstring): code string → (x, y)
_HUFF_PAIR_CODES = {
    0: {},  # table 0: zero region, no codewords ever read
    1: {"1": (0, 0), "001": (0, 1), "01": (1, 0), "000": (1, 1)},
}
_HUFF_LINBITS = {0: 0, 1: 0}

# alias-reduction butterflies: ci → (cs, ca), closed form
_CI = [-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037]
_CS = [1.0 / math.sqrt(1.0 + c * c) for c in _CI]
_CA = [c / math.sqrt(1.0 + c * c) for c in _CI]


class _Unsupported(ValueError):
    """Stream uses a feature outside the documented decode subset —
    callers degrade the row to NULL signal features."""


def _build_tree(codes: dict) -> dict:
    root: dict = {}
    for code, val in codes.items():
        node = root
        for b in code[:-1]:
            node = node.setdefault(b, {})
        node[code[-1]] = val
    return root


_HUFF_TREES = {t: _build_tree(c) for t, c in _HUFF_PAIR_CODES.items()}


class _BitReader:
    """MSB-first bit reader over the assembled main-data reservoir."""

    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes, bitpos: int = 0) -> None:
        self.data = data
        self.bitpos = bitpos

    def read(self, n: int) -> int:
        out = 0
        bp = self.bitpos
        data = self.data
        for _ in range(n):
            byte = bp >> 3
            if byte >= len(data):
                raise ValueError("MP3 bitstream truncated")
            out = (out << 1) | ((data[byte] >> (7 - (bp & 7))) & 1)
            bp += 1
        self.bitpos = bp
        return out


def _read_side_info(b: bytes, channels: int) -> dict:
    br = _BitReader(b)
    si: dict = {"main_data_begin": br.read(9)}
    br.read(5 if channels == 1 else 3)  # private bits
    si["scfsi"] = [[br.read(1) for _ in range(4)] for _ in range(channels)]
    grans = []
    for _ in range(2):
        chans = []
        for _ in range(channels):
            g = {
                "part2_3_length": br.read(12),
                "big_values": br.read(9),
                "global_gain": br.read(8),
                "scalefac_compress": br.read(4),
                "window_switching": br.read(1),
            }
            if g["window_switching"]:
                g["block_type"] = br.read(2)
                g["mixed_block"] = br.read(1)
                g["table_select"] = [br.read(5), br.read(5)]
                g["subblock_gain"] = [br.read(3) for _ in range(3)]
                if g["block_type"] == 0:
                    raise ValueError("window_switching with block_type 0")
                # spec-fixed region boundaries under window switching
                g["region0_count"] = 8 if g["block_type"] == 2 and not g["mixed_block"] else 7
                g["region1_count"] = 20 - g["region0_count"]
            else:
                g["block_type"] = 0
                g["mixed_block"] = 0
                g["table_select"] = [br.read(5), br.read(5), br.read(5)]
                g["region0_count"] = br.read(4)
                g["region1_count"] = br.read(3)
            g["preflag"] = br.read(1)
            g["scalefac_scale"] = br.read(1)
            g["count1table_select"] = br.read(1)
            chans.append(g)
        grans.append(chans)
    si["granules"] = grans
    return si


def _read_scalefactors(br: _BitReader, g: dict, gr: int, scfsi: list,
                       prev: list | None) -> tuple[list, list]:
    """Returns (long_sf[21], short_sf[13][3]); unread bands are 0."""
    slen1, slen2 = _SLEN[g["scalefac_compress"]]
    long_sf = [0] * 22
    short_sf = [[0, 0, 0] for _ in range(13)]
    if g["window_switching"] and g["block_type"] == 2:
        if g["mixed_block"]:
            for sfb in range(8):
                long_sf[sfb] = br.read(slen1)
            for sfb in range(3, 6):
                for w in range(3):
                    short_sf[sfb][w] = br.read(slen1)
            for sfb in range(6, 12):
                for w in range(3):
                    short_sf[sfb][w] = br.read(slen2)
        else:
            for sfb in range(6):
                for w in range(3):
                    short_sf[sfb][w] = br.read(slen1)
            for sfb in range(6, 12):
                for w in range(3):
                    short_sf[sfb][w] = br.read(slen2)
    else:
        groups = [(0, 6, slen1), (6, 11, slen1), (11, 16, slen2), (16, 21, slen2)]
        for gi, (lo, hi, slen) in enumerate(groups):
            if gr == 1 and scfsi[gi] and prev is not None:
                for sfb in range(lo, hi):
                    long_sf[sfb] = prev[sfb]
            else:
                for sfb in range(lo, hi):
                    long_sf[sfb] = br.read(slen)
    return long_sf, short_sf


def _decode_pair(br: _BitReader, table: int, end_bit: int) -> tuple[int, int]:
    tree = _HUFF_TREES[table]
    node = tree
    while isinstance(node, dict):
        if br.bitpos >= end_bit:
            raise ValueError("MP3 huffman ran past part2_3 boundary")
        node = node.get("1" if br.read(1) else "0")
        if node is None:
            raise ValueError("MP3 invalid huffman codeword")
    x, y = node
    linbits = _HUFF_LINBITS[table]
    if linbits and x == 15:
        x += br.read(linbits)
    if x and br.read(1):
        x = -x
    if linbits and y == 15:
        y += br.read(linbits)
    if y and br.read(1):
        y = -y
    return x, y


def _decode_huffman(br: _BitReader, g: dict, sr: int, end_bit: int) -> list[int]:
    """576 spectral integers for one granule/channel."""
    is_ = [0] * 576
    bv_end = min(g["big_values"] * 2, 576)
    if g["window_switching"] and g["block_type"] == 2:
        region1_start, region2_start = 36, 576
    else:
        edges = _SFB_LONG[sr]
        region1_start = edges[min(g["region0_count"] + 1, 22)]
        region2_start = edges[
            min(g["region0_count"] + 1 + g["region1_count"] + 1, 22)
        ]
    i = 0
    while i < bv_end:
        if i < region1_start:
            table = g["table_select"][0]
        elif i < region2_start:
            table = g["table_select"][1]
        else:
            if len(g["table_select"]) < 3:
                raise ValueError("region 2 data in a window-switching granule")
            table = g["table_select"][2]
        if table not in _HUFF_TREES:
            raise _Unsupported(f"huffman table {table} outside decode subset")
        if table == 0:
            is_[i] = is_[i + 1] = 0
        else:
            is_[i], is_[i + 1] = _decode_pair(br, table, end_bit)
        i += 2
    # count1 region: quadruples until the granule's bit budget is spent
    while br.bitpos < end_bit and i <= 572:
        if g["count1table_select"] == 1:  # table B: fixed 4-bit complement
            v = (~br.read(4)) & 0xF
            quad = [(v >> 3) & 1, (v >> 2) & 1, (v >> 1) & 1, v & 1]
        else:
            raise _Unsupported("count1 table A outside decode subset")
        for q in quad:
            if q and br.read(1):
                q = -q
            is_[i] = q
            i += 1
    if br.bitpos > end_bit:
        # a final quad can legitimately straddle the boundary by design
        # of the spec's "discard overhanging bits" rule: zero it back out
        for j in range(max(i - 4, 0), i):
            is_[j] = 0
    br.bitpos = end_bit
    return is_


def _requantize(is_, g, sr, long_sf, short_sf):
    import numpy as np

    xr = np.zeros(576)
    vals = np.array(is_, dtype=np.float64)
    mag = np.abs(vals) ** (4.0 / 3.0) * np.sign(vals)
    gain = 2.0 ** (0.25 * (g["global_gain"] - 210))
    mult = 0.5 * (g["scalefac_scale"] + 1)
    if g["window_switching"] and g["block_type"] == 2 and not g["mixed_block"]:
        edges = _SFB_SHORT[sr]
        for sfb in range(13):
            lo, hi = edges[sfb], edges[sfb + 1]
            n = hi - lo
            for w in range(3):
                s = lo * 3 + w * n
                f = gain * 2.0 ** (
                    -2.0 * g["subblock_gain"][w] * 0.25 * 8  # 2^{-2*sbg}
                    - mult * short_sf[sfb][w]
                )
                xr[s : s + n] = mag[s : s + n] * f
    else:
        # long (incl. the long part of mixed — mixed short tail handled
        # like pure short from sfb 3; this decoder treats mixed blocks
        # as unsupported at the huffman step only if tables demand it)
        edges = _SFB_LONG[sr]
        if g["window_switching"] and g["block_type"] == 2 and g["mixed_block"]:
            raise _Unsupported("mixed blocks outside decode subset")
        for sfb in range(22):
            lo, hi = edges[sfb], edges[sfb + 1]
            f = gain * 2.0 ** (
                -mult * (long_sf[sfb] + g["preflag"] * _PRETAB[sfb])
            )
            xr[lo:hi] = mag[lo:hi] * f
    return xr


def _reorder_short(xr, sr):
    """Short-block spectral reorder: within each scalefactor band the
    stream stores window-major triplets; the filterbank wants
    frequency-major."""
    import numpy as np

    out = np.zeros(576)
    edges = _SFB_SHORT[sr]
    for sfb in range(13):
        lo, hi = edges[sfb], edges[sfb + 1]
        n = hi - lo
        base = lo * 3
        for w in range(3):
            out[base + w : base + 3 * n + w : 3] = xr[base + w * n : base + (w + 1) * n]
    return out


def _alias_reduce(xr):
    for sb in range(1, 32):
        off = sb * 18
        for i in range(8):
            a = xr[off - 1 - i]
            b = xr[off + i]
            xr[off - 1 - i] = a * _CS[i] - b * _CA[i]
            xr[off + i] = b * _CS[i] + a * _CA[i]
    return xr


def _imdct_win(block_type: int):
    """36-point IMDCT matrix composed with the block window — closed
    form per ISO: x[i] = Σ_k X[k] cos(π/72 (2i+1+18)(2k+1))."""
    import numpy as np

    i = np.arange(36)[:, None]
    k = np.arange(18)[None, :]
    m = np.cos(np.pi / 72.0 * (2 * i + 1 + 18) * (2 * k + 1))
    if block_type == 0:
        w = np.sin(np.pi / 36.0 * (np.arange(36) + 0.5))
    elif block_type == 1:  # start
        w = np.ones(36)
        w[:18] = np.sin(np.pi / 36.0 * (np.arange(18) + 0.5))
        w[24:30] = np.sin(np.pi / 12.0 * (np.arange(6) + 0.5) + np.pi / 2.0)
        w[30:] = 0.0
    elif block_type == 3:  # stop
        w = np.ones(36)
        w[:6] = 0.0
        w[6:12] = np.sin(np.pi / 12.0 * (np.arange(6) + 0.5))
        w[18:] = np.sin(np.pi / 36.0 * (np.arange(18, 36) + 0.5))
    else:
        raise ValueError("long-window matrix asked for block_type 2")
    return m * w[:, None]


def _imdct12():
    import numpy as np

    i = np.arange(12)[:, None]
    k = np.arange(6)[None, :]
    m = np.cos(np.pi / 24.0 * (2 * i + 1 + 6) * (2 * k + 1))
    w = np.sin(np.pi / 12.0 * (np.arange(12) + 0.5))
    return m * w[:, None]


_MATRIX_CACHE: dict = {}


def _long_matrix(bt: int):
    key = ("long", bt)
    if key not in _MATRIX_CACHE:
        _MATRIX_CACHE[key] = _imdct_win(bt)
    return _MATRIX_CACHE[key]


def _short_matrix():
    if "short" not in _MATRIX_CACHE:
        _MATRIX_CACHE["short"] = _imdct12()
    return _MATRIX_CACHE["short"]


def _hybrid_synthesis(xr, block_type, overlap):
    """576 spectral → 32 subbands × 18 time samples, with overlap-add
    state ``overlap`` (32×18, mutated) and frequency inversion."""
    import numpy as np

    ss = np.empty((32, 18))
    for sb in range(32):
        X = xr[sb * 18 : (sb + 1) * 18]
        if block_type == 2:
            m = _short_matrix()
            out36 = np.zeros(36)
            for w in range(3):
                xs = m @ X[w::3]  # window-major after reorder: freq-major triplets
                out36[6 + 6 * w : 18 + 6 * w] += xs
        else:
            out36 = _long_matrix(block_type) @ X
        ss[sb] = out36[:18] + overlap[sb]
        overlap[sb] = out36[18:]
    # frequency inversion: odd time samples of odd subbands negate
    ss[1::2, 1::2] *= -1.0
    return ss


def synthesis_prototype(taps: int = 512):
    """Closed-form near-PR prototype for the 32-band synthesis bank:
    Hann-windowed sinc at cutoff π/64, passband gain calibrated to 1 by
    probing the bank with a unit subband-0 tone. NOT ISO Table B.3 —
    see the module docstring for what that means."""
    import numpy as np

    n = np.arange(taps, dtype=np.float64)
    x = (n - (taps - 1) / 2.0) / 64.0
    h = np.sinc(x) * (0.5 - 0.5 * np.cos(2.0 * np.pi * (n + 0.5) / taps))
    # calibrate: steady-state response to S[k=0] = 1 must peak at 1
    M = _mod_matrices(h)
    hist = np.zeros((16, 32))
    peak = 0.0
    for _ in range(64):
        hist[1:] = hist[:-1]
        hist[0] = 0.0
        hist[0, 0] = 1.0
        out = np.einsum("pjk,pk->j", M, hist)
        peak = max(peak, float(np.max(np.abs(out))))
    return h / peak


def _mod_matrices(h):
    """M[p][j, k] = 32·h[32p+j]·cos((2k+1)(32p+j+16)π/64) — the direct
    cosine-modulated form of the spec's V/U/D synthesis."""
    import numpy as np

    p = np.arange(16)[:, None, None]
    j = np.arange(32)[None, :, None]
    k = np.arange(32)[None, None, :]
    n = 32 * p + j
    return 32.0 * h[n.squeeze(-1)][..., None] * np.cos(
        (2 * k + 1) * (n + 16) * np.pi / 64.0
    )


_PROTO_CACHE: dict = {}


def _synthesis_matrices(synth_window=None):
    import numpy as np

    if synth_window is not None:
        return _mod_matrices(np.asarray(synth_window, dtype=np.float64))
    if "M" not in _PROTO_CACHE:
        _PROTO_CACHE["M"] = _mod_matrices(synthesis_prototype())
    return _PROTO_CACHE["M"]


class _Synth:
    """Per-channel polyphase synthesis state (16-slot subband history)."""

    def __init__(self, M) -> None:
        import numpy as np

        self.M = M
        self.hist = np.zeros((16, 32))

    def run(self, ss):
        """ss: 32×18 subband samples → 576 PCM samples. The 18 time
        slots are one batched einsum over a strided history view (the
        filter is a 16-tap convolution of 32×32 matrices over slots)."""
        import numpy as np

        # slots in time order: [slot(-15) … slot(-1), c0 … c17];
        # hist[p] holds slot(-1-p), so hist[14::-1] is slot(-15)…slot(-1)
        pad = np.concatenate([self.hist[14::-1], ss.T], axis=0)  # (33, 32)
        # windows W[t, k, j] = pad[t + j, k]; X[t, p] = slot(t - p)
        # = pad[t + 15 - p] = W[t, :, 15 - p]
        W = np.lib.stride_tricks.sliding_window_view(pad, 16, axis=0)
        out = np.einsum("pjk,tkp->tj", self.M, W[:, :, ::-1])
        self.hist = pad[:16:-1].copy()  # pad[32 - p] = slot(17 - p)
        return out.reshape(-1)


def _find_first_frame(b: bytes) -> int:
    i = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        i = 10 + (((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14)
                  | ((b[8] & 0x7F) << 7) | (b[9] & 0x7F))
    scan_end = min(len(b) - 4, i + 65536)
    while i <= scan_end:
        if b[i] == 0xFF and (b[i + 1] & 0xE0) == 0xE0:
            h = _parse_frame_header(b, i)
            if h is not None:
                return i
        i += 1
    raise ValueError("no MPEG-1 Layer III frame sync")


def _parse_frame_header(b: bytes, i: int):
    """(frame_len, sr, channels, crc) or None if not a valid MPEG-1
    Layer III header at i."""
    if i + 4 > len(b):
        return None
    h1, h2, h3 = b[i + 1], b[i + 2], b[i + 3]
    if b[i] != 0xFF or (h1 & 0xE0) != 0xE0:
        return None
    version = (h1 >> 3) & 3
    layer = (h1 >> 1) & 3
    if layer != 1:
        return None
    if version != 3:
        raise _Unsupported("MPEG-2/2.5 sample decode outside subset")
    br_idx, sr_idx, padding = h2 >> 4, (h2 >> 2) & 3, (h2 >> 1) & 1
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    sr = _SAMPLERATE_V1[sr_idx]
    frame_len = 144 * _BITRATE_V1_L3[br_idx] * 1000 // sr + padding
    channels = 1 if ((h3 >> 6) & 3) == 3 else 2
    mode = (h3 >> 6) & 3
    mode_ext = (h3 >> 4) & 3
    crc = not (h1 & 1)
    return frame_len, sr, channels, mode, mode_ext, crc


def decode_mp3_samples(payload: bytes, synth_window=None):
    """Full-stream decode: returns ``(sample_rate, channels, samples)``
    with samples an (n, channels) float64 array in ~[-1, 1] units.
    Raises ValueError for non-MP3 payloads and ``_Unsupported``
    (a ValueError) for streams outside the documented subset."""
    import numpy as np

    if payload is None or len(payload) < 4:
        raise ValueError("not an MP3 payload")
    b = bytes(payload)
    start = _find_first_frame(b)
    first = _parse_frame_header(b, start)
    frame_len0, sr0, ch0 = first[0], first[1], first[2]

    M = _synthesis_matrices(synth_window)
    synths = [_Synth(M) for _ in range(ch0)]
    overlaps = [np.zeros((32, 18)) for _ in range(ch0)]
    reservoir = bytearray()
    chunks: list = []  # (reservoir_offset_of_chunk_start)
    out_blocks: list = []
    i = start
    n_frames = 0
    while i + 4 <= len(b) and n_frames < _MAX_FRAMES:
        hdr = _parse_frame_header(b, i)
        if hdr is None:
            break
        frame_len, sr, channels, mode, mode_ext, crc = hdr
        if sr != sr0 or channels != ch0:
            raise _Unsupported("mid-stream format change")
        if mode == 1 and mode_ext & 1:
            raise _Unsupported("intensity stereo outside subset")
        if i + frame_len > len(b):
            break  # truncated tail frame
        side_len = 17 if channels == 1 else 32
        pos = i + 4 + (2 if crc else 0)
        if pos + side_len > len(b):
            break
        if n_frames == 0 and b[pos + side_len : pos + side_len + 4] in (
            b"Xing", b"Info"
        ):
            # VBR header frame: metadata, not audio — skip it whole
            # (real decoders do; its "granules" carry the Xing block)
            i += frame_len
            continue
        si = _read_side_info(b[pos : pos + side_len], channels)
        main_start_in_res = len(reservoir) - si["main_data_begin"]
        reservoir.extend(b[pos + side_len : i + frame_len])
        if main_start_in_res < 0:
            # reservoir underrun — normal at stream start; emit silence
            out_blocks.append(np.zeros((1152, channels)))
            i += frame_len
            n_frames += 1
            continue
        br = _BitReader(bytes(reservoir), main_start_in_res * 8)
        frame_pcm = np.empty((1152, channels))
        prev_long_sf = [None] * channels
        for gr in range(2):
            grx = []
            for ch in range(channels):
                g = si["granules"][gr][ch]
                gstart = br.bitpos
                long_sf, short_sf = _read_scalefactors(
                    br, g, gr, si["scfsi"][ch], prev_long_sf[ch]
                )
                if not (g["window_switching"] and g["block_type"] == 2):
                    prev_long_sf[ch] = long_sf
                end_bit = gstart + g["part2_3_length"]
                is_ = _decode_huffman(br, g, sr, end_bit)
                xr = _requantize(is_, g, sr, long_sf, short_sf)
                if g["window_switching"] and g["block_type"] == 2:
                    xr = _reorder_short(xr, sr)
                grx.append(xr)
            if channels == 2 and mode == 1 and mode_ext & 2:  # M/S
                m, s = grx[0].copy(), grx[1].copy()
                inv = 1.0 / math.sqrt(2.0)
                grx[0] = (m + s) * inv
                grx[1] = (m - s) * inv
            for ch in range(channels):
                g = si["granules"][gr][ch]
                xr = grx[ch]
                if g["block_type"] != 2:
                    xr = _alias_reduce(xr)
                ss = _hybrid_synthesis(xr, g["block_type"], overlaps[ch])
                frame_pcm[gr * 576 : (gr + 1) * 576, ch] = synths[ch].run(ss)
        out_blocks.append(frame_pcm)
        # trim the reservoir: keep at most 511 bytes of history (the
        # 9-bit main_data_begin can never point further back)
        if len(reservoir) > 4096:
            del reservoir[:-512]
        i += frame_len
        n_frames += 1
        if n_frames * 1152 > _MAX_SAMPLES:
            raise ValueError("MP3 stream exceeds decode budget")
    if not out_blocks:
        raise ValueError("no decodable MP3 frames")
    return sr0, ch0, np.vstack(out_blocks)


# ---------------------------------------------------------------------------
# Fixture encoder — spec-valid CBR MPEG-1 Layer III frames for the
# oracle-able classes (silence: zero main data; small-table nonzero:
# huffman table 1 + count1 table B). This is a FIXTURE GENERATOR, not a
# general encoder: no psychoacoustics, no reservoir use.
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def pad_to(self, nbytes: int) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)
        while len(self.out) < nbytes:
            self.out.append(0)


def _encode_granule_bits(w: _BitWriter, pairs, quads, global_gain: int) -> int:
    """Write one granule's main data (huffman table 1 pairs + count1
    table B quads, all scalefactors absent at scalefac_compress=0);
    returns part2_3_length in bits."""
    start = len(w.out) * 8 + w.nbits
    inv_code = {v: c for c, v in _HUFF_PAIR_CODES[1].items()}
    for x, y in pairs:
        code = inv_code[(abs(x), abs(y))]
        for bch in code:
            w.write(int(bch), 1)
        if x:
            w.write(1 if x < 0 else 0, 1)
        if y:
            w.write(1 if y < 0 else 0, 1)
    for quad in quads:
        v = 0
        for q in quad:
            v = (v << 1) | (1 if q else 0)
        w.write((~v) & 0xF, 4)
        for q in quad:
            if q:
                w.write(1 if q < 0 else 0, 1)
    return (len(w.out) * 8 + w.nbits) - start


def encode_mp3_frames(
    sr: int = 44100,
    channels: int = 1,
    n_frames: int = 2,
    bitrate_idx: int = 9,
    granule_payload=None,
    global_gain: int = 210,
    vbr_pattern: list[int] | None = None,
    xing: bool = False,
) -> bytes:
    """Build ``n_frames`` spec-valid MPEG-1 Layer III audio frames.
    ``granule_payload`` is None for silence, else ``(pairs, quads)``
    written identically into every granule/channel (big_values =
    len(pairs), count1 region = len(quads) quads, long blocks, all
    scalefactors zero, table 1 / count1 table B). ``vbr_pattern``
    cycles per-frame bitrate indexes (the VBR form); ``xing`` prepends
    a non-audio Xing frame (at ``bitrate_idx``) whose frames field is
    ``n_frames`` — the LAME/real-world VBR header."""
    sr_idx = _SAMPLERATE_V1.index(sr)
    mode = 3 if channels == 1 else 0
    side_len = 17 if channels == 1 else 32

    def header_for(br_idx: int) -> tuple[bytes, int]:
        bitrate = _BITRATE_V1_L3[br_idx] * 1000
        return bytes([
            0xFF,
            0xE0 | (3 << 3) | (1 << 1) | 1,  # MPEG-1, Layer III, no CRC
            (br_idx << 4) | (sr_idx << 2),
            mode << 6,
        ]), 144 * bitrate // sr  # no padding bit used

    pairs, quads = granule_payload if granule_payload else ([], [])
    out = bytearray()
    if xing:
        hdr, flen = header_for(bitrate_idx)
        body = bytearray(flen - 4)
        # zeroed side info, then the Xing block: magic + flags + frames
        body[side_len : side_len + 4] = b"Xing"
        body[side_len + 4 : side_len + 8] = (1).to_bytes(4, "big")
        body[side_len + 8 : side_len + 12] = n_frames.to_bytes(4, "big")
        out += hdr + bytes(body)
    for k in range(n_frames):
        br_idx = vbr_pattern[k % len(vbr_pattern)] if vbr_pattern else bitrate_idx
        header, frame_len = header_for(br_idx)
        md = _BitWriter()
        p23 = [
            [_encode_granule_bits(md, pairs, quads, global_gain)
             for _ in range(channels)]
            for _ in range(2)
        ]
        sw = _BitWriter()
        sw.write(0, 9)  # main_data_begin
        sw.write(0, 5 if channels == 1 else 3)
        for _ in range(channels):
            sw.write(0, 4)  # scfsi
        for gr in range(2):
            for ch in range(channels):
                sw.write(p23[gr][ch], 12)
                sw.write(len(pairs), 9)  # big_values
                sw.write(global_gain, 8)
                sw.write(0, 4)  # scalefac_compress
                sw.write(0, 1)  # window_switching
                sw.write(1 if pairs else 0, 5)  # table_select[0]
                sw.write(0, 5)
                sw.write(0, 5)
                sw.write(15, 4)  # region0_count: all big_values in region 0
                sw.write(0, 3)
                sw.write(0, 1)  # preflag
                sw.write(0, 1)  # scalefac_scale
                sw.write(1, 1)  # count1table_select = B
        sw.pad_to(side_len)
        md.pad_to(frame_len - 4 - side_len)
        out += header + bytes(sw.out) + bytes(md.out)
    return bytes(out)
