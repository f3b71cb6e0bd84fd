"""Pure-python FLAC frame/sample codec — the fixture-grade subset that
lets the audio signal-feature lane (rms/peak/ZCR) exist for a COMPRESSED
format, not just WAV.

Scope (public FLAC format spec, https://xiph.org/flac/format.html):

- ``decode_flac_samples``: CONSTANT, VERBATIM, FIXED-predictor
  (orders 0-4) AND LPC subframes (orders 1-32, quantized coefficients +
  arithmetic shift — the form nearly all real-world FLAC uses) with
  Rice/Rice2 residual coding (incl. the escape-to-raw partition form),
  wasted-bits shifts, all four channel assignments (independent,
  left/side, right/side, mid/side — side channels carry bps+1),
  CRC-8-validated frame headers and CRC-16-validated frames. Reserved
  subframe types / negative qlp shifts raise ValueError; in the
  signal-feature lane that degrades the ROW to NULL features, never the
  job (same contract as every other media decoder here).
- ``encode_flac``: the matching fixture generator (same role as
  encode_png / encode_jpeg): frame-split input, CONSTANT / VERBATIM /
  FIXED (order picked by residual cost) / quantized-LPC subframes,
  single-partition Rice residuals, independent or mid/side stereo,
  spec-correct CRCs. Every decoder path is exercised by round-tripping
  encoder output and by bit-level rejection tests
  (tests/test_flaccodec.py).

Reference scope: the reference engine (process_adcp.py) has no audio
surface; this belongs to the LLM-pipeline multimodal lane (SURVEY §6).

Hardening contract (per-row degrade): every claimed count is bounded by
the container size before allocation — STREAMINFO totals, frame block
sizes and Rice quotients can't make one crafted payload OOM an executor;
corrupt structure raises ValueError, never MemoryError/ZeroDivisionError.
"""

from __future__ import annotations

import struct

# spec caps: block size is 16 bits, total decoded cells bounded far above
# any fixture but far below executor memory
_MAX_BLOCK = 65535
_MAX_CELLS = 1 << 26


def _crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — FLAC frame-header CRC."""
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — FLAC frame CRC."""
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitReader:
    """MSB-first bit reader with byte-position access (CRC spans)."""

    def __init__(self, data: bytes, byte_pos: int = 0) -> None:
        self.data = data
        self.pos = byte_pos  # byte index
        self.bit = 0  # bits consumed within data[pos]

    def read(self, n: int) -> int:
        out = 0
        while n > 0:
            if self.pos >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - self.bit
            take = min(n, avail)
            cur = self.data[self.pos]
            out = (out << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            n -= take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if n and v >> (n - 1) else v

    def read_unary(self) -> int:
        """Count of 0 bits before the terminating 1 bit."""
        n = 0
        while True:
            if self.read(1):
                return n
            n += 1
            if n > 8 * len(self.data):
                raise ValueError("FLAC unary run exceeds payload")

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


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

    def write_unary(self, n: int) -> None:
        while n >= 32:
            self.write(0, 32)
            n -= 32
        self.write(1, n + 1)  # n zeros then a one

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


def _utf8_number(n: int) -> bytes:
    """FLAC's extended-UTF-8 coding of frame/sample numbers."""
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > 6 * (nbytes - 1) + (7 - nbytes) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for k in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_number(br: _BitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("corrupt FLAC UTF-8 frame number")
    val = first & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        cont = br.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("corrupt FLAC UTF-8 continuation")
        val = (val << 6) | (cont & 0x3F)
    return val


# fixed predictor residual: residual = sum of coeff * history (order 0-4)
_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCK_SIZE_TABLE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}

_SAMPLE_SIZE_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_SAMPLE_RATE_TABLE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def _parse_streaminfo(b: bytes) -> tuple[int, int, int, int, int]:
    """→ (sample_rate, channels, bits, total_samples, first_frame_pos)."""
    if len(b) < 4 or b[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    i = 4
    info = None
    while i + 4 <= len(b):
        hdr = b[i]
        length = int.from_bytes(b[i + 1 : i + 4], "big")
        if i + 4 + length > len(b):
            raise ValueError("FLAC metadata block exceeds payload")
        block = b[i + 4 : i + 4 + length]
        if (hdr & 0x7F) == 0:
            if len(block) < 18:
                raise ValueError("short FLAC STREAMINFO")
            sr = (block[10] << 12) | (block[11] << 4) | (block[12] >> 4)
            ch = ((block[12] >> 1) & 0x07) + 1
            bits = (((block[12] & 1) << 4) | (block[13] >> 4)) + 1
            total = ((block[13] & 0x0F) << 32) | int.from_bytes(block[14:18], "big")
            info = (sr, ch, bits, total)
        i += 4 + length
        if hdr & 0x80:  # last-metadata-block flag
            break
    if info is None:
        raise ValueError("FLAC without STREAMINFO")
    sr, ch, bits, total = info
    if sr == 0 or ch == 0:
        raise ValueError("corrupt FLAC STREAMINFO")
    # bound the claimed total by what the container could possibly hold:
    # even a CONSTANT subframe costs ≥ ~10 bytes per (frame, channel), so
    # a 1 KB payload claiming 2^36 samples is a bomb, not a file
    if total * ch > _MAX_CELLS:
        raise ValueError(f"FLAC raster too large for in-memory decode ({total}x{ch})")
    return sr, ch, bits, total, i


def _decode_residual(br: _BitReader, block_size: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    plen = 4 + method  # rice params are 4 bits (method 0) or 5 (method 1)
    escape = (1 << plen) - 1
    porder = br.read(4)
    nparts = 1 << porder
    # spec: block_size must divide evenly; the first partition holds
    # block_size/2^p - order samples, which must be non-negative
    if block_size % nparts or (block_size >> porder) < order:
        raise ValueError("corrupt FLAC partition order")
    res: list[int] = []
    for p in range(nparts):
        n = (block_size >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("corrupt FLAC partition order")
        param = br.read(plen)
        if param == escape:
            raw = br.read(5)
            for _ in range(n):
                res.append(br.read_signed(raw) if raw else 0)
        else:
            for _ in range(n):
                q = br.read_unary()
                v = (q << param) | br.read(param)
                res.append(-(v >> 1) - 1 if v & 1 else v >> 1)
    return res


def _decode_subframe(br: _BitReader, block_size: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("corrupt FLAC subframe padding bit")
    ftype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
        if wasted >= bps:
            raise ValueError("FLAC wasted bits exceed sample size")
        bps -= wasted
    if ftype == 0:  # CONSTANT
        out = [br.read_signed(bps)] * block_size
    elif ftype == 1:  # VERBATIM
        out = [br.read_signed(bps) for _ in range(block_size)]
    elif 8 <= ftype <= 12:  # FIXED, order 0-4
        order = ftype - 8
        if order > block_size:
            raise ValueError("FLAC fixed order exceeds block size")
        out = [br.read_signed(bps) for _ in range(order)]
        res = _decode_residual(br, block_size, order)
        coeffs = _FIXED_COEFFS[order]
        for r in res:
            pred = 0
            for k, c in enumerate(coeffs):
                pred += c * out[-1 - k]
            out.append(r + pred)
    elif ftype >= 32:  # LPC, order 1-32
        order = ftype - 31
        if order > block_size:
            raise ValueError("FLAC LPC order exceeds block size")
        out = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4)
        if prec == 15:
            raise ValueError("invalid FLAC qlp precision")
        prec += 1
        shift = br.read(5)
        if shift >> 4:  # 5-bit signed; negative shifts are spec-dead
            raise ValueError("negative FLAC qlp shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _decode_residual(br, block_size, order)
        for r in res:
            pred = 0
            for k, c in enumerate(coefs):
                pred += c * out[-1 - k]
            # arithmetic shift (python >> floors negatives = the spec's
            # arithmetic-shift-right on the accumulated prediction)
            out.append(r + (pred >> shift))
    else:
        raise ValueError(f"reserved FLAC subframe type {ftype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac_samples(payload: bytes) -> tuple[int, int, "object"]:
    """Decode a FLAC stream's samples: ``(sample_rate, channels,
    int32 ndarray [n_frames, channels])``. See module docstring for the
    supported subset; anything outside it raises ValueError."""
    import numpy as np

    if payload is None:
        raise ValueError("not a FLAC payload")
    b = bytes(payload)
    sr, ch, bits, total, pos = _parse_streaminfo(b)
    channels_data: list[list[int]] = [[] for _ in range(ch)]
    decoded = 0
    while pos + 2 <= len(b) and (total == 0 or decoded < total):
        hdr_start = pos
        br = _BitReader(b, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError("FLAC frame sync lost")
        if br.read(1):
            raise ValueError("reserved FLAC frame bit set")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("reserved FLAC frame bit set")
        _read_utf8_number(br)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        elif bs_code == 6:
            block_size = br.read(8) + 1
        elif bs_code == 7:
            block_size = br.read(16) + 1
        else:
            block_size = _BLOCK_SIZE_TABLE[bs_code]
        if sr_code == 0:
            pass  # from STREAMINFO
        elif sr_code in _SAMPLE_RATE_TABLE:
            pass  # informative duplicate of STREAMINFO
        elif sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        else:
            raise ValueError("invalid FLAC sample rate code")
        if ss_code == 0:
            bps = bits
        elif ss_code in _SAMPLE_SIZE_TABLE:
            bps = _SAMPLE_SIZE_TABLE[ss_code]
        else:
            raise ValueError("reserved FLAC sample size code")
        br.align()
        header_bytes = b[hdr_start : br.pos]
        crc8 = br.read(8)
        if _crc8(header_bytes) != crc8:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        if block_size > _MAX_BLOCK or (decoded + block_size) * ch > _MAX_CELLS:
            raise ValueError("FLAC frame exceeds decode budget")
        # channel layout
        if ch_code <= 7:
            n_sub = ch_code + 1
            if n_sub != ch:
                raise ValueError("FLAC frame channel count != STREAMINFO")
            subs = [_decode_subframe(br, block_size, bps) for _ in range(n_sub)]
        elif ch_code in (8, 9, 10):
            if ch != 2:
                raise ValueError("FLAC stereo decorrelation on non-stereo stream")
            # the DIFFERENCE channel carries bps+1
            if ch_code == 8:  # left/side
                left = _decode_subframe(br, block_size, bps)
                side = _decode_subframe(br, block_size, bps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _decode_subframe(br, block_size, bps + 1)
                right = _decode_subframe(br, block_size, bps)
                subs = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side
                mid = _decode_subframe(br, block_size, bps)
                side = _decode_subframe(br, block_size, bps + 1)
                subs = [[], []]
                for m, s in zip(mid, side):
                    t = (m << 1) | (s & 1)
                    subs[0].append((t + s) >> 1)
                    subs[1].append((t - s) >> 1)
        else:
            raise ValueError("reserved FLAC channel assignment")
        br.align()
        frame_bytes = b[hdr_start : br.pos]
        crc16 = br.read(16)
        if _crc16(frame_bytes) != crc16:
            raise ValueError("FLAC frame CRC-16 mismatch")
        for c in range(ch):
            channels_data[c].extend(subs[c])
        decoded += block_size
        pos = br.pos
    if total and decoded < total:
        raise ValueError("FLAC stream truncated before claimed total")
    if total:
        channels_data = [c[:total] for c in channels_data]
    samples = np.array(channels_data, dtype=np.int64).T.astype(np.int32)
    if samples.size == 0:
        samples = samples.reshape(0, ch)
    return sr, ch, samples


def _best_fixed_order(chan: list[int], max_order: int = 4) -> int:
    """Pick the fixed-predictor order minimizing sum |residual| — the
    standard cheap heuristic (any choice is spec-valid)."""
    best, best_cost = 0, None
    for order in range(min(max_order, len(chan)) + 1):
        coeffs = _FIXED_COEFFS[order]
        cost = 0
        for i in range(order, len(chan)):
            pred = sum(c * chan[i - 1 - k] for k, c in enumerate(coeffs))
            cost += abs(chan[i] - pred)
        if best_cost is None or cost < best_cost:
            best, best_cost = order, cost
    return best


def _rice_param(residuals: list[int]) -> int:
    if not residuals:
        return 0
    mean = sum(abs(r) for r in residuals) / len(residuals)
    k = 0
    while (1 << k) < mean + 1 and k < 14:
        k += 1
    return k


def _quantize_lpc(coefs: list[float], precision: int = 12) -> tuple[list[int], int]:
    """Quantize float predictor coefficients to ``precision``-bit signed
    ints with a common right-shift (any quantization is spec-valid —
    prediction quality only affects ratio, never correctness)."""
    cmax = max(abs(c) for c in coefs) or 1.0
    shift = 14
    lim = (1 << (precision - 1)) - 1
    while shift > 0 and cmax * (1 << shift) > lim:
        shift -= 1
    q = [max(-lim - 1, min(lim, round(c * (1 << shift)))) for c in coefs]
    return q, shift


def _encode_subframe(
    bw: _BitWriter,
    chan: list[int],
    bps: int,
    subframe: str,
    lpc_coefs: list[float] | None = None,
) -> None:
    if subframe == "auto" and len(set(chan)) == 1:
        subframe = "constant"
    if subframe == "lpc":
        coefs = lpc_coefs or [1.6, -0.6]  # gentle 2-tap default
        order = len(coefs)
        if len(chan) <= order:
            subframe = "verbatim"  # too short for warmup — still valid
        else:
            qc, shift = _quantize_lpc(coefs)
            prec = 12
            res = [
                chan[i]
                - (sum(c * chan[i - 1 - k] for k, c in enumerate(qc)) >> shift)
                for i in range(order, len(chan))
            ]
            bw.write(0, 1)
            bw.write(31 + order, 6)
            bw.write(0, 1)
            for v in chan[:order]:
                bw.write(v, bps)
            bw.write(prec - 1, 4)
            bw.write(shift, 5)
            for c in qc:
                bw.write(c, prec)
            bw.write(0, 2)  # residual method 0
            bw.write(0, 4)  # partition order 0
            param = _rice_param(res)
            bw.write(param, 4)
            for r in res:
                z = (-r << 1) - 1 if r < 0 else r << 1
                bw.write_unary(z >> param)
                if param:
                    bw.write(z, param)
            return
    if subframe == "constant":
        bw.write(0, 1)
        bw.write(0, 6)
        bw.write(0, 1)
        bw.write(chan[0], bps)
        return
    if subframe == "verbatim":
        bw.write(0, 1)
        bw.write(1, 6)
        bw.write(0, 1)
        for v in chan:
            bw.write(v, bps)
        return
    # fixed: order by residual cost, single rice partition
    order = _best_fixed_order(chan)
    coeffs = _FIXED_COEFFS[order]
    res = [
        chan[i] - sum(c * chan[i - 1 - k] for k, c in enumerate(coeffs))
        for i in range(order, len(chan))
    ]
    bw.write(0, 1)
    bw.write(8 + order, 6)
    bw.write(0, 1)
    for v in chan[:order]:
        bw.write(v, bps)
    bw.write(0, 2)  # residual method 0 (4-bit rice)
    bw.write(0, 4)  # partition order 0
    param = _rice_param(res)
    bw.write(param, 4)
    for r in res:
        z = (-r << 1) - 1 if r < 0 else r << 1  # zigzag
        bw.write_unary(z >> param)
        if param:
            bw.write(z, param)


def encode_flac(
    sample_rate: int,
    samples,
    bits: int = 16,
    block_size: int = 1024,
    subframe: str = "auto",
    stereo: str = "independent",
    lpc_coefs: list[float] | None = None,
    tags: list[tuple[str, str]] | None = None,
) -> bytes:
    """Fixture-grade FLAC encoder (see module docstring). ``samples`` is
    an int array-like shaped [n, channels]; ``subframe`` one of ``auto``
    (constant where flat, else fixed), ``verbatim``, ``fixed``,
    ``constant``, ``lpc`` (quantized-coefficient predictor —
    ``lpc_coefs`` floats, default a gentle 2-tap); ``stereo``
    ``independent`` or ``mid_side`` (2ch only); ``tags`` an ordered
    (KEY, value) list emitted as a VORBIS_COMMENT metadata block (the
    FLAC tag container — little-endian lengths, UTF-8 text, unlike the
    big-endian rest of the stream). Emits STREAMINFO [+ VORBIS_COMMENT]
    + fixed-blocksize frames; spec-correct CRC-8/16."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    if not 1 <= ch <= 8:
        raise ValueError("FLAC supports 1-8 channels")
    if stereo == "mid_side" and ch != 2:
        raise ValueError("mid_side requires 2 channels")
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    if arr.size and (arr.min() < lo or arr.max() > hi):
        raise ValueError(f"samples exceed {bits}-bit range")

    # STREAMINFO
    si = bytearray(34)
    si[0:2] = block_size.to_bytes(2, "big")  # min block
    si[2:4] = block_size.to_bytes(2, "big")  # max block
    si[10] = (sample_rate >> 12) & 0xFF
    si[11] = (sample_rate >> 4) & 0xFF
    si[12] = ((sample_rate & 0x0F) << 4) | ((ch - 1) << 1) | ((bits - 1) >> 4)
    si[13] = (((bits - 1) & 0x0F) << 4) | ((n >> 32) & 0x0F)
    si[14:18] = (n & 0xFFFFFFFF).to_bytes(4, "big")
    out = bytearray(b"fLaC")
    if tags is None:
        out += bytes([0x80]) + len(si).to_bytes(3, "big") + bytes(si)
    else:
        out += bytes([0x00]) + len(si).to_bytes(3, "big") + bytes(si)
        vendor = b"seaexplorertools_spark"
        vc = bytearray(len(vendor).to_bytes(4, "little") + vendor)
        vc += len(tags).to_bytes(4, "little")
        for k, v in tags:
            field = f"{k}={v}".encode("utf-8")
            vc += len(field).to_bytes(4, "little") + field
        out += bytes([0x84]) + len(vc).to_bytes(3, "big") + bytes(vc)

    ss_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}.get(bits)
    if ss_code is None:
        raise ValueError(f"unsupported FLAC bits {bits}")
    frame_no = 0
    for start in range(0, n, block_size):
        blk = arr[start : start + block_size]
        bs = len(blk)
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)
        bw.write(7, 4)  # block size: 16-bit value - 1 follows header
        bw.write(0, 4)  # sample rate: from STREAMINFO
        ch_code = 10 if stereo == "mid_side" else ch - 1
        bw.write(ch_code, 4)
        bw.write(ss_code, 3)
        bw.write(0, 1)
        for byte in _utf8_number(frame_no):
            bw.write(byte, 8)
        bw.write(bs - 1, 16)
        bw.align()
        hdr = bw.bytes()
        body = _BitWriter()
        if stereo == "mid_side":
            left = blk[:, 0].tolist()
            right = blk[:, 1].tolist()
            mid = [(l + r) >> 1 for l, r in zip(left, right)]
            side = [l - r for l, r in zip(left, right)]
            _encode_subframe(body, mid, bits, subframe, lpc_coefs)
            _encode_subframe(body, side, bits + 1, subframe, lpc_coefs)
        else:
            for c in range(ch):
                _encode_subframe(body, blk[:, c].tolist(), bits, subframe, lpc_coefs)
        body.align()
        frame = hdr + bytes([_crc8(hdr)]) + body.bytes()
        frame += _crc16(frame).to_bytes(2, "big")
        out += frame
        frame_no += 1
    return bytes(out)
