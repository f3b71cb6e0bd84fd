"""Pure-python/numpy baseline JPEG codec — no PIL, no libjpeg.

Decoder: baseline sequential DCT (SOF0/1) AND progressive (SOF2 —
spectral selection + successive approximation, EOB runs; see
``_ProgressiveState``), 8-bit, 1- or 3-component, arbitrary sampling
factors (4:4:4, 4:2:2, 4:2:0, ...), restart markers (DRI/RSTn),
byte-stuffing. Raises ValueError for lossless, arithmetic-coded, 12-bit,
or hierarchical streams — the loud boundary where a real deployment
brings PIL/libjpeg-turbo (absent in this container). JPEG dominates
image corpora and a large share of web JPEGs are progressive, so the
real-pixel lane covers both; the mixed-corpus plumbing degrades per-row
on anything this decoder rejects.

Encoder: minimal spec-valid baseline writer (grayscale or RGB in 4:4:4 /
4:2:0) used by tests to hand-assemble known-pixel JPEGs and by the
contract adapter to synthesize deterministic payloads. It emits its own
canonical Huffman tables (every used symbol at one code length — legal
and trivially decodable) and an all-ones quantization table by default,
which makes flat 8×8 blocks decode EXACTLY (DC = 8·(v-128) is exact in
float64; every AC quantizes to 0), the property the exact SQL oracle in
``mm_image_features`` relies on.

Everything here is from the public ITU T.81 spec (zigzag order, Huffman
canonicalization, MCU interleave, level shift) and the JFIF BT.601
color transform. All DCT math is numpy (vectorized per 8×8 block); the
bit-level entropy coding is plain python — fine for the Arrow-batched
``mapInPandas`` lane where each worker decodes its own rows.
"""

from __future__ import annotations

import numpy as np


def _zigzag():
    out = []
    for s in range(15):
        rng = (
            range(min(s, 7), max(0, s - 7) - 1, -1)
            if s % 2 == 0
            else range(max(0, s - 7), min(s, 7) + 1)
        )
        for r in rng:
            out.append(r * 8 + (s - r))
    return out


ZIGZAG = _zigzag()  # zigzag position -> row-major block index

# orthonormal 8-point DCT-II matrix: spatial = A.T @ coef @ A
_A = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


class _BitReader:
    """MSB-first bit reader over one entropy-coded segment (already
    unstuffed, restart markers stripped)."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy segment exhausted mid-symbol")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _build_huffman(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman: {(code_length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    return v - ((1 << s) - 1) if s and v < (1 << (s - 1)) else v


def _split_entropy(b: bytes, i: int) -> tuple[list[bytes], int]:
    """Entropy-coded data from offset ``i``: unstuff FF00, split at RSTn,
    stop at any other marker. Returns (segments, offset_of_next_marker)."""
    segs, cur = [], bytearray()
    n = len(b)
    while i < n:
        c = b[i]
        if c == 0xFF and i + 1 < n:
            m = b[i + 1]
            if m == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:
                segs.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break
        cur.append(c)
        i += 1
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """Baseline-sequential OR progressive JPEG → ``(width, height,
    channels, raster)``; raster is row-major uint8 bytes (1 channel for
    grayscale, 3 for RGB via the JFIF BT.601 transform). Progressive
    streams (SOF2) accumulate coefficients across DC-first/DC-refine/
    AC-first/AC-refine scans (spectral selection + successive
    approximation, EOB runs) and render once at EOI. Mirrors
    ``decode_png_pixels``' contract."""
    if payload is None:
        raise ValueError("not a JPEG payload")
    b = bytes(payload)
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")

    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (w, h, [(cid, hi, vi, tq), ...])
    progressive = False
    prog = None  # _ProgressiveState once the first SOS arrives
    restart_interval = 0
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = b[i + 1]
        if marker == 0xD9:  # EOI
            if prog is not None:
                return prog.render(qt)
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seglen = int.from_bytes(b[i + 2 : i + 4], "big")
        seg = b[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                if pq:  # 16-bit table
                    vals = [
                        int.from_bytes(seg[j + 2 * k : j + 2 * k + 2], "big")
                        for k in range(64)
                    ]
                    j += 128
                else:
                    vals = list(seg[j : j + 64])
                    j += 64
                t = np.zeros(64)
                for z, v in enumerate(vals):
                    t[ZIGZAG[z]] = v
                qt[tq] = t.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            j = 0
            while j + 17 <= len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1 : j + 17])
                nsym = sum(bits)
                vals = seg[j + 17 : j + 17 + nsym]
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(bits, vals)
                j += 17 + nsym
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            if seg[0] != 8:
                raise ValueError("only 8-bit JPEG supported")
            progressive = marker == 0xC2
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for c in range(nc):
                o = 6 + 3 * c
                comps.append((seg[o], seg[o + 1] >> 4, seg[o + 1] & 15, seg[o + 2]))
            frame = (w, h, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding (SOF marker 0x{marker:02x}) — "
                "baseline sequential + progressive only; bring libjpeg for "
                "lossless/arithmetic/hierarchical"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []  # (component index in frame, dc table, ac table)
            w, h, comps = frame
            for s in range(ns):
                cid, tabs = seg[1 + 2 * s], seg[2 + 2 * s]
                ci = next(
                    (k for k, c in enumerate(comps) if c[0] == cid), None
                )
                if ci is None:
                    raise ValueError("JPEG scan references unknown component")
                scan.append((ci, tabs >> 4, tabs & 15))
            segs, after = _split_entropy(b, i + 2 + seglen)
            if not progressive:
                return _decode_scan(
                    frame, scan, segs, qt, huff_dc, huff_ac, restart_interval
                )
            if prog is None:
                prog = _ProgressiveState(frame)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah_al = seg[3 + 2 * ns]
            prog.decode_scan(
                scan, ss, se, ah_al >> 4, ah_al & 15,
                segs, huff_dc, huff_ac, restart_interval,
            )
            i = after
            continue
        i += 2 + seglen
    if prog is not None:  # tolerate a missing EOI after the last scan
        return prog.render(qt)
    raise ValueError("JPEG without SOS scan")


def _decode_scan(frame, scan, segs, qt, huff_dc, huff_ac, restart_interval):
    w, h, comps = frame
    if len(scan) != len(comps):
        raise ValueError("non-interleaved JPEG scans unsupported")
    if w == 0 or h == 0:
        raise ValueError("JPEG with zero dimension")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax == 0 or vmax == 0:
        raise ValueError("JPEG with zero sampling factor")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # size guards BEFORE any allocation — the per-row degradation contract
    # means a corrupt SOF claiming 30000×30000 in a 400-byte payload must
    # be a ValueError, never a MemoryError that kills the whole job.
    # (a) every 8×8 block consumes ≥2 entropy bits (1-bit DC code + 1-bit
    # EOB), so blocks > 4·entropy-bytes is structurally impossible;
    # (b) an absolute plane-cell cap bounds peak memory (~1 GiB float64)
    # far above any plausible photo — beyond it, bring a streaming decoder.
    n_blocks = mcux * mcuy * sum(hi * vi for _, hi, vi, _tq in comps)
    entropy_bytes = sum(len(s) for s in segs)
    if n_blocks > 4 * entropy_bytes + 64:
        raise ValueError(
            f"JPEG dimensions inconsistent with entropy data "
            f"({n_blocks} blocks vs {entropy_bytes} coded bytes)"
        )
    if n_blocks * 64 > (1 << 27):
        raise ValueError(
            f"JPEG raster too large for in-memory decode ({n_blocks * 64} cells)"
        )
    planes = []
    for _, hi, vi, _tq in comps:
        planes.append(np.zeros((mcuy * vi * 8, mcux * hi * 8)))

    seg_idx = 0
    reader = _BitReader(segs[0])
    pred = [0] * len(comps)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(segs):
                    raise ValueError("JPEG missing restart segment")
                reader = _BitReader(segs[seg_idx])
                pred = [0] * len(comps)
            for ci, tdc, tac in scan:
                _cid, hi, vi, tq = comps[ci]
                if tq not in qt or tdc not in huff_dc or tac not in huff_ac:
                    raise ValueError("JPEG scan references missing table")
                for by in range(vi):
                    for bx in range(hi):
                        coef = _decode_block(
                            reader, huff_dc[tdc], huff_ac[tac], pred, ci
                        )
                        block = _A.T @ (coef * qt[tq]) @ _A + 128.0
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            n_mcu += 1

    return _planes_to_pixels(w, h, comps, planes, hmax, vmax)


def _planes_to_pixels(w, h, comps, planes, hmax, vmax):
    """Upsample subsampled planes, crop to (w, h), apply the JFIF BT.601
    transform — shared by the sequential and progressive renderers."""
    out_planes = []
    for k, (_cid, hi, vi, _tq) in enumerate(comps):
        p = planes[k]
        if hi != hmax or vi != vmax:  # box upsample to full resolution
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        out_planes.append(p[:h, :w])

    if len(out_planes) == 1:
        gray = np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
        return w, h, 1, gray.tobytes()
    if len(out_planes) != 3:
        raise ValueError(f"unsupported JPEG component count {len(out_planes)}")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.rint(c), 0, 255).astype(np.uint8) for c in (r, g, bl)], axis=-1
    )
    return w, h, 3, rgb.tobytes()


def _decode_block(reader, dc_table, ac_table, pred, ci):
    coef = np.zeros(64)
    s = _huff_decode(reader, dc_table)
    diff = _extend(reader.read_bits(s), s) if s else 0
    pred[ci] += diff
    coef[0] = pred[ci]
    k = 1
    while k < 64:
        rs = _huff_decode(reader, ac_table)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC run past block end")
        coef[ZIGZAG[k]] = _extend(reader.read_bits(s), s)
        k += 1
    return coef.reshape(8, 8)


class _ProgressiveState:
    """Coefficient accumulator for progressive (SOF2) streams.

    Scans arrive as (spectral band [Ss, Se], successive-approximation
    bits Ah→Al) slices of each component's DCT coefficients; this class
    applies every scan type from the public T.81 §G.1.2 flow — DC first
    (interleaved or single-component), DC refinement (one bit per
    block), AC first (single-component, EOB runs), AC refinement
    (correction bits for nonzero history, run-coded new ±1·2^Al) — into
    per-component int32 coefficient grids, then renders once."""

    def __init__(self, frame):
        w, h, comps = frame
        if w == 0 or h == 0:
            raise ValueError("JPEG with zero dimension")
        self.w, self.h, self.comps = w, h, comps
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        if self.hmax == 0 or self.vmax == 0:
            raise ValueError("JPEG with zero sampling factor")
        self.mcux = -(-w // (8 * self.hmax))
        self.mcuy = -(-h // (8 * self.vmax))
        self.coef = []
        self.truedims = []  # (block_w, block_h) per component, non-interleaved
        n_blocks = 0
        for _cid, hi, vi, _tq in comps:
            bw, bh = self.mcux * hi, self.mcuy * vi
            n_blocks += bw * bh
            # non-interleaved scan dims: ceil(ceil(w·hi/hmax) / 8)
            tw = (-(-w * hi // self.hmax) + 7) // 8
            th = (-(-h * vi // self.vmax) + 7) // 8
            self.coef.append(np.zeros((bh, bw, 64), dtype=np.int64))
            self.truedims.append((tw, th))
        if n_blocks * 64 > (1 << 27):
            raise ValueError(
                f"JPEG raster too large for in-memory decode ({n_blocks * 64} cells)"
            )
        self.eobrun = 0

    # -- scan entry -------------------------------------------------------
    def decode_scan(self, scan, ss, se, ah, al, segs, huff_dc, huff_ac, ri):
        if ss == 0 and se != 0:
            raise ValueError("progressive JPEG scan mixes DC and AC bands")
        if ss > se or se > 63 or al > 13:
            raise ValueError("corrupt progressive scan header")
        entropy_bytes = sum(len(s) for s in segs)
        if ss == 0:
            units = (
                self.mcux * self.mcuy
                if len(scan) > 1
                else self._true_blocks(scan[0][0])
            )
        else:
            if len(scan) != 1:
                raise ValueError("progressive AC scan must be single-component")
            units = self._true_blocks(scan[0][0])
        # DC scans: every coded unit consumes ≥1 bit (a DC-refine block is
        # exactly one) — same cheap structural bound as the sequential path.
        # AC scans CANNOT be bounded per-bit: one EOB-run symbol (~2 bytes)
        # legally covers up to 32767 blocks (T.81 G.1.2.2), so a flat image
        # codes thousands of units from a handful of bytes. There the bound
        # is 32767 units per coded symbol (≥1 bit each); allocation was
        # already capped at SOF by the 1<<27 cell limit.
        if ss == 0:
            if units > 8 * entropy_bytes + 64:
                raise ValueError(
                    f"JPEG scan units inconsistent with entropy data "
                    f"({units} units vs {entropy_bytes} coded bytes)"
                )
        else:
            if units > 32767 * (8 * entropy_bytes + 64):
                raise ValueError(
                    f"JPEG scan units inconsistent with entropy data "
                    f"({units} units vs {entropy_bytes} coded bytes)"
                )
        self.eobrun = 0
        seg_idx = 0
        reader = _BitReader(segs[0])
        pred = [0] * len(self.comps)
        n_unit = 0

        def maybe_restart():
            nonlocal seg_idx, reader, pred, n_unit
            if ri and n_unit and n_unit % ri == 0:
                seg_idx += 1
                if seg_idx >= len(segs):
                    raise ValueError("JPEG missing restart segment")
                reader = _BitReader(segs[seg_idx])
                pred = [0] * len(self.comps)
                self.eobrun = 0

        if ss == 0 and len(scan) > 1:  # interleaved DC scan, MCU order
            for my in range(self.mcuy):
                for mx in range(self.mcux):
                    maybe_restart()
                    for ci, tdc, _tac in scan:
                        _cid, hi, vi, _tq = self.comps[ci]
                        for by in range(vi):
                            for bx in range(hi):
                                blk = self.coef[ci][my * vi + by, mx * hi + bx]
                                self._dc_unit(blk, reader, huff_dc, tdc, pred, ci, ah, al)
                    n_unit += 1
            return
        # single-component scan, component raster order over true dims
        ci, tdc, tac = scan[0]
        tw, th = self.truedims[ci]
        for by in range(th):
            for bx in range(tw):
                maybe_restart()
                blk = self.coef[ci][by, bx]
                if ss == 0:
                    self._dc_unit(blk, reader, huff_dc, tdc, pred, ci, ah, al)
                elif ah == 0:
                    self._ac_first(blk, reader, huff_ac, tac, ss, se, al)
                else:
                    self._ac_refine(blk, reader, huff_ac, tac, ss, se, al)
                n_unit += 1

    def _true_blocks(self, ci):
        tw, th = self.truedims[ci]
        return tw * th

    # -- the four T.81 G.1.2 unit decoders ---------------------------------
    def _dc_unit(self, blk, reader, huff_dc, tdc, pred, ci, ah, al):
        if ah == 0:  # first pass: diff-coded in the >>Al domain
            if tdc not in huff_dc:
                raise ValueError("JPEG scan references missing table")
            s = _huff_decode(reader, huff_dc[tdc])
            pred[ci] += _extend(reader.read_bits(s), s) if s else 0
            blk[0] = pred[ci] << al
        else:  # refinement: one appended magnitude bit
            if reader.read_bit():
                blk[0] |= 1 << al

    def _ac_first(self, blk, reader, huff_ac, tac, ss, se, al):
        if self.eobrun > 0:
            self.eobrun -= 1
            return
        if tac not in huff_ac:
            raise ValueError("JPEG scan references missing table")
        table = huff_ac[tac]
        k = ss
        while k <= se:
            rs = _huff_decode(reader, table)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                self.eobrun = (1 << r) - 1 + (reader.read_bits(r) if r else 0)
                return
            k += r
            if k > se:
                raise ValueError("JPEG AC run past band end")
            blk[ZIGZAG[k]] = _extend(reader.read_bits(s), s) << al
            k += 1

    def _ac_refine(self, blk, reader, huff_ac, tac, ss, se, al):
        p1 = 1 << al
        if tac not in huff_ac:
            raise ValueError("JPEG scan references missing table")
        table = huff_ac[tac]

        def correct(z):
            if reader.read_bit() and not (int(blk[z]) & p1):
                blk[z] += p1 if blk[z] > 0 else -p1

        k = ss
        if self.eobrun == 0:
            while k <= se:
                rs = _huff_decode(reader, table)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r < 15:
                        self.eobrun = (1 << r) + (reader.read_bits(r) if r else 0)
                        break  # remainder refined below, run consumed there
                    newval = 0  # ZRL: pass 16 zero-history coefs
                elif s == 1:
                    newval = p1 if reader.read_bit() else -p1
                else:
                    raise ValueError("progressive AC refinement size != 1")
                while k <= se:
                    z = ZIGZAG[k]
                    if blk[z] != 0:
                        correct(z)
                    else:
                        if r == 0:
                            if newval:
                                blk[z] = newval
                            k += 1
                            break
                        r -= 1
                    k += 1
        if self.eobrun > 0:
            while k <= se:
                z = ZIGZAG[k]
                if blk[z] != 0:
                    correct(z)
                k += 1
            self.eobrun -= 1

    # -- final render -------------------------------------------------------
    def render(self, qt):
        planes = []
        for ci, (_cid, hi, vi, tq) in enumerate(self.comps):
            if tq not in qt:
                raise ValueError("JPEG frame references missing quant table")
            q64 = qt[tq].reshape(64)
            deq = (self.coef[ci].astype(np.float64) * q64).reshape(
                self.coef[ci].shape[0], self.coef[ci].shape[1], 8, 8
            )
            spatial = np.einsum("ux,bcuv,vy->bcxy", _A, deq, _A) + 128.0
            bh, bw = deq.shape[:2]
            planes.append(
                spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
            )
        return _planes_to_pixels(
            self.w, self.h, self.comps, planes, self.hmax, self.vmax
        )


# ---------------------------------------------------------------------------
# Encoder — minimal spec-valid baseline writer (tests + contract adapter)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            self.acc = (self.acc << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _flat_huffman(symbols: list[int]) -> tuple[list[int], bytes, dict[int, tuple[int, int]]]:
    """One canonical code length for every used symbol (≤255 symbols —
    the JPEG symbol space guarantees it). Returns (bits16, vals,
    {symbol: (code, length)})."""
    syms = sorted(set(symbols))
    if not syms:
        syms = [0]
    length = max(2, (len(syms)).bit_length())  # 2^length > len ⇒ no all-ones code
    if len(syms) >= (1 << length):
        length += 1
    bits = [0] * 16
    bits[length - 1] = len(syms)
    enc = {s: (code, length) for code, s in enumerate(syms)}
    return bits, bytes(syms), enc


def _encode_coef_symbols(blocks: list[np.ndarray]) -> tuple[list, list, list]:
    """Quantized blocks (ints, zigzag-ready 8×8) → per-block symbol
    streams + the DC/AC symbol sets (for Huffman table construction)."""
    dc_syms, ac_syms, streams = [], [], []
    pred = 0
    for blk in blocks:
        zz = [int(blk.flat[ZIGZAG[z]]) for z in range(64)]
        diff = zz[0] - pred
        pred = zz[0]
        s = int(abs(diff)).bit_length()
        dc_syms.append(s)
        items = [("dc", s, diff)]
        run = 0
        last_nz = max((z for z in range(1, 64) if zz[z]), default=0)
        for z in range(1, 64):
            v = zz[z]
            if z > last_nz:
                items.append(("ac", 0x00, 0))  # EOB
                ac_syms.append(0x00)
                break
            if v == 0:
                run += 1
                continue
            while run > 15:
                items.append(("ac", 0xF0, 0))  # ZRL
                ac_syms.append(0xF0)
                run -= 16
            sz = int(abs(v)).bit_length()
            sym = (run << 4) | sz
            items.append(("ac", sym, v))
            ac_syms.append(sym)
            run = 0
        else:
            if last_nz != 63:
                items.append(("ac", 0x00, 0))
                ac_syms.append(0x00)
        streams.append(items)
    return streams, dc_syms, ac_syms


def _write_entropy(streams, dc_enc, ac_enc) -> bytes:
    wtr = _BitWriter()
    for items in streams:
        for kind, sym, v in items:
            code, length = (dc_enc if kind == "dc" else ac_enc)[sym]
            wtr.write(code, length)
            if kind == "dc":
                s = sym
            else:
                s = sym & 15
            if s:
                wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
    return wtr.flush()


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> list[np.ndarray]:
    """Plane (H×W multiple of 8, float) → list of quantized 8×8 int blocks
    in raster block order."""
    hh, ww = plane.shape
    out = []
    for y0 in range(0, hh, 8):
        for x0 in range(0, ww, 8):
            blk = plane[y0 : y0 + 8, x0 : x0 + 8] - 128.0
            coef = _A @ blk @ _A.T
            out.append(np.rint(coef / q).astype(np.int64))
    return out


def _pad8(plane: np.ndarray, mult: int = 8) -> np.ndarray:
    hh, ww = plane.shape
    ph = (-hh) % mult
    pw = (-ww) % mult
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _prep_blocks(width, height, pixels, channels, subsample, q):
    """Pixels → per-component quantized 8×8 block grids (MCU-padded,
    raster order) + sampling factors + MCU grid dims. Shared by the
    sequential and progressive encoders."""
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels).astype(float)

    if channels == 1:
        planes = [arr[:, :, 0]]
        samp = [(1, 1)]
    elif channels == 3:
        r, g, bl = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * bl
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * bl
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * bl
        planes = [np.clip(np.rint(p), 0, 255) for p in (y, cb, cr)]
        if subsample == "420":
            samp = [(2, 2), (1, 1), (1, 1)]
            for k in (1, 2):
                p = _pad8(planes[k], 2)
                planes[k] = (
                    p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2]
                ) / 4.0
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
    else:
        raise ValueError("channels must be 1 or 3")

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))

    comp_blocks = []  # per component: blocks in raster order + blocks-per-row
    for k, p in enumerate(planes):
        hi, vi = samp[k]
        p = _pad8(p)
        need = (mcuy * vi * 8, mcux * hi * 8)
        p = np.pad(
            p, ((0, need[0] - p.shape[0]), (0, need[1] - p.shape[1])), mode="edge"
        )
        comp_blocks.append((_fdct_quant(p, q), need[1] // 8))
    return comp_blocks, samp, mcux, mcuy


def encode_jpeg(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 1,
    subsample: str = "444",
    quant: np.ndarray | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Spec-valid baseline JPEG from raw pixels (grayscale bytes for
    ``channels=1``, interleaved RGB for ``channels=3``). ``subsample``:
    '444' (every component full-res) or '420' (chroma boxed 2×2 —
    the layout that dominates image corpora). Default quantization is
    all-ones: flat blocks round-trip EXACTLY (see module docstring).
    ``restart_interval`` > 0 emits DRI + RSTn markers every n MCUs with
    per-interval DC prediction resets (exercises the decoder's restart
    lane)."""
    q = np.ones((8, 8)) if quant is None else np.asarray(quant, dtype=float)
    comp_blocks, samp, mcux, mcuy = _prep_blocks(
        width, height, pixels, channels, subsample, q
    )
    planes = samp  # component count only

    # interleave into MCU order
    mcus = []
    for my in range(mcuy):
        for mx in range(mcux):
            blocks = []
            for k, (hi, vi) in enumerate(samp):
                for by in range(vi):
                    for bx in range(hi):
                        bw = comp_blocks[k][1]
                        idx = (my * vi + by) * bw + (mx * hi + bx)
                        blocks.append((k, comp_blocks[k][0][idx]))
            mcus.append(blocks)
    groups = (
        [mcus[i : i + restart_interval] for i in range(0, len(mcus), restart_interval)]
        if restart_interval
        else [mcus]
    )

    # per-component symbol streams; DC prediction chains reset per
    # restart interval (per the spec), run per component within one
    group_streams, dc_syms, ac_syms = [], [], []
    for grp in groups:
        per_comp: dict[int, list] = {k: [] for k in range(len(planes))}
        order = []
        for blocks in grp:
            for k, blk in blocks:
                per_comp[k].append(blk)
                order.append(k)
        comp_streams = {}
        for k, blks in per_comp.items():
            streams, d, a = _encode_coef_symbols(blks)
            comp_streams[k] = streams
            dc_syms += d
            ac_syms += a
        iters = {k: iter(comp_streams[k]) for k in comp_streams}
        group_streams.append([next(iters[k]) for k in order])
    dc_bits, dc_vals, dc_enc = _flat_huffman(dc_syms)
    ac_bits, ac_vals, ac_enc = _flat_huffman(ac_syms)

    entropy = b""
    for gi, streams in enumerate(group_streams):
        if gi:
            entropy += bytes([0xFF, 0xD0 + ((gi - 1) % 8)])
        entropy += _write_entropy(streams, dc_enc, ac_enc)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    zz_q = bytes(int(q.flat[ZIGZAG[z]]) for z in range(64))
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof += bytes([len(planes)])
    for k, (hi, vi) in enumerate(samp):
        sof += bytes([k + 1, (hi << 4) | vi, 0])
    sos = bytes([len(planes)])
    for k in range(len(planes)):
        sos += bytes([k + 1, 0x00])
    sos += bytes([0, 63, 0])
    dri = (
        seg(0xDD, restart_interval.to_bytes(2, "big")) if restart_interval else b""
    )
    return (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + zz_q)
        + dri
        + seg(0xC0, sof)
        + seg(0xC4, bytes([0x00]) + bytes(dc_bits) + dc_vals)
        + seg(0xC4, bytes([0x10]) + bytes(ac_bits) + ac_vals)
        + seg(0xDA, sos)
        + entropy
        + b"\xff\xd9"
    )


# ---------------------------------------------------------------------------
# Progressive encoder — fixture generator for the SOF2 decode lane
# ---------------------------------------------------------------------------


def _write_items(items, dc_enc, ac_enc) -> bytes:
    """Emit a generic item stream: ('h', 'dc'|'ac', sym) huffman symbols
    and ('b', nbits, value) raw bit runs."""
    wtr = _BitWriter()
    for it in items:
        if it[0] == "h":
            code, length = (dc_enc if it[1] == "dc" else ac_enc)[it[2]]
            wtr.write(code, length)
        else:
            wtr.write(it[2], it[1])
    return wtr.flush()


def _zz_band(blk, lo, hi):
    return [int(blk.flat[ZIGZAG[z]]) for z in range(lo, hi + 1)]


def _prog_dc_first(block_lists, al):
    """Interleaved/raster DC-first items: diffs of (DC >> al), arithmetic
    shift per T.81 G.1.2.1. ``block_lists`` = [(ci, blk), ...] in scan
    order."""
    items = []
    preds: dict[int, int] = {}
    for ci, blk in block_lists:
        v = int(blk.flat[0]) >> al
        diff = v - preds.get(ci, 0)
        preds[ci] = v
        s = abs(diff).bit_length()
        items.append(("h", "dc", s))
        if s:
            items.append(("b", s, diff if diff >= 0 else diff + (1 << s) - 1))
    return items


def _prog_dc_refine(block_lists, al):
    return [("b", 1, (int(blk.flat[0]) >> al) & 1) for _ci, blk in block_lists]


def _flush_eobrun(items, run):
    if run:
        r = run.bit_length() - 1
        items.append(("h", "ac", r << 4))
        if r:
            items.append(("b", r, run - (1 << r)))
    return 0


def _prog_ac_first(blocks, ss, se, al):
    """Single-component AC-first items over [ss, se] with point transform
    sign(v)·(|v| >> al) and cross-block EOB-run batching."""
    items = []
    eobrun = 0
    for blk in blocks:
        vals = [
            (1 if v > 0 else -1) * (abs(v) >> al) for v in _zz_band(blk, ss, se)
        ]
        last_nz = max((i for i, v in enumerate(vals) if v), default=-1)
        if last_nz < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _flush_eobrun(items, eobrun)
            continue
        eobrun = _flush_eobrun(items, eobrun)
        run = 0
        for i in range(last_nz + 1):
            v = vals[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                items.append(("h", "ac", 0xF0))
                run -= 16
            s = abs(v).bit_length()
            items.append(("h", "ac", (run << 4) | s))
            items.append(("b", s, v if v >= 0 else v + (1 << s) - 1))
            run = 0
        if last_nz < len(vals) - 1:
            eobrun += 1  # trailing zeros fold into the next EOB run
    _flush_eobrun(items, eobrun)
    return items


def _prog_ac_refine(blocks, ss, se, al):
    """Single-component AC-refinement items (Ah = al+1 → Al = al):
    mirrors the decoder's walk exactly — each emitted symbol carries the
    correction bits of the nonzero-history coefficients its own walk
    crosses, in positional order (per T.81 G.1.2.3)."""
    items = []
    for blk in blocks:
        vals = _zz_band(blk, ss, se)
        hist = [abs(v) >> (al + 1) != 0 for v in vals]
        newsig = [
            i for i, v in enumerate(vals) if not hist[i] and (abs(v) >> al) == 1
        ]
        corr = [("b", 1, (abs(v) >> al) & 1) for v in vals]
        pos = 0
        for ns in newsig:
            r = sum(1 for p in range(pos, ns) if not hist[p])
            while r >= 16:
                items.append(("h", "ac", 0xF0))  # ZRL walk: pass 16 zeros
                cnt = 0
                while cnt < 16:
                    if hist[pos]:
                        items.append(corr[pos])
                    else:
                        cnt += 1
                    pos += 1
                r -= 16
            items.append(("h", "ac", (r << 4) | 1))
            items.append(("b", 1, 1 if vals[ns] > 0 else 0))  # sign bit
            while pos < ns:  # history bits crossed by this symbol's walk
                if hist[pos]:
                    items.append(corr[pos])
                pos += 1
            pos = ns + 1
        if pos <= len(vals) - 1:
            items.append(("h", "ac", 0x00))  # EOB covering the remainder
            for p in range(pos, len(vals)):
                if hist[p]:
                    items.append(corr[p])
    return items


def encode_jpeg_progressive(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 1,
    subsample: str = "444",
    quant: np.ndarray | None = None,
) -> bytes:
    """Spec-valid PROGRESSIVE JPEG (SOF2) from raw pixels — the fixture
    generator for the progressive decode lane. Scan script: interleaved
    DC first (Al=1) → DC refinement → per-component AC first for bands
    [1,5] and [6,63] at Al=1 → per-component AC refinements of both
    bands to Al=0 — all four G.1.2 scan types, spectral selection AND
    successive approximation, exercised in one file."""
    q = np.ones((8, 8)) if quant is None else np.asarray(quant, dtype=float)
    comp_blocks, samp, mcux, mcuy = _prep_blocks(
        width, height, pixels, channels, subsample, q
    )
    ncomp = len(samp)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    # MCU-order (ci, blk) list for the interleaved DC scans
    mcu_blocks = []
    for my in range(mcuy):
        for mx in range(mcux):
            for k, (hi, vi) in enumerate(samp):
                bw = comp_blocks[k][1]
                for by in range(vi):
                    for bx in range(hi):
                        mcu_blocks.append(
                            (k, comp_blocks[k][0][(my * vi + by) * bw + (mx * hi + bx)])
                        )
    if ncomp == 1:
        # a single-component scan is non-interleaved by definition; its
        # block order is the component raster (same grid here)
        dc_scan_comps = [0]
    else:
        dc_scan_comps = list(range(ncomp))

    # per-component true-dims raster block lists for non-interleaved scans
    comp_raster = []
    for k, (hi, vi) in enumerate(samp):
        bw = comp_blocks[k][1]
        tw = (-(-width * hi // hmax) + 7) // 8
        th = (-(-height * vi // vmax) + 7) // 8
        comp_raster.append(
            [comp_blocks[k][0][by * bw + bx] for by in range(th) for bx in range(tw)]
        )

    scans = []  # (comp_indices, ss, se, ah, al, items)
    scans.append((dc_scan_comps, 0, 0, 0, 1, _prog_dc_first(mcu_blocks, 1)))
    scans.append((dc_scan_comps, 0, 0, 1, 0, _prog_dc_refine(mcu_blocks, 0)))
    for lo, hi_b in ((1, 5), (6, 63)):
        for k in range(ncomp):
            scans.append(
                ([k], lo, hi_b, 0, 1, _prog_ac_first(comp_raster[k], lo, hi_b, 1))
            )
    for lo, hi_b in ((1, 5), (6, 63)):
        for k in range(ncomp):
            scans.append(
                ([k], lo, hi_b, 1, 0, _prog_ac_refine(comp_raster[k], lo, hi_b, 0))
            )

    dc_syms = [it[2] for _c, _s, _e, _a, _l, items in scans for it in items if it[0] == "h" and it[1] == "dc"]
    ac_syms = [it[2] for _c, _s, _e, _a, _l, items in scans for it in items if it[0] == "h" and it[1] == "ac"]
    dc_bits, dc_vals, dc_enc = _flat_huffman(dc_syms)
    ac_bits, ac_vals, ac_enc = _flat_huffman(ac_syms)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    zz_q = bytes(int(q.flat[ZIGZAG[z]]) for z in range(64))
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof += bytes([ncomp])
    for k, (hi, vi) in enumerate(samp):
        sof += bytes([k + 1, (hi << 4) | vi, 0])
    out = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + zz_q)
        + seg(0xC2, sof)
        + seg(0xC4, bytes([0x00]) + bytes(dc_bits) + dc_vals)
        + seg(0xC4, bytes([0x10]) + bytes(ac_bits) + ac_vals)
    )
    for comp_idx, ss, se, ah, al, items in scans:
        sos = bytes([len(comp_idx)])
        for k in comp_idx:
            sos += bytes([k + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos) + _write_items(items, dc_enc, ac_enc)
    return out + b"\xff\xd9"
