"""Pure-python MP4 (ISO BMFF) and AVI (RIFF) container walkers.

Same philosophy as ``multimodal.parse_gif_frames``: locate every video
FRAME's byte span, size, timestamp, and keyframe flag by walking the
container's public box/chunk structure — no codec work (the frame
payloads stay H.264/MJPEG/whatever; pixel decode is a separate concern
behind ffmpeg, absent in this container). This is exactly what a
training-data pipeline needs for frame SAMPLING at 100 TB: pick the k
spans to keep, slice bytes, and hand each span to the (stubbed or
external) per-frame decoder — all inside ``mapInPandas``, zero shuffle,
per-row failure isolation.

Format knowledge is from the public specs: ISO/IEC 14496-12 (box sizes,
``moov/trak/mdia/minf/stbl`` hierarchy, ``stsz/stsc/stco/co64/stts/
stss`` sample tables, 16.16 fixed-point ``tkhd`` dimensions) and the
Microsoft RIFF/AVI documentation (``hdrl/avih``, ``movi`` ``##dc/##db``
chunks, word alignment).

Both walkers raise ValueError for non-matching or structurally corrupt
payloads — callers (``sample_frames``) degrade per row.
"""

from __future__ import annotations


def _be32(b: bytes, i: int) -> int:
    return int.from_bytes(b[i : i + 4], "big")


def _iter_boxes(b: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) for ISO BMFF boxes in
    b[start:end]."""
    i = start
    while i + 8 <= end:
        size = _be32(b, i)
        typ = b[i + 4 : i + 8]
        body = i + 8
        if size == 1:  # 64-bit largesize
            if i + 16 > end:
                raise ValueError("truncated MP4 largesize box")
            size = int.from_bytes(b[i + 8 : i + 16], "big")
            body = i + 16
        elif size == 0:  # to end of enclosing container
            size = end - i
        if size < 8 or i + size > end:
            raise ValueError(f"corrupt MP4 box {typ!r} at {i} (size {size})")
        yield typ, body, i + size
        i += size


def _find_box(b: bytes, start: int, end: int, path: list[bytes]):
    """Descend a box path; returns (body_start, body_end) or None."""
    for typ, s, e in _iter_boxes(b, start, end):
        if typ == path[0]:
            if len(path) == 1:
                return s, e
            return _find_box(b, s, e, path[1:])
    return None


def parse_mp4_frames(payload: bytes) -> list[dict]:
    """Walk the first VIDEO track's sample tables. Returns one dict per
    frame: ``start``/``end`` absolute byte offsets of the (still-encoded)
    sample, ``size``, ``time_ms`` (decode time from ``stts`` over the
    media timescale), ``keyframe`` (from ``stss``; every frame when the
    table is absent, per spec), plus the track's display ``width``/
    ``height`` (16.16 ``tkhd``). Raises ValueError for non-MP4 payloads,
    non-video-only files without a 'vide' handler track, or inconsistent
    sample tables."""
    if payload is None:
        raise ValueError("not an MP4 payload")
    b = bytes(payload)
    if len(b) < 16:
        raise ValueError("not an MP4 payload")
    boxes = list(_iter_boxes(b, 0, len(b)))
    types = [t for t, _, _ in boxes]
    if b"ftyp" not in types or b"moov" not in types:
        raise ValueError("not an MP4 payload (no ftyp/moov)")
    moov = next((s, e) for t, s, e in boxes if t == b"moov")

    for typ, ts, te in _iter_boxes(b, *moov):
        if typ != b"trak":
            continue
        mdia = _find_box(b, ts, te, [b"mdia"])
        if mdia is None:
            continue
        hdlr = _find_box(b, *mdia, [b"hdlr"])
        if hdlr is None or b[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        tkhd = _find_box(b, ts, te, [b"tkhd"])
        width = height = None
        if tkhd is not None:
            hs, he = tkhd
            ver = b[hs]
            # v0: ver/flags4 + times/ids 20 + layer-block 16 + matrix 36
            o = hs + (76 if ver == 0 else 88)
            if o + 8 <= he:
                width = _be32(b, o) >> 16
                height = _be32(b, o + 4) >> 16
        mdhd = _find_box(b, *mdia, [b"mdhd"])
        timescale = 1000
        if mdhd is not None:
            hs, _he = mdhd
            ver = b[hs]
            timescale = _be32(b, hs + (12 if ver == 0 else 20))
        stbl = _find_box(b, *mdia, [b"minf", b"stbl"])
        if stbl is None:
            raise ValueError("MP4 video track without sample table")
        return _frames_from_stbl(b, stbl, timescale, width, height)
    raise ValueError("MP4 without a video ('vide') track")


def _full_box(b: bytes, span) -> int:
    """Body offset past a full box's version/flags."""
    return span[0] + 4


def _frames_from_stbl(b, stbl, timescale, width, height):
    tables = {}
    for typ, s, e in _iter_boxes(b, *stbl):
        tables[typ] = (s, e)

    for required in (b"stsz", b"stsc", b"stts"):
        if required not in tables:
            raise ValueError(f"MP4 stbl missing {required!r}")
    if b"stco" not in tables and b"co64" not in tables:
        raise ValueError("MP4 stbl missing chunk offsets (stco/co64)")

    # Every declared count is validated against the bytes that would have
    # to carry it BEFORE any list is materialized: a tiny payload with a
    # corrupted 32-bit count (e.g. stsz sample_count = 0xFFFFFFFF in a
    # 300-byte file) must be a cheap per-row ValueError, not a multi-GB
    # allocation or a minutes-long loop that stalls the executor.
    def _counted(table_name: bytes, entry_bytes: int, extra: int = 0) -> tuple[int, int]:
        s = _full_box(b, tables[table_name])
        e = tables[table_name][1]
        cnt = _be32(b, s + extra)
        if s + extra + 4 + entry_bytes * cnt > e:
            raise ValueError(
                f"MP4 {table_name.decode()} count {cnt} exceeds its box size"
            )
        return s, cnt

    # stsz: sizes
    s = _full_box(b, tables[b"stsz"])
    fixed = _be32(b, s)
    n = _be32(b, s + 4)
    if fixed:
        # fixed-size samples must fit in the file they claim to index
        if fixed * n > len(b):
            raise ValueError("MP4 stsz fixed-size total exceeds file size")
        sizes = [fixed] * n
    else:
        s, n = _counted(b"stsz", 4, extra=4)
        sizes = [_be32(b, s + 8 + 4 * k) for k in range(n)]

    # chunk offsets
    if b"stco" in tables:
        s, nch = _counted(b"stco", 4)
        offsets = [_be32(b, s + 4 + 4 * k) for k in range(nch)]
    else:
        s, nch = _counted(b"co64", 8)
        offsets = [int.from_bytes(b[s + 4 + 8 * k : s + 12 + 8 * k], "big") for k in range(nch)]

    # stsc: (first_chunk, samples_per_chunk) runs → per-chunk sample counts
    s, nsc = _counted(b"stsc", 12)
    runs = [
        (_be32(b, s + 4 + 12 * k), _be32(b, s + 8 + 12 * k)) for k in range(nsc)
    ]
    per_chunk = []
    for k, (first, spc) in enumerate(runs):
        # cap the run end at nch so a corrupt first_chunk can never expand
        # more than nch entries; a run covering zero chunks is legal
        last = min(runs[k + 1][0] - 1 if k + 1 < len(runs) else nch, nch)
        if len(per_chunk) > nch:
            raise ValueError("MP4 stsc runs exceed chunk count")
        per_chunk += [spc] * (last - first + 1)
    if len(per_chunk) != nch or sum(per_chunk) != n:
        raise ValueError("MP4 stsc/stco/stsz tables inconsistent")

    # stts: decode timestamps
    s, ntt = _counted(b"stts", 8)
    times, t = [], 0
    for k in range(ntt):
        cnt, delta = _be32(b, s + 4 + 8 * k), _be32(b, s + 8 + 8 * k)
        if len(times) + cnt > n:
            raise ValueError("MP4 stts declares more samples than stsz")
        for _ in range(cnt):
            times.append(t)
            t += delta
    if len(times) != n:
        raise ValueError("MP4 stts count mismatch")

    # stss: keyframes (absent ⇒ all sync, per spec)
    keys = None
    if b"stss" in tables:
        s, nk = _counted(b"stss", 4)
        keys = {_be32(b, s + 4 + 4 * k) for k in range(nk)}

    frames = []
    si = 0
    for ci, coff in enumerate(offsets):
        pos = coff
        for _ in range(per_chunk[ci]):
            sz = sizes[si]
            if pos + sz > len(b):
                raise ValueError("MP4 sample span past end of file")
            frames.append(
                {
                    "start": pos,
                    "end": pos + sz,
                    "size": sz,
                    "time_ms": (times[si] * 1000) // max(timescale, 1),
                    "keyframe": keys is None or (si + 1) in keys,
                    "width": width,
                    "height": height,
                }
            )
            pos += sz
            si += 1
    return frames


def parse_avi_frames(payload: bytes) -> list[dict]:
    """Walk a RIFF/AVI 'movi' list: one dict per ``##dc``/``##db`` video
    chunk — ``start``/``end`` byte offsets of the frame DATA (header
    excluded), ``size``, ``time_ms`` (frame index × µs-per-frame from
    ``avih``), ``keyframe`` (True — AVI flags live in the optional idx1
    index; without it every frame is addressable), and the stream
    ``width``/``height``. Raises ValueError for non-AVI payloads or a
    corrupt chunk walk."""
    if payload is None:
        raise ValueError("not an AVI payload")
    b = bytes(payload)
    if len(b) < 24 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")

    us_per_frame = 0
    width = height = None
    frames = []
    fi = 0  # accumulates across movi LISTs (RIFF/AVIX files have several)
    i = 12
    end = min(8 + int.from_bytes(b[4:8], "little"), len(b))
    while i + 8 <= end:
        cid = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        if i + 8 + size > end:
            raise ValueError(f"truncated AVI chunk {cid!r} at {i}")
        if cid == b"LIST":
            ltype = b[i + 8 : i + 12]
            if ltype == b"hdrl":
                j = i + 12
                lend = i + 8 + size
                while j + 8 <= lend:
                    c2 = b[j : j + 4]
                    s2 = int.from_bytes(b[j + 4 : j + 8], "little")
                    if c2 == b"avih" and s2 >= 40:
                        us_per_frame = int.from_bytes(b[j + 8 : j + 12], "little")
                        width = int.from_bytes(b[j + 40 : j + 44], "little")
                        height = int.from_bytes(b[j + 44 : j + 48], "little")
                    j += 8 + s2 + (s2 & 1)
            elif ltype == b"movi":
                j = i + 12
                lend = i + 8 + size
                while j + 8 <= lend:
                    c2 = b[j : j + 4]
                    s2 = int.from_bytes(b[j + 4 : j + 8], "little")
                    if j + 8 + s2 > lend:
                        raise ValueError(f"truncated AVI movi chunk at {j}")
                    if c2[2:4] in (b"dc", b"db") and c2[:2].isdigit():
                        frames.append(
                            {
                                "start": j + 8,
                                "end": j + 8 + s2,
                                "size": s2,
                                "time_ms": (fi * us_per_frame) // 1000,
                                "keyframe": True,
                                "width": width,
                                "height": height,
                            }
                        )
                        fi += 1
                    j += 8 + s2 + (s2 & 1)
        i += 8 + size + (size & 1)
    if not frames:
        raise ValueError("AVI without video frame chunks")
    return frames


def encode_mp4(frames: list[bytes], timescale: int = 1000, delta: int = 40,
               width: int = 64, height: int = 48,
               keyframes: set[int] | None = None) -> bytes:
    """Hand-assemble a minimal spec-valid MP4 (test fixture generator,
    mirroring encode_png/encode_jpeg's role): one video track, one chunk
    per two samples, payloads verbatim in ``mdat``. ``keyframes`` is a
    1-based sample-number set for an ``stss`` box (omit for all-sync)."""

    def box(typ: bytes, body: bytes) -> bytes:
        return (len(body) + 8).to_bytes(4, "big") + typ + body

    def full(typ: bytes, body: bytes, ver: int = 0) -> bytes:
        return box(typ, bytes([ver, 0, 0, 0]) + body)

    ftyp = box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isom")
    mdat_body = b"".join(frames)
    mdat = box(b"mdat", mdat_body)

    n = len(frames)
    sizes = [len(f) for f in frames]
    # chunks of 2 samples (last may be 1) — exercises stsc run logic
    chunk_counts = [2] * (n // 2) + ([1] if n % 2 else [])
    mdat_payload_at = len(ftyp) + 8  # ftyp + mdat header
    offsets, pos = [], mdat_payload_at
    si = 0
    for cc in chunk_counts:
        offsets.append(pos)
        pos += sum(sizes[si : si + cc])
        si += cc

    stsz = full(b"stsz", (0).to_bytes(4, "big") + n.to_bytes(4, "big")
                + b"".join(s.to_bytes(4, "big") for s in sizes))
    stco = full(b"stco", len(offsets).to_bytes(4, "big")
                + b"".join(o.to_bytes(4, "big") for o in offsets))
    runs = [(1, 2)] + ([(len(chunk_counts), 1)] if n % 2 else [])
    stsc = full(b"stsc", len(runs).to_bytes(4, "big")
                + b"".join(f.to_bytes(4, "big") + c.to_bytes(4, "big")
                           + (1).to_bytes(4, "big") for f, c in runs))
    stts = full(b"stts", (1).to_bytes(4, "big") + n.to_bytes(4, "big")
                + delta.to_bytes(4, "big"))
    stbl_body = stts + stsc + stsz + stco
    if keyframes is not None:
        stbl_body += full(b"stss", len(keyframes).to_bytes(4, "big")
                          + b"".join(k.to_bytes(4, "big") for k in sorted(keyframes)))
    stbl = box(b"stbl", stbl_body)
    minf = box(b"minf", stbl)
    mdhd = full(b"mdhd", (0).to_bytes(8, "big") + timescale.to_bytes(4, "big")
                + (n * delta).to_bytes(4, "big") + (0x55C4).to_bytes(2, "big")
                + (0).to_bytes(2, "big"))
    hdlr = full(b"hdlr", (0).to_bytes(4, "big") + b"vide"
                + (0).to_bytes(12, "big") + b"v\x00")
    mdia = box(b"mdia", mdhd + hdlr + minf)
    matrix = b"".join(
        v.to_bytes(4, "big") for v in (0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    )
    tkhd = full(b"tkhd", (0).to_bytes(8, "big") + (1).to_bytes(4, "big")
                + (0).to_bytes(4, "big") + (n * delta).to_bytes(4, "big")
                + (0).to_bytes(16, "big") + matrix
                + (width << 16).to_bytes(4, "big") + (height << 16).to_bytes(4, "big"))
    trak = box(b"trak", tkhd + mdia)
    mvhd = full(b"mvhd", (0).to_bytes(8, "big") + timescale.to_bytes(4, "big")
                + (n * delta).to_bytes(4, "big") + (0x10000).to_bytes(4, "big")
                + (0x100).to_bytes(2, "big") + (0).to_bytes(10, "big") + matrix
                + (0).to_bytes(24, "big") + (2).to_bytes(4, "big"))
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def encode_avi(frames: list[bytes], us_per_frame: int = 40000,
               width: int = 64, height: int = 48) -> bytes:
    """Hand-assemble a minimal RIFF/AVI (test fixture generator): avih
    header + one '00dc' chunk per frame in a 'movi' list, word-aligned."""

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + len(body).to_bytes(4, "little") + body + (b"\x00" if len(body) & 1 else b"")

    avih = chunk(
        b"avih",
        us_per_frame.to_bytes(4, "little") + (0).to_bytes(12, "little")
        + len(frames).to_bytes(4, "little") + (0).to_bytes(8, "little")
        + (0x10000).to_bytes(4, "little")
        + width.to_bytes(4, "little") + height.to_bytes(4, "little")
        + (0).to_bytes(16, "little"),
    )
    hdrl = chunk(b"LIST", b"hdrl" + avih)
    movi = chunk(b"LIST", b"movi" + b"".join(chunk(b"00dc", f) for f in frames))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + len(riff_body).to_bytes(4, "little") + riff_body


def parse_m4a_header(payload: bytes | None) -> tuple | None:
    """MP4/M4A AUDIO-track metadata — the container half of the real-
    world ``.m4a``/``.mp4`` audio corpus: (sample_rate, channels, bits,
    n_frames, duration_ms) from the first 'soun'-handler track's mdhd
    (timescale + duration) and stsd audio sample entry (channel count,
    sample size, 16.16 sample rate), the same sniff-chain tuple shape
    as parse_wav/flac/mp3/ogg/aiff headers. ``n_frames`` is the mdhd
    duration in media-timescale units (equal to the PCM sample count
    when, as encoders conventionally do, timescale == sample rate);
    the encoded AAC payload itself stays opaque (decode needs a
    licensed codec — out of honest pure-python scope). Returns None
    for non-MP4 payloads or video-only files."""
    if payload is None or len(payload) < 16:
        return None
    b = bytes(payload)
    try:
        boxes = list(_iter_boxes(b, 0, len(b)))
        types = [t for t, _, _ in boxes]
        if b"ftyp" not in types or b"moov" not in types:
            return None
        moov = next((s, e) for t, s, e in boxes if t == b"moov")
        for typ, ts, te in _iter_boxes(b, *moov):
            if typ != b"trak":
                continue
            mdia = _find_box(b, ts, te, [b"mdia"])
            if mdia is None:
                continue
            hdlr = _find_box(b, *mdia, [b"hdlr"])
            if hdlr is None or b[hdlr[0] + 8 : hdlr[0] + 12] != b"soun":
                continue
            mdhd = _find_box(b, *mdia, [b"mdhd"])
            if mdhd is None:
                return None
            hs, he = mdhd
            ver = b[hs]
            if ver == 0:
                if hs + 20 > he:
                    return None
                timescale = _be32(b, hs + 12)
                duration = _be32(b, hs + 16)
            else:
                if hs + 32 > he:
                    return None
                timescale = _be32(b, hs + 20)
                duration = int.from_bytes(b[hs + 24 : hs + 32], "big")
            stsd = _find_box(b, *mdia, [b"minf", b"stbl", b"stsd"])
            channels = bits = rate = None
            if stsd is not None:
                entry = _full_box(b, stsd) + 4  # past entry count
                if entry + 36 <= stsd[1]:
                    channels = int.from_bytes(b[entry + 24 : entry + 26], "big")
                    bits = int.from_bytes(b[entry + 26 : entry + 28], "big")
                    rate = _be32(b, entry + 32) >> 16
            if not rate or not timescale:
                return None
            return (
                rate,
                channels,
                bits,
                duration,
                (duration * 1000) // timescale,
            )
    except ValueError:
        return None
    return None


def encode_m4a(rate: int, channels: int, n_samples: int, bits: int = 16,
               pad: int = 0) -> bytes:
    """Hand-assemble a minimal spec-valid M4A container (fixture
    generator): ftyp('M4A ') + moov with one 'soun' track — mdhd with
    timescale == sample rate (so duration IS the sample count), an
    'mp4a' stsd entry carrying channels/bits/16.16-rate, and empty
    sample tables (the encoded bitstream is out of scope; metadata is
    the product). ``pad`` appends a 'free' box of 8+pad bytes so
    fixture payload sizes can vary deterministically."""

    def box(typ: bytes, body: bytes) -> bytes:
        return (len(body) + 8).to_bytes(4, "big") + typ + body

    def full(typ: bytes, body: bytes, ver: int = 0) -> bytes:
        return box(typ, bytes([ver, 0, 0, 0]) + body)

    ftyp = box(b"ftyp", b"M4A " + (0).to_bytes(4, "big") + b"M4A mp42isom")
    mdhd = full(b"mdhd", (0).to_bytes(8, "big") + rate.to_bytes(4, "big")
                + n_samples.to_bytes(4, "big") + (0x55C4).to_bytes(2, "big")
                + (0).to_bytes(2, "big"))
    hdlr = full(b"hdlr", (0).to_bytes(4, "big") + b"soun"
                + (0).to_bytes(12, "big") + b"\x00")
    mp4a = ((0).to_bytes(6, "big") + (1).to_bytes(2, "big")
            + (0).to_bytes(8, "big") + channels.to_bytes(2, "big")
            + bits.to_bytes(2, "big") + (0).to_bytes(4, "big")
            + (rate << 16).to_bytes(4, "big"))
    stsd = full(b"stsd", (1).to_bytes(4, "big") + box(b"mp4a", mp4a))
    stts = full(b"stts", (0).to_bytes(4, "big"))
    stsc = full(b"stsc", (0).to_bytes(4, "big"))
    stsz = full(b"stsz", (0).to_bytes(8, "big"))
    stco = full(b"stco", (0).to_bytes(4, "big"))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    smhd = full(b"smhd", (0).to_bytes(4, "big"))
    dinf = box(b"dinf", full(b"dref", (1).to_bytes(4, "big")
               + (12).to_bytes(4, "big") + b"url \x00\x00\x00\x01"))
    minf = box(b"minf", smhd + dinf + stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    tkhd = full(b"tkhd", (0).to_bytes(8, "big") + (1).to_bytes(4, "big")
                + (0).to_bytes(4, "big") + n_samples.to_bytes(4, "big")
                + (0).to_bytes(60, "big"))
    trak = box(b"trak", tkhd + mdia)
    mvhd = full(b"mvhd", (0).to_bytes(8, "big") + rate.to_bytes(4, "big")
                + n_samples.to_bytes(4, "big") + (0x10000).to_bytes(4, "big")
                + (0x100).to_bytes(2, "big") + (0).to_bytes(74, "big")
                + (2).to_bytes(4, "big"))
    moov = box(b"moov", mvhd + trak)
    out = ftyp + moov
    if pad:
        out += box(b"free", b"\x00" * pad)
    return out
