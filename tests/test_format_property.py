"""Property-based round-trips for the round-8 format codecs — pure
python surfaces, no Spark session:

- TIFF: arbitrary dims/channels/pixels × byte order × compression ×
  strip size decode back exactly (lossless container).
- MessagePack: arbitrary nested values round-trip exactly; arbitrary
  BYTE STRINGS never crash the decoder (ValueError or success only).
- Avro: arbitrary record batches round-trip exactly under both codecs
  and any block split.
- AIFF: arbitrary 16-bit sample blocks round-trip exactly at arbitrary
  rates (the 80-bit extended field is exact for integers).
- ICO: arbitrary RGBA images survive the DIB route exactly.
- Subtitles: arbitrary cue tables round-trip in both dialects.
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

COMMON = dict(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))


@settings(**COMMON)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    ch=st.sampled_from([1, 3]),
    big_endian=st.booleans(),
    packbits=st.booleans(),
    rps=st.one_of(st.none(), st.integers(1, 8)),
    seed=st.integers(0, 2**31 - 1),
)
def test_tiff_roundtrip(w, h, ch, big_endian, packbits, rps, seed):
    from seaexplorertools_spark.operators.tiffcodec import (
        decode_tiff_pixels,
        encode_tiff,
    )

    px = bytes(np.random.default_rng(seed).integers(0, 256, w * h * ch, dtype=np.uint8))
    payload = encode_tiff(
        w, h, px, ch, big_endian=big_endian, packbits=packbits, rows_per_strip=rps
    )
    assert decode_tiff_pixels(payload) == (w, h, ch, px)


_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=40),
    st.binary(max_size=40),
)
_values = st.recursive(
    _scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=5),
        st.dictionaries(st.text(max_size=8), inner, max_size=5),
    ),
    max_leaves=20,
)


@settings(**COMMON)
@given(v=_values)
def test_msgpack_roundtrip(v):
    from seaexplorertools_spark.sources.msgpack import pack_value, unpack_value

    enc = pack_value(v)
    got, i = unpack_value(enc)
    assert got == v and i == len(enc)


@settings(**COMMON)
@given(b=st.binary(max_size=200))
def test_msgpack_never_crashes(b):
    from seaexplorertools_spark.sources.msgpack import unpack_stream

    try:
        unpack_stream(b)
    except ValueError:
        pass  # the only allowed failure mode


@settings(**COMMON)
@given(v=_values)
def test_cbor_roundtrip(v):
    from seaexplorertools_spark.sources.cbor import decode_value, encode_value

    enc = encode_value(v)
    got, i = decode_value(enc)
    assert got == v and i == len(enc)


@settings(**COMMON)
@given(b=st.binary(max_size=200))
def test_cbor_never_crashes(b):
    from seaexplorertools_spark.sources.cbor import decode_stream

    try:
        decode_stream(b)
    except ValueError:
        pass  # the only allowed failure mode


# BSON documents: string keys only (the spec's element names are
# cstrings), no bytes values (0x05 binary is skip-only by design)
_bson_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=40).filter(lambda s: "\x00" not in s),
)
_bson_keys = st.text(max_size=8).filter(lambda s: "\x00" not in s)
_bson_values = st.recursive(
    _bson_scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=5),
        st.dictionaries(_bson_keys, inner, max_size=5),
    ),
    max_leaves=20,
)


@settings(**COMMON)
@given(v=st.dictionaries(_bson_keys, _bson_values, max_size=5))
def test_bson_roundtrip(v):
    from seaexplorertools_spark.sources.bson import (
        decode_document,
        encode_document,
    )

    enc = encode_document(v)
    got, i = decode_document(enc)
    assert got == v and i == len(enc)


@settings(**COMMON)
@given(b=st.binary(max_size=200))
def test_bson_never_crashes(b):
    from seaexplorertools_spark.sources.bson import decode_dump

    try:
        decode_dump(b)
    except ValueError:
        pass  # the only allowed failure mode


@settings(**COMMON)
@given(
    n=st.integers(0, 8),
    codec=st.sampled_from(["null", "deflate"]),
    mbr=st.one_of(st.none(), st.integers(1, 4)),
    seed=st.integers(0, 2**31 - 1),
)
def test_avro_roundtrip(n, codec, mbr, seed):
    from seaexplorertools_spark.sources.avro import read_avro_bytes, write_avro_bytes

    rng = np.random.default_rng(seed)
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"]},
            {"name": "c", "type": "double"},
        ],
    }
    recs = [
        {
            "a": int(rng.integers(-(2**40), 2**40)),
            "b": None if rng.integers(0, 2) else f"s{int(rng.integers(0, 99))}",
            "c": float(rng.integers(-1000, 1000)) / 8.0,
        }
        for _ in range(n)
    ]
    payload = write_avro_bytes(recs, schema, codec=codec, max_block_records=mbr)
    assert read_avro_bytes(payload)[1] == recs


@settings(**COMMON)
@given(
    n=st.integers(1, 500),
    ch=st.sampled_from([1, 2]),
    rate=st.integers(1, 192000),
    seed=st.integers(0, 2**31 - 1),
)
def test_aiff_roundtrip(n, ch, rate, seed):
    from seaexplorertools_spark.operators.aiff import decode_aiff_samples, encode_aiff

    arr = np.random.default_rng(seed).integers(-32768, 32768, (n, ch), dtype=np.int64)
    r, c, out = decode_aiff_samples(encode_aiff(rate, arr))
    assert (r, c) == (rate, ch) and np.array_equal(out, arr)


@settings(**COMMON)
@given(w=st.integers(1, 16), h=st.integers(1, 16), seed=st.integers(0, 2**31 - 1))
def test_ico_dib_roundtrip(w, h, seed):
    from seaexplorertools_spark.operators.icocodec import (
        decode_ico_pixels,
        encode_ico,
    )

    rgba = bytes(np.random.default_rng(seed).integers(0, 256, w * h * 4, dtype=np.uint8))
    assert decode_ico_pixels(encode_ico([(w, h, rgba)])) == (w, h, 4, rgba)


# '<' excluded: inline tags are stripped BY DESIGN (lossy on purpose)
_cue_text = st.text(
    alphabet=st.characters(blacklist_characters="\n\r<", blacklist_categories=("Cs",)),
    min_size=1,
    max_size=30,
).filter(lambda s: s.strip() == s and s.strip() != "" and "-->" not in s)


@settings(**COMMON)
@given(
    starts=st.lists(st.integers(0, 10**7), min_size=1, max_size=6),
    dur=st.integers(1, 10**6),
    texts=st.lists(_cue_text, min_size=6, max_size=6),
    vtt=st.booleans(),
)
def test_subtitles_roundtrip(starts, dur, texts, vtt):
    from seaexplorertools_spark.operators.subtitles import (
        encode_subtitles,
        parse_subtitles,
    )

    cues = [(s, s + dur, texts[i]) for i, s in enumerate(starts)]
    out = parse_subtitles(encode_subtitles(cues, vtt=vtt))
    assert [(c["start_ms"], c["end_ms"], c["text"]) for c in out] == cues
