"""PDF text extraction: encode↔extract round-trips (escapes, unicode,
multi-page, flate), operator-level cases (TJ arrays, hex strings,
quote operators, comments), hostile/degrade paths, and the Spark lane."""

from __future__ import annotations

import zlib

import pandas as pd
import pytest

from seaexplorertools_spark.operators.pdfcodec import (
    _content_text,
    encode_pdf,
    parse_pdf_text,
)


@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip(compress):
    pages = [["Hello (world) \\ test", "line two"], ["page 2 — naïve ♪"], []]
    n, text = parse_pdf_text(encode_pdf(pages, compress=compress))
    assert n == 3
    assert text == "Hello (world) \\ test\nline two\npage 2 — naïve ♪\n"


def test_escapes_survive():
    tricky = "tabs\tand\nnewlines\rplus )( parens \\ and ü"
    n, text = parse_pdf_text(encode_pdf([[tricky]]))
    assert (n, text) == (1, tricky)


def test_content_operators():
    # TJ array with kerning numbers concatenates its strings
    assert _content_text(b"BT [(He) -250 (llo)] TJ ET") == "Hello"
    # hex strings decode; odd digit count pads with 0
    assert _content_text(b"BT <48656C6C6F> Tj ET") == "Hello"
    assert _content_text(b"BT <484> Tj ET") == "H@"
    # quote operators show and imply a line break
    assert _content_text(b"BT (a) ' (b) ' ET") == "a\nb"
    # Td between shows breaks the line; comments are skipped
    assert _content_text(b"BT (x) Tj 0 -14 Td % noise (no) Tj\n(y) Tj ET") == "x\ny"
    # octal escapes and line continuation
    assert _content_text(b"BT (\\101\\102\\\n\\103) Tj ET") == "ABC"
    # nested balanced parens need no escaping
    assert _content_text(b"BT (a (b) c) Tj ET") == "a (b) c"


def test_rejections_and_degrade():
    with pytest.raises(ValueError):
        parse_pdf_text(None)
    with pytest.raises(ValueError):
        parse_pdf_text(b"not a pdf")
    # truncated-but-magic parses to zero pages rather than crashing
    assert parse_pdf_text(b"%PDF-1.4\ngarbage") == (0, "")
    # encrypted trailer refuses
    enc = encode_pdf([["secret"]]) + b"<< /Encrypt 9 0 R >>"
    with pytest.raises(ValueError):
        parse_pdf_text(enc)
    # unsupported filter degrades with ValueError
    p = encode_pdf([["x"]]).replace(b"<< /Length", b"<< /Filter /LZWDecode /Length")
    with pytest.raises(ValueError):
        parse_pdf_text(p)


def test_corrupt_flate_stream():
    p = encode_pdf([["hello there"]], compress=True)
    i = p.find(b"stream\n") + 7
    corrupted = p[:i] + b"\xff\xff" + p[i + 2 :]
    with pytest.raises((ValueError, zlib.error)):
        parse_pdf_text(corrupted)


def test_length_bound_protects_against_embedded_keywords():
    # a page text containing 'endstream' must not desync the /Length walk
    tricky = "fake endstream marker and 1 0 obj too"
    n, text = parse_pdf_text(encode_pdf([[tricky]]))
    assert (n, text) == (1, tricky)


def test_spark_lane(spark):
    from seaexplorertools_spark.operators.pdfcodec import (
        documents_as_pdf,
        pdf_text,
    )

    docs = spark.createDataFrame(
        [(i, f"body of doc {i}") for i in range(6)], "doc_id long, text string"
    )
    rows = {r["media_id"]: r for r in pdf_text(documents_as_pdf(docs)).collect()}
    for did, r in rows.items():
        k = 1 + did % 3
        want = "\n".join(
            f"Doc {did} page {i}\nbody of doc {did}" for i in range(k)
        )
        assert (r["n_pages"], r["text"]) == (k, want)
    mixed = spark.createDataFrame(
        pd.DataFrame({"media_id": [1, 2], "payload": [b"garbage", None]})
    )
    out = pdf_text(mixed).collect()
    assert len(out) == 2 and all(r["n_pages"] is None for r in out)
