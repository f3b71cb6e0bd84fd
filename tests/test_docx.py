"""DOCX extraction + compressed-text lane: round-trips, entity decode,
tab/br runs, hostile degrade, all three decompress codecs, Spark lanes."""

from __future__ import annotations

import bz2
import gzip
import lzma

import pandas as pd
import pytest

from seaexplorertools_spark.operators.archives import (
    _sniff_decompress,
    decompress_text,
    documents_as_compressed,
)
from seaexplorertools_spark.operators.docx import (
    documents_as_docx,
    docx_text,
    encode_docx,
    parse_docx_text,
)


def test_docx_roundtrip():
    paras = ['Doc 5 & <"notes">', "hello & <world>", "", "naïve ♪ text"]
    n, t = parse_docx_text(encode_docx(paras))
    assert (n, t) == (4, "\n".join(paras))


def test_docx_runs_tabs_breaks():
    # hand-build a document part with split runs, tab and br elements
    import io
    import zipfile

    from seaexplorertools_spark.operators.docx import _CONTENT_TYPES, _RELS, _W_NS

    doc = (
        f'<w:document xmlns:w="{_W_NS}"><w:body>'
        '<w:p><w:r><w:t>Hel</w:t></w:r><w:r><w:t>lo</w:t></w:r>'
        "<w:tab/><w:r><w:t>col2</w:t></w:r><w:br/><w:r><w:t>wrapped</w:t></w:r></w:p>"
        '<w:p><w:pPr></w:pPr><w:r><w:t xml:space="preserve"> padded </w:t></w:r></w:p>'
        "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _RELS)
        zf.writestr("word/document.xml", doc)
    n, t = parse_docx_text(buf.getvalue())
    assert n == 2
    assert t == "Hello\tcol2\nwrapped\n padded "


def test_docx_rejects():
    with pytest.raises(ValueError):
        parse_docx_text(None)
    with pytest.raises(ValueError):
        parse_docx_text(b"garbage")
    # a plain zip without the document part is not a DOCX
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("other.txt", "x")
    with pytest.raises(ValueError):
        parse_docx_text(buf.getvalue())


@pytest.mark.parametrize(
    "mk,name",
    [(lambda b: gzip.compress(b, mtime=0), "gzip"),
     (bz2.compress, "bzip2"),
     (lzma.compress, "xz")],
)
def test_sniff_decompress(mk, name):
    raw = "héllo wörld ♪".encode()
    codec, out = _sniff_decompress(mk(raw))
    assert (codec, out) == (name, raw)


def test_sniff_rejects():
    with pytest.raises(ValueError):
        _sniff_decompress(b"plain text")
    with pytest.raises(Exception):
        _sniff_decompress(b"\x1f\x8b corrupt gzip body")


def test_spark_lanes(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], "doc_id long, text string"
    )
    rows = {r["media_id"]: r for r in docx_text(documents_as_docx(docs)).collect()}
    for did, r in rows.items():
        want = f'Doc {did} & <"notes">\ntext {did}' + ("\nfin" if did % 2 else "")
        assert (r["n_paragraphs"], r["text"]) == (2 + did % 2, want)
    crows = {
        r["media_id"]: r
        for r in decompress_text(documents_as_compressed(docs)).collect()
    }
    for did, r in crows.items():
        assert r["codec"] == ("gzip", "bzip2", "xz")[did % 3]
        assert r["text"] == f"text {did}"
    mixed = spark.createDataFrame(
        pd.DataFrame({"media_id": [1, 2], "payload": [b"garbage", None]})
    )
    out = decompress_text(mixed).collect()
    assert len(out) == 2 and all(r["codec"] is None for r in out)
    assert docx_text(mixed).count() == 2
