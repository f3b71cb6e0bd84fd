"""EPUB package extraction and Arrow IPC ingest: container-chain
discovery, spine order, head/style stripping, entity decode; IPC sniff
for both formats, multi-batch walk, missing-column NULLs, degrade."""

from __future__ import annotations

import io

import pandas as pd
import pytest

from seaexplorertools_spark.operators.epub import (
    _html_to_text,
    encode_epub,
    parse_epub_text,
)
from seaexplorertools_spark.sources.arrow_ipc import read_arrow_payload


def test_epub_roundtrip_and_title_entities():
    p = encode_epub("Book 5 & Co.", ["Chapter 0. hello", "Chapter 1."])
    n, title, text = parse_epub_text(p)
    assert (n, title) == (2, "Book 5 & Co.")
    assert text == "Chapter 0. hello\nChapter 1."


def test_epub_spine_order_not_zip_order():
    """Spine order rules even when hrefs sort differently."""
    import re
    import zipfile

    p = encode_epub("T", ["first", "second", "third"])
    # reverse the spine in the OPF; chapters must follow the NEW order
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(p)) as zin, zipfile.ZipFile(buf, "w") as zout:
        for info in zin.infolist():
            data = zin.read(info)
            if info.filename.endswith("content.opf"):
                s = data.decode()
                spine = re.findall(r'<itemref idref="[^"]+"/>', s)
                s = s.replace("".join(spine), "".join(reversed(spine)))
                data = s.encode()
            zout.writestr(info, data)
    n, _, text = parse_epub_text(buf.getvalue())
    assert (n, text) == (3, "third\nsecond\nfirst")


def test_epub_head_and_style_dropped():
    html = (
        "<html><head><title>IGNORED</title><style>p{}</style></head>"
        "<body><script>var x=1;</script><p>kept &amp; well</p></body></html>"
    )
    assert _html_to_text(html) == "kept & well"


def test_epub_degrade():
    for bad in (None, b"", b"not a zip"):
        with pytest.raises(ValueError):
            parse_epub_text(bad)
    # a zip without container.xml is not an EPUB
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("other", "x")
    with pytest.raises(ValueError):
        parse_epub_text(buf.getvalue())
    # spine item missing from the package: skipped, not fatal
    p = bytearray(encode_epub("T", ["a", "b"]))
    import re as _re
    s = bytes(p)
    # rebuild without ch1.xhtml
    src = zipfile.ZipFile(io.BytesIO(s))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zout:
        for info in src.infolist():
            if not info.filename.endswith("ch1.xhtml"):
                zout.writestr(info, src.read(info))
    n, _, text = parse_epub_text(buf.getvalue())
    assert (n, text) == (1, "a")


def test_arrow_both_formats_roundtrip():
    import pyarrow as pa
    import pyarrow.ipc as ipc

    tbl = pa.table({"doc_id": [1, 2], "seq": [0, 1], "body": ["a", None],
                    "score": [0.5, 1.25]})
    for opener, magic in ((ipc.new_stream, False), (ipc.new_file, True)):
        sink = io.BytesIO()
        with opener(sink, tbl.schema) as w:
            w.write_table(tbl)
        payload = sink.getvalue()
        assert payload.startswith(b"ARROW1") == magic
        assert read_arrow_payload(payload).equals(tbl)


def test_arrow_spark_lane(spark):
    from seaexplorertools_spark.sources.arrow_ipc import (
        arrow_records,
        documents_as_arrow,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], "doc_id long, text string"
    )
    rows = sorted(
        arrow_records(documents_as_arrow(docs)).collect(),
        key=lambda r: (r["media_id"], r["seq"]),
    )
    expect = []
    for did in range(6):
        for s in range(1 + did % 3):
            expect.append(
                (did, did, s, None if s == 2 else f"text {did}", did % 83 + s / 16.0)
            )
    assert [
        (r["media_id"], r["doc_id"], r["seq"], r["body"], r["score"]) for r in rows
    ] == expect
    mixed = spark.createDataFrame(
        pd.DataFrame({"media_id": [1, 2], "payload": [b"garbage", None]})
    )
    assert arrow_records(mixed).count() == 0


def test_epub_spark_lane(spark):
    from seaexplorertools_spark.operators.epub import documents_as_epub, epub_text

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(4)], "doc_id long, text string"
    )
    rows = {r["media_id"]: r for r in epub_text(documents_as_epub(docs)).collect()}
    for did, r in rows.items():
        k = 1 + did % 3
        want = "\n".join(
            f"Chapter {i}." + (f" text {did}" if i == 0 else "") for i in range(k)
        )
        assert (r["n_chapters"], r["title"], r["text"]) == (
            k, f"Book {did} & Co.", want,
        )
    mixed = spark.createDataFrame(
        pd.DataFrame({"media_id": [9], "payload": [b"nope"]})
    )
    out = epub_text(mixed).collect()
    assert len(out) == 1 and out[0]["n_chapters"] is None


def test_arrow_spark_lane_degrades_wrong_typed_fields(spark):
    """An Arrow payload whose score column is strings (and body ints)
    must degrade the FIELDS to NULL, not fail the task (round-9
    ADVICE parity with the cbor/bson/msgpack lanes)."""
    import io

    import pyarrow as pa
    import pyarrow.ipc as ipc

    from seaexplorertools_spark.sources.arrow_ipc import arrow_records

    tbl = pa.table(
        {
            "doc_id": pa.array(["x", "3"], pa.string()),
            "seq": pa.array([0, 1], pa.int64()),
            "body": pa.array([7, 8], pa.int64()),
            "score": pa.array(["high", "low"], pa.string()),
        }
    )
    buf = io.BytesIO()
    with ipc.new_stream(buf, tbl.schema) as w:
        w.write_table(tbl)
    media = spark.createDataFrame(
        [(1, buf.getvalue())], "media_id long, payload binary"
    )
    rows = arrow_records(media).orderBy("seq").collect()
    assert len(rows) == 2
    assert all(r["doc_id"] is None for r in rows)
    assert all(r["body"] is None for r in rows)
    assert all(r["score"] is None for r in rows)
    assert [r["seq"] for r in rows] == [0, 1]
