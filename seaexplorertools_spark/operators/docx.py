"""DOCX text extraction — Office Open XML through the archive walk.

A .docx is a ZIP (the same stdlib walk operators/archives.py uses) whose
``word/document.xml`` carries the text as ``<w:t>`` runs inside
``<w:p>`` paragraphs. This extracts the pipeline-relevant subset:
paragraph count and the concatenated run text, paragraphs joined by
newlines, ``<w:tab/>`` → TAB, ``<w:br/>`` → newline, XML entities
decoded (``&amp;`` last, so double-encoded text survives one level
exactly like text.py::html_extract). Styling, tables-as-layout,
headers/footers, embedded media and numbering are out of scope —
degrading per-row, never failing the job.

``encode_docx`` writes a real minimal OOXML package ([Content_Types],
rels, document part) so fixtures are genuine ZIP+XML; ZIP and the XML
entity escaping are both lossless, so ``mm_docx_text`` pins the whole
package→part→run-scan path under an exact constructor oracle.

Reference parity: no document path exists in the reference
(`/root/reference/seaexplorertools/process_adcp.py`); part of the
text-ingest surface the brief adds.
"""

from __future__ import annotations

import io
import re
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_P_RE = re.compile(r"<w:p[ >/]")
_T_RE = re.compile(r"<w:t(?:\s[^>]*)?>(.*?)</w:t>|<w:tab\s*/>|<w:br\s*/>", re.S)

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>"
)
_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
    "</Relationships>"
)
_W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"


def _unescape_xml(s: str) -> str:
    s = s.replace("&lt;", "<").replace("&gt;", ">")
    s = s.replace("&quot;", '"').replace("&apos;", "'")
    return s.replace("&amp;", "&")  # LAST: one level of double-encoding


def _escape_xml(s: str) -> str:
    s = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    return s


def parse_docx_text(payload: bytes) -> tuple[int, str]:
    """(n_paragraphs, text) from word/document.xml. Raises ValueError
    for payloads that are not a DOCX package."""
    if payload is None:
        raise ValueError("docx: null payload")
    try:
        with zipfile.ZipFile(io.BytesIO(bytes(payload))) as zf:
            xml = zf.read("word/document.xml").decode("utf-8", "replace")
    except (zipfile.BadZipFile, KeyError, OSError) as e:
        raise ValueError(f"docx: {e}") from e
    paras = _P_RE.split(xml)[1:]  # text before the first <w:p is package scaffolding
    texts = []
    for p in paras:
        body = p.split("</w:p>", 1)[0]
        runs = []
        for m in _T_RE.finditer(body):
            if m.group(0).startswith("<w:tab"):
                runs.append("\t")
            elif m.group(0).startswith("<w:br"):
                runs.append("\n")
            else:
                runs.append(_unescape_xml(m.group(1)))
        texts.append("".join(runs))
    return len(texts), "\n".join(texts)


def encode_docx(paragraphs: list[str]) -> bytes:
    """Emit a real minimal DOCX package (fixture builder): content
    types, package rels, and a document part with one <w:t> run per
    paragraph (xml:space="preserve" so edge whitespace survives)."""
    body = "".join(
        f'<w:p><w:r><w:t xml:space="preserve">{_escape_xml(p)}</w:t></w:r></w:p>'
        for p in paragraphs
    )
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W_NS}"><w:body>{body}</w:body></w:document>'
    )
    buf = io.BytesIO()
    # compresslevel 1: the lane outputs the extracted TEXT, which is
    # invariant across deflate levels
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED, compresslevel=1) as zf:
        for name, data in (
            ("[Content_Types].xml", _CONTENT_TYPES),
            ("_rels/.rels", _RELS),
            ("word/document.xml", doc),
        ):
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(info, data.encode("utf-8"))
    return buf.getvalue()


DOCX_TEXT_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_paragraphs", LongType(), True),
        StructField("text", StringType(), True),
    ]
)


def docx_text(media: DataFrame) -> DataFrame:
    """Spark lane: (media_id, n_paragraphs, text) per DOCX payload —
    Arrow-batched mapInPandas, zero shuffle, per-row degrade to NULLs."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    n, text = parse_docx_text(payload)
                except ValueError:
                    rows.append((mid, None, None))
                    continue
                rows.append((mid, n, text))
            yield pd.DataFrame(rows, columns=["media_id", "n_paragraphs", "text"])

    return media.select("media_id", "payload").mapInPandas(extract, DOCX_TEXT_SCHEMA)


def documents_as_docx(docs: DataFrame) -> DataFrame:
    """Adapter: per document a REAL DOCX — paragraph 0 is
    ``Doc <id> & <"notes">`` (pins entity escaping round-trip),
    paragraph 1 the document text, plus a ``fin`` paragraph on odd ids
    — so paragraph count and extracted text are closed-form in
    (doc_id, text) for ``mm_docx_text``."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                paras = [f'Doc {did} & <"notes">', text or ""]
                if did % 2 == 1:
                    paras.append("fin")
                rows.append((did, "docx", encode_docx(paras)))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )
    return docs.select("doc_id", "text").mapInPandas(build, schema)
