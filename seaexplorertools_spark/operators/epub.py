"""EPUB text extraction — the books slice of a pretraining corpus.

An EPUB is a ZIP (stdlib walk, like DOCX) with a fixed discovery
chain: ``META-INF/container.xml`` names the OPF package file, the OPF
carries the ``<dc:title>`` and a manifest (id → href) plus a spine
(ordered idrefs), and each spine item is an XHTML chapter. Extraction
follows that chain — not a bare ``*.xhtml`` glob, so chapter ORDER is
the spine's, cover/nav files outside the spine are excluded, and the
title comes from the metadata, exactly what a books pipeline wants.

Chapter XHTML → text uses the html_extract contract (script/style
removal, block tags → newlines, tag strip, entity decode with &amp;
last, whitespace collapse) reimplemented Python-side for the worker
walk; chapters join with newlines. Out of scope, degrading per row:
DRM, non-ZIP EPUB2 OEBPS variants, remote resources.

ZIP + XML escaping are lossless, so ``mm_epub_text`` pins the
container chain (container.xml → OPF → spine order → chapter decode)
under an exact constructor oracle.

Reference parity: no document path exists in the reference
(`/root/reference/seaexplorertools/process_adcp.py`); part of the
text-ingest surface the brief adds.
"""

from __future__ import annotations

import io
import posixpath
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

_ROOTFILE_RE = re.compile(r'full-path="([^"]+)"')
_TITLE_RE = re.compile(r"<dc:title[^>]*>(.*?)</dc:title>", re.S)
_ITEM_RE = re.compile(r'<item\s[^>]*/?>', re.S)
_ATTR_RE = re.compile(r'(\w[\w-]*)="([^"]*)"')
_IDREF_RE = re.compile(r'<itemref\s[^>]*idref="([^"]+)"')
_BLOCK_RE = re.compile(
    r"</?(p|div|br|h[1-6]|li|ul|ol|tr|table|section|article|blockquote)[^>]*>",
    re.I,
)
_SCRIPT_RE = re.compile(r"<(script|style)[^>]*>.*?</\1>", re.S | re.I)
_HEAD_RE = re.compile(r"<head[^>]*>.*?</head>", re.S | re.I)
_TAG_RE = re.compile(r"<[^>]*>")


def _unescape(s: str) -> str:
    s = s.replace("&lt;", "<").replace("&gt;", ">")
    s = s.replace("&quot;", '"').replace("&apos;", "'")
    return s.replace("&amp;", "&")  # LAST — one double-encoding level


def _html_to_text(s: str) -> str:
    s = _HEAD_RE.sub("", s)  # head metadata (title, style links) is not body text
    s = _SCRIPT_RE.sub("", s)
    s = _BLOCK_RE.sub("\n", s)
    s = _TAG_RE.sub("", s)
    s = _unescape(s)
    lines = [re.sub(r"[ \t]+", " ", ln).strip() for ln in s.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def parse_epub_text(payload: bytes) -> tuple[int, str | None, str]:
    """(n_chapters, title, text) following the container → OPF → spine
    chain. ValueError for payloads that are not an EPUB package."""
    if payload is None:
        raise ValueError("epub: null payload")
    try:
        zf = zipfile.ZipFile(io.BytesIO(bytes(payload)))
    except (zipfile.BadZipFile, OSError) as e:
        raise ValueError(f"epub: {e}") from e
    with zf:
        try:
            container = zf.read("META-INF/container.xml").decode("utf-8", "replace")
        except KeyError as e:
            raise ValueError("epub: no container.xml") from e
        m = _ROOTFILE_RE.search(container)
        if m is None:
            raise ValueError("epub: container.xml names no rootfile")
        opf_path = m.group(1)
        try:
            opf = zf.read(opf_path).decode("utf-8", "replace")
        except KeyError as e:
            raise ValueError("epub: missing OPF") from e
        tm = _TITLE_RE.search(opf)
        title = _unescape(tm.group(1).strip()) if tm else None
        manifest: dict[str, str] = {}
        for item in _ITEM_RE.finditer(opf):
            attrs = dict(_ATTR_RE.findall(item.group(0)))
            if "id" in attrs and "href" in attrs:
                manifest[attrs["id"]] = attrs["href"]
        base = posixpath.dirname(opf_path)
        chapters = []
        for idref in _IDREF_RE.findall(opf):
            href = manifest.get(idref)
            if href is None:
                continue
            path = posixpath.normpath(posixpath.join(base, href))
            try:
                xhtml = zf.read(path).decode("utf-8", "replace")
            except KeyError:
                continue  # spine item missing from the package: skip
            chapters.append(_html_to_text(xhtml))
        return len(chapters), title, "\n".join(chapters)


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def encode_epub(title: str, chapters: list[str]) -> bytes:
    """Emit a real minimal EPUB package (fixture builder): stored
    ``mimetype`` first (the spec's layout), container.xml, an OPF under
    ``OEBPS/`` (relative-href manifest + spine), one XHTML per
    chapter."""
    items = "".join(
        f'<item id="c{i}" href="ch{i}.xhtml" media-type="application/xhtml+xml"/>'
        for i in range(len(chapters))
    )
    spine = "".join(f'<itemref idref="c{i}"/>' for i in range(len(chapters)))
    opf = (
        '<?xml version="1.0"?><package xmlns="http://www.idpf.org/2007/opf" version="3.0">'
        f'<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">'
        f"<dc:title>{_esc(title)}</dc:title></metadata>"
        f"<manifest>{items}</manifest><spine>{spine}</spine></package>"
    )
    container = (
        '<?xml version="1.0"?><container version="1.0" '
        'xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
        '<rootfiles><rootfile full-path="OEBPS/content.opf" '
        'media-type="application/oebps-package+xml"/></rootfiles></container>'
    )
    buf = io.BytesIO()
    # compresslevel 1: the lane outputs the extracted TEXT, which is
    # invariant across deflate levels
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED, compresslevel=1) as zf:
        mt = zipfile.ZipInfo("mimetype", date_time=(1980, 1, 1, 0, 0, 0))
        mt.compress_type = zipfile.ZIP_STORED
        zf.writestr(mt, "application/epub+zip")
        for name, data in (
            ("META-INF/container.xml", container),
            ("OEBPS/content.opf", opf),
        ):
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(info, data.encode())
        for i, ch in enumerate(chapters):
            xhtml = (
                "<html><head><title>c</title>"
                "<style>p{margin:0}</style></head><body>"
                f"<p>{_esc(ch)}</p></body></html>"
            )
            info = zipfile.ZipInfo(f"OEBPS/ch{i}.xhtml", date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(info, xhtml.encode())
    return buf.getvalue()


EPUB_TEXT_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_chapters", LongType(), True),
        StructField("title", StringType(), True),
        StructField("text", StringType(), True),
    ]
)


def epub_text(media: DataFrame) -> DataFrame:
    """Spark lane: (media_id, n_chapters, title, text) per EPUB payload
    — Arrow-batched mapInPandas, zero shuffle, per-row degrade."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    n, title, text = parse_epub_text(payload)
                except ValueError:
                    rows.append((mid, None, None, None))
                    continue
                rows.append((mid, n, title, text))
            yield pd.DataFrame(rows, columns=["media_id", "n_chapters", "title", "text"])

    return media.select("media_id", "payload").mapInPandas(extract, EPUB_TEXT_SCHEMA)


def documents_as_epub(docs: DataFrame) -> DataFrame:
    """Adapter: per document a REAL EPUB — title ``Book <id> & Co.``
    (entity round-trip), ``1 + doc_id % 3`` spine chapters where
    chapter i's paragraph is ``Chapter <i>.`` plus the document text
    on chapter 0 — so chapter count, spine order, title decode and the
    chapter text chain are closed-form for ``mm_epub_text``."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                t = (text or "").replace("\r", " ").replace("\n", " ")
                chapters = [
                    f"Chapter {i}." + (f" {t}" if i == 0 else "")
                    for i in range(1 + did % 3)
                ]
                rows.append(
                    (did, "epub", encode_epub(f"Book {did} & Co.", chapters))
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )
    return docs.select("doc_id", "text").mapInPandas(build, schema)
