"""WARC record parsing — the Common Crawl ingest format, pure python.

Web-scale pretraining corpora arrive as WARC (ISO 28500): concatenated
records, each a ``WARC/1.x`` version line + CRLF headers +
``Content-Length`` octets of body + CRLF CRLF, the whole file usually
gzip-compressed (often per-record multi-member gzip, which stdlib zlib
decodes member-by-member). This module:

- ``gunzip_members``: decompress single- or multi-member gzip with a
  decode budget (bomb guard — a 1 KB payload can't inflate to GBs);
- ``parse_warc_records``: record splitter honoring Content-Length (body
  bytes are OPAQUE — a body containing ``WARC/1.0`` cannot confuse the
  walk), tolerant header parse, bounded by payload size;
- ``warc_records``: the mapInPandas lane — one row per (payload,
  record) with WARC-Type, WARC-Target-URI, Content-Length and the
  UTF-8-decoded body; malformed payloads degrade to zero rows for that
  payload, never a failed job;
- ``documents_as_warc``: fixture adapter (closed-form in doc_id, half
  the corpus gzip-compressed) — gzip is lossless, so the whole
  gunzip → record-walk path sits under an exact SQL oracle
  (``mm_warc_records``).

Reference scope: no ingest surface in the reference engine; LLM-pipeline
lane (SURVEY §6).
"""

from __future__ import annotations

import zlib
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

_MAX_INFLATE = 1 << 26  # decode budget: bound untrusted expansion


def gunzip_members(payload: bytes) -> bytes:
    """Decompress a gzip stream of one or MORE members (the per-record
    form WARC writers emit) into one bytes object. ValueError on corrupt
    streams or when inflation exceeds the decode budget."""
    out = bytearray()
    data = bytes(payload)
    while data:
        d = zlib.decompressobj(wbits=31)
        try:
            out += d.decompress(data, _MAX_INFLATE + 1 - len(out))
        except zlib.error as e:
            raise ValueError(f"corrupt gzip member: {e}") from e
        if len(out) > _MAX_INFLATE:
            raise ValueError("gzip payload exceeds decode budget")
        if not d.eof:
            raise ValueError("truncated gzip member")
        data = d.unused_data
    return bytes(out)


def parse_warc_records(payload: bytes | None) -> list[dict]:
    """WARC bytes (plain or gzip) → list of records
    ``{version, headers: {lower-name: value}, body: bytes}``. Body bytes
    are consumed by Content-Length, never scanned — a body containing a
    ``WARC/1.0`` line cannot desynchronize the walk. ValueError for
    non-WARC payloads or corrupt structure."""
    if payload is None:
        raise ValueError("not a WARC payload")
    b = bytes(payload)
    if b[:2] == b"\x1f\x8b":
        b = gunzip_members(b)
    if not b.startswith(b"WARC/"):
        raise ValueError("not a WARC payload")
    records: list[dict] = []
    i = 0
    while i < len(b):
        if b[i:].startswith(b"\r\n"):
            i += 2
            continue
        eol = b.find(b"\r\n", i)
        if eol < 0:
            raise ValueError("truncated WARC version line")
        version = b[i:eol].decode("ascii", "replace")
        if not version.startswith("WARC/"):
            raise ValueError(f"WARC record sync lost at {i}")
        hdr_end = b.find(b"\r\n\r\n", eol)
        if hdr_end < 0:
            raise ValueError("truncated WARC header block")
        headers: dict[str, str] = {}
        for line in b[eol + 2 : hdr_end].split(b"\r\n"):
            k, _, v = line.partition(b":")
            if _:
                headers[k.decode("ascii", "replace").strip().lower()] = (
                    v.decode("utf-8", "replace").strip()
                )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError as e:
            raise ValueError("WARC record without a valid Content-Length") from e
        body_start = hdr_end + 4
        if clen < 0 or body_start + clen > len(b):
            raise ValueError("WARC Content-Length exceeds payload")
        records.append(
            {
                "version": version,
                "headers": headers,
                "body": b[body_start : body_start + clen],
            }
        )
        i = body_start + clen
    return records


WARC_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("rec_idx", LongType(), False),
        StructField("warc_type", StringType(), True),
        StructField("target_uri", StringType(), True),
        StructField("content_length", LongType(), True),
        StructField("body", StringType(), True),
    ]
)


def warc_records(media: DataFrame) -> DataFrame:
    """mapInPandas WARC explode: one row per (payload, record) with
    WARC-Type, WARC-Target-URI, Content-Length and the UTF-8-decoded
    body. Gzip (single- or multi-member) is transparent. Malformed
    payloads contribute zero rows (per-payload degrade, never a failed
    job; the caller anti-joins for coverage). Zero shuffle."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "rec_idx", "warc_type", "target_uri",
                "content_length", "body"]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    recs = parse_warc_records(
                        bytes(payload) if payload is not None else None
                    )
                except ValueError:
                    continue
                for k, r in enumerate(recs):
                    h = r["headers"]
                    rows.append(
                        (
                            mid, k,
                            h.get("warc-type"),
                            h.get("warc-target-uri"),
                            len(r["body"]),
                            r["body"].decode("utf-8", "replace"),
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "payload").mapInPandas(extract, WARC_SCHEMA)


def documents_as_warc(docs: DataFrame) -> DataFrame:
    """Adapter: one WARC file per document — a ``warcinfo`` record with
    a fixed body and a ``response`` record whose target URI derives from
    doc_id and whose body is the document text; ODD doc_ids are emitted
    as per-record multi-member gzip (the Common Crawl layout), even ones
    plain. Gzip is lossless so both halves sit under one exact oracle.
    mapInPandas, zero shuffle."""
    import gzip as _gzip

    info_body = b"software: seaexplorertools_spark"

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def record(wtype: str, body: bytes, extra: dict[str, str]) -> bytes:
            hdrs = {"WARC-Type": wtype, **extra, "Content-Length": str(len(body))}
            head = b"WARC/1.0\r\n" + b"".join(
                f"{k}: {v}\r\n".encode() for k, v in hdrs.items()
            )
            return head + b"\r\n" + body + b"\r\n\r\n"

        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                uri = f"http://site{did % 40}.example.com/doc/{did}"
                r0 = record("warcinfo", info_body, {})
                r1 = record("response", str(text).encode(), {"WARC-Target-URI": uri})
                if did % 2:
                    payload = _gzip.compress(r0, 1, mtime=0) + _gzip.compress(
                        r1, 1, mtime=0
                    )
                else:
                    payload = r0 + r1
                rows.append((did, "warc", payload))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )
    return docs.select("doc_id", "text").mapInPandas(build, schema)


HTTP_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("rec_idx", LongType(), False),
        StructField("target_uri", StringType(), True),
        StructField("status_code", LongType(), True),
        StructField("content_type", StringType(), True),
        StructField("http_body", StringType(), True),
    ]
)


def split_http_response(body: bytes) -> tuple | None:
    """WARC ``response`` record body → ``(status_code, headers dict
    (lower-name), payload bytes)`` — Common Crawl stores the raw HTTP
    response INSIDE the WARC body; the payload starts after the first
    CRLFCRLF. None when the body is not an HTTP response (kept opaque).
    Header names lowercase; first occurrence wins; a malformed header
    line is skipped, not fatal."""
    if not body.startswith(b"HTTP/"):
        return None
    sep = body.find(b"\r\n\r\n")
    if sep < 0:
        return None
    head = body[:sep].split(b"\r\n")
    parts = head[0].split(b" ", 2)
    if len(parts) < 2 or not parts[1].isdigit():
        return None
    status = int(parts[1])
    headers: dict[str, str] = {}
    for line in head[1:]:
        k, eq, v = line.partition(b":")
        if eq and k:
            name = k.decode("ascii", "replace").strip().lower()
            if name not in headers:
                headers[name] = v.decode("utf-8", "replace").strip()
    return status, headers, body[sep + 4 :]


def warc_http_records(media: DataFrame) -> DataFrame:
    """mapInPandas WARC→HTTP explode: one row per ``response`` record
    whose body is an HTTP response — status code, Content-Type, and the
    UTF-8-decoded payload after the header block. Records of other
    types, or response bodies that are not HTTP, are dropped (the plain
    ``warc_records`` lane keeps them); malformed payloads contribute
    zero rows. Zero shuffle — the ingest shape of a Common Crawl
    segment: WARC framing outside, HTTP framing inside."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "rec_idx", "target_uri", "status_code",
                "content_type", "http_body"]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    recs = parse_warc_records(
                        bytes(payload) if payload is not None else None
                    )
                except ValueError:
                    continue
                for k, r in enumerate(recs):
                    if r["headers"].get("warc-type") != "response":
                        continue
                    sp = split_http_response(r["body"])
                    if sp is None:
                        continue
                    status, hh, pay = sp
                    rows.append(
                        (mid, k, r["headers"].get("warc-target-uri"),
                         status, hh.get("content-type"),
                         pay.decode("utf-8", "replace"))
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "payload").mapInPandas(extract, HTTP_SCHEMA)


def documents_as_http_warc(docs: DataFrame) -> DataFrame:
    """Adapter: Common-Crawl-shaped WARC per document — a warcinfo
    record plus a ``response`` record whose body is a REAL HTTP
    response: status cycles 200/404/301 (with matching reason), a
    Content-Type cycling text/html / text/plain / application/json, an
    X-Doc header, and the document text as the payload. Odd ids are
    per-record-gzipped. Everything ``mm_warc_http`` checks is doc_id
    arithmetic + the text column. mapInPandas, zero shuffle."""
    import gzip as _gzip

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def record(wtype: str, body: bytes, extra: dict[str, str]) -> bytes:
            hdrs = {"WARC-Type": wtype, **extra, "Content-Length": str(len(body))}
            head = b"WARC/1.0\r\n" + b"".join(
                f"{k}: {v}\r\n".encode() for k, v in hdrs.items()
            )
            return head + b"\r\n" + body + b"\r\n\r\n"

        statuses = [(200, "OK"), (404, "Not Found"), (301, "Moved Permanently")]
        ctypes = ["text/html; charset=utf-8", "text/plain", "application/json"]
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                code, reason = statuses[did % 3]
                http = (
                    f"HTTP/1.1 {code} {reason}\r\n"
                    f"Content-Type: {ctypes[did % 3]}\r\n"
                    f"X-Doc: {did}\r\n\r\n"
                ).encode() + str(text).encode()
                uri = f"http://site{did % 40}.example.com/doc/{did}"
                r0 = record("warcinfo", b"software: seaexplorertools_spark", {})
                r1 = record("response", http, {"WARC-Target-URI": uri})
                payload = (
                    _gzip.compress(r0, 1, mtime=0) + _gzip.compress(r1, 1, mtime=0)
                    if did % 2 else r0 + r1
                )
                rows.append((did, "warc", payload))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )
    return docs.select("doc_id", "text").mapInPandas(build, schema)
