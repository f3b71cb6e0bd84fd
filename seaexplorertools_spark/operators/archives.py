"""Archive ingest — ZIP and TAR (plain / tar.gz) member explosion.

A large share of raw training corpora arrives as archives of small
files (code dumps, scraped site mirrors, dataset shards). These lanes
explode an archive payload column into one row per member — (archive
id, member index, member name, byte size, UTF-8 text) — the same
mapInPandas shape as the WARC record walk (operators/warc.py):
Arrow-batched, zero shuffle, malformed archives degrade to ZERO rows
for that payload instead of failing the job.

Both readers are the stdlib parsers (``zipfile`` / ``tarfile`` over an
in-memory ``BytesIO``) with the same hostile-input posture as the
hand-written codecs: per-member size cap (decompression-bomb guard),
regular-file members only, text decoded UTF-8 with replacement so a
binary member can't kill the row.

ZIP's per-member CRC-32 is verified by the stdlib on read, and gzip'd
tars are transparent (``mode="r:*"``), so both lanes are lossless —
which is what lets ``mm_zip_records`` / ``mm_tar_records`` run the full
build→walk→explode path under exact constructor oracles.

Reference parity: the reference engine reads loose NetCDF files
(`/root/reference/seaexplorertools/process_adcp.py:140`); archive
explosion is part of the large-scale ingest surface the brief adds.
"""

from __future__ import annotations

import io
import tarfile
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

ARCHIVE_RECORD_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("member_idx", LongType(), False),
        StructField("name", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("text", StringType(), True),
    ]
)

_MAX_MEMBER = 64 * 1024 * 1024  # per-member inflate cap (bomb guard)


def _zip_members(payload: bytes) -> list[tuple[str, bytes]]:
    out = []
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            if info.file_size > _MAX_MEMBER:
                raise ValueError("zip member exceeds inflate cap")
            out.append((info.filename, zf.read(info)))
    return out


def _tar_members(payload: bytes) -> list[tuple[str, bytes]]:
    out = []
    with tarfile.open(fileobj=io.BytesIO(payload), mode="r:*") as tf:
        for info in tf:
            if not info.isreg():
                continue
            if info.size > _MAX_MEMBER:
                raise ValueError("tar member exceeds inflate cap")
            f = tf.extractfile(info)
            out.append((info.name, f.read() if f is not None else b""))
    return out


def _records_lane(media: DataFrame, walk) -> DataFrame:
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "member_idx", "name", "n_bytes", "text"]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    members = walk(bytes(payload))
                except Exception:  # malformed archive → zero rows
                    continue
                for idx, (name, data) in enumerate(members):
                    rows.append(
                        (mid, idx, name, len(data), data.decode("utf-8", "replace"))
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "payload").mapInPandas(
        extract, ARCHIVE_RECORD_SCHEMA
    )


def zip_records(media: DataFrame) -> DataFrame:
    """Explode ZIP payloads into one row per member (archive order).
    CRC-32 verified by the stdlib read; STORED and DEFLATED members;
    malformed archives and directory entries are skipped."""
    return _records_lane(media, _zip_members)


def tar_records(media: DataFrame) -> DataFrame:
    """Explode TAR payloads (plain or gzip-compressed, auto-detected)
    into one row per regular-file member."""
    return _records_lane(media, _tar_members)


def _doc_members(did: int, text: str, lang: str) -> list[tuple[str, bytes]]:
    """The fixture member layout shared by both adapters: body + meta."""
    return [
        (f"doc/{did}/body.txt", (text or "").encode("utf-8")),
        (f"doc/{did}/meta.txt", f"lang={lang}".encode()),
    ]


def documents_as_zip(docs: DataFrame) -> DataFrame:
    """Adapter: pack each document into a REAL two-member ZIP —
    ``doc/<id>/body.txt`` (the text) and ``doc/<id>/meta.txt``
    (``lang=<lang>``) — STORED for even doc_ids, DEFLATED for odd, with
    a fixed DOS timestamp so payloads are deterministic. ZIP is
    lossless, so ``mm_zip_records``'s exploded rows are closed-form in
    (doc_id, text, lang): one constructor oracle pins the central
    directory walk, both compression methods and the CRC check."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text, lang in zip(pdf["doc_id"], pdf["text"], pdf["lang"]):
                did = int(did)
                method = zipfile.ZIP_STORED if did % 2 == 0 else zipfile.ZIP_DEFLATED
                buf = io.BytesIO()
                with zipfile.ZipFile(buf, "w", compresslevel=1) as zf:
                    for name, data in _doc_members(did, text, lang):
                        info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
                        info.compress_type = method
                        zf.writestr(info, data)
                rows.append((did, "archive", buf.getvalue()))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )
    return docs.select("doc_id", "text", "lang").mapInPandas(build, schema)


def documents_as_tar(docs: DataFrame) -> DataFrame:
    """Adapter: the TAR twin of documents_as_zip — same two members per
    document, plain ustar for even doc_ids and gzip-compressed
    (``mtime=0`` for determinism) for odd, so ``mm_tar_records`` pins
    the header walk AND the transparent-gunzip branch with the same
    constructor oracle."""
    import gzip

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text, lang in zip(pdf["doc_id"], pdf["text"], pdf["lang"]):
                did = int(did)
                buf = io.BytesIO()
                with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
                    for name, data in _doc_members(did, text, lang):
                        info = tarfile.TarInfo(name)
                        info.size = len(data)
                        info.mtime = 0
                        tf.addfile(info, io.BytesIO(data))
                payload = buf.getvalue()
                if did % 2 == 1:
                    # level 1: outputs are the DECODED members — any
                    # valid deflate stream is result-identical
                    payload = gzip.compress(payload, 1, mtime=0)
                rows.append((did, "archive", payload))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )
    return docs.select("doc_id", "text", "lang").mapInPandas(build, schema)


COMPRESSED_TEXT_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("codec", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("text", StringType(), True),
    ]
)


def _sniff_decompress(b: bytes) -> tuple[str, bytes]:
    """(codec name, decompressed bytes) for gzip / bzip2 / xz payloads
    by magic, each behind the same inflate cap. ValueError otherwise."""
    if b[:2] == b"\x1f\x8b":
        import zlib

        d = zlib.decompressobj(31)  # gzip wrapper
        out = d.decompress(b, _MAX_MEMBER)
        if d.unconsumed_tail:
            raise ValueError("gzip payload exceeds inflate cap")
        return "gzip", out
    if b[:3] == b"BZh":
        import bz2

        d = bz2.BZ2Decompressor()
        out = d.decompress(b, _MAX_MEMBER)
        if not d.eof and d.needs_input is False:
            raise ValueError("bzip2 payload exceeds inflate cap")
        return "bzip2", out
    if b[:6] == b"\xfd7zXZ\x00":
        import lzma

        d = lzma.LZMADecompressor()
        out = d.decompress(b, _MAX_MEMBER)
        if not d.eof and d.needs_input is False:
            raise ValueError("xz payload exceeds inflate cap")
        return "xz", out
    raise ValueError("not a gzip/bzip2/xz payload")


def decompress_text(media: DataFrame) -> DataFrame:
    """Transparent single-file decompression — the lane a dump-file
    corpus (\\*.txt.gz, \\*.bz2 wiki dumps, \\*.xz tarball shards) runs at
    ingest: sniff gzip/bzip2/xz by magic, inflate under the member cap,
    decode UTF-8 with replacement. (media_id, codec, n_bytes, text);
    unrecognized/corrupt payloads degrade to NULLs. Arrow-batched
    mapInPandas, zero shuffle."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "codec", "n_bytes", "text"]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((mid, None, None, None))
                    continue
                try:
                    codec, out = _sniff_decompress(bytes(payload))
                except Exception:
                    rows.append((mid, None, None, None))
                    continue
                rows.append((mid, codec, len(out), out.decode("utf-8", "replace")))
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "payload").mapInPandas(
        extract, COMPRESSED_TEXT_SCHEMA
    )


def documents_as_compressed(docs: DataFrame) -> DataFrame:
    """Adapter: each document's text compressed with gzip (mtime=0) /
    bzip2 / xz rotating on doc_id % 3 — all three codecs lossless, so
    ``mm_compressed_text``'s constructor oracle pins every sniff branch
    and the inflate byte counts in one query."""
    import bz2
    import gzip
    import lzma

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                raw = (text or "").encode("utf-8")
                if did % 3 == 0:
                    # level 1 everywhere below: the lane outputs the
                    # DECOMPRESSED bytes, identical at every level
                    payload = gzip.compress(raw, 1, mtime=0)
                elif did % 3 == 1:
                    payload = bz2.compress(raw, 1)
                else:
                    # preset 0: the xz container/filter chain under test is
                    # identical at every preset and the lane's outputs are
                    # the DECOMPRESSED bytes — preset 6 spent ~4.7× the CPU
                    # of the whole lane on constructor-side entropy coding
                    payload = lzma.compress(raw, preset=0)
                rows.append((did, "compressed", payload))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )
    return docs.select("doc_id", "text").mapInPandas(build, schema)
