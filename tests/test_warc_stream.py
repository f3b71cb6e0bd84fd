"""WARC directory tailing (sources/warc_ds.py): batch scan parity with
the mapInPandas lane, stream == batch equivalence, growing-directory
pickup without re-reads, lexicographic-inversion safety, and corrupt-
file degrade — the streaming twin contract established by the NetCDF3
source."""

from __future__ import annotations

import gzip

import pytest

from seaexplorertools_spark.sources.warc_ds import WarcDataSource


def _record(wtype: str, body: bytes, extra: dict | None = None) -> bytes:
    hdrs = {"WARC-Type": wtype, **(extra or {}), "Content-Length": str(len(body))}
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode() for k, v in hdrs.items()
    )
    return head + b"\r\n" + body + b"\r\n\r\n"


def _write_warc(path, n_docs: int, start: int = 0, gz: bool = False) -> None:
    blob = b""
    for i in range(start, start + n_docs):
        blob += _record(
            "response",
            f"doc body {i}".encode(),
            {"WARC-Target-URI": f"http://example.com/{i}"},
        )
    path.write_bytes(gzip.compress(blob, 1, mtime=0) if gz else blob)


def test_batch_scan_matches_mapinpandas_lane(spark, tmp_path):
    from seaexplorertools_spark.operators.warc import warc_records

    d = tmp_path / "crawl"
    d.mkdir()
    _write_warc(d / "seg_0.warc", 3, 0)
    _write_warc(d / "seg_1.warc.gz", 2, 10, gz=True)

    spark.dataSource.register(WarcDataSource)
    got = (
        spark.read.format("warcfile").load(f"{d}/*.warc*")
        .orderBy("src_file", "rec_idx")
        .collect()
    )
    assert len(got) == 5
    assert [r["target_uri"].rsplit("/", 1)[1] for r in got] == [
        "0", "1", "2", "10", "11"
    ]
    assert all(r["warc_type"] == "response" for r in got)

    # parity with the batch mapInPandas lane on the same bytes
    media = spark.createDataFrame(
        [(0, bytearray((d / "seg_0.warc").read_bytes()))],
        "media_id long, payload binary",
    )
    lane = warc_records(media).orderBy("rec_idx").collect()
    ds0 = [r for r in got if r["src_file"].endswith("seg_0.warc")]
    assert [(r["target_uri"], r["content_length"], r["body"]) for r in lane] == [
        (r["target_uri"], r["content_length"], r["body"]) for r in ds0
    ]


def test_stream_tail_equals_batch_and_never_rereads(spark, tmp_path):
    d = tmp_path / "live"
    d.mkdir()
    _write_warc(d / "seg_b.warc", 2, 0)

    spark.dataSource.register(WarcDataSource)
    q = (
        spark.readStream.format("warcfile")
        .load(f"{d}/*.warc*")
        .writeStream.format("memory")
        .queryName("warc_tail")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        n1 = spark.sql("select count(*) n from warc_tail").collect()[0]["n"]
        assert n1 == 2
        # a later file that sorts BEFORE the first (set offset, not cursor)
        _write_warc(d / "seg_a.warc.gz", 3, 10, gz=True)
        q.processAllAvailable()
        rows = spark.sql(
            "select src_file, rec_idx, target_uri from warc_tail"
        ).collect()
        assert len(rows) == 5  # no re-read of seg_b
        uris = sorted(r["target_uri"] for r in rows)
        assert uris == [f"http://example.com/{i}" for i in (0, 1, 10, 11, 12)]
        # stream == batch on the final directory state
        batch = spark.read.format("warcfile").load(f"{d}/*.warc*").collect()
        assert sorted((r["src_file"], r["rec_idx"]) for r in rows) == sorted(
            (r["src_file"], r["rec_idx"]) for r in batch
        )
    finally:
        q.stop()


def test_corrupt_file_degrades_to_zero_rows(spark, tmp_path):
    d = tmp_path / "bad"
    d.mkdir()
    _write_warc(d / "ok.warc", 1, 0)
    (d / "broken.warc").write_bytes(b"WARC/1.0\r\nContent-Length: 999\r\n\r\nxx")
    (d / "junk.warc.gz").write_bytes(b"\x1f\x8bnot really gzip")

    spark.dataSource.register(WarcDataSource)
    rows = spark.read.format("warcfile").load(f"{d}/*.warc*").collect()
    assert len(rows) == 1 and rows[0]["target_uri"] == "http://example.com/0"


def test_directory_path_and_missing_pattern(spark, tmp_path):
    d = tmp_path / "dir"
    d.mkdir()
    _write_warc(d / "one.warc", 2, 5)
    spark.dataSource.register(WarcDataSource)
    rows = spark.read.format("warcfile").load(str(d)).collect()
    assert len(rows) == 2
    with pytest.raises(Exception):
        spark.read.format("warcfile").load(f"{tmp_path}/nope/*.warc").collect()


def test_split_http_response_edges():
    from seaexplorertools_spark.operators.warc import split_http_response

    ok = split_http_response(
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"content-type: dup ignored\r\nBadLine\r\n\r\nbody\r\nwith crlf"
    )
    assert ok[0] == 200
    assert ok[1]["content-type"] == "text/html"  # first wins, lowercased
    assert ok[2] == b"body\r\nwith crlf"  # payload CRLFs preserved
    assert split_http_response(b"not http") is None
    assert split_http_response(b"HTTP/1.1 abc\r\n\r\nx") is None
    assert split_http_response(b"HTTP/1.1 200 OK\r\nno terminator") is None


def test_warc_http_lane_drops_non_http_and_warcinfo(spark):
    from seaexplorertools_spark.operators.warc import (
        documents_as_warc,
        warc_http_records,
    )

    docs = spark.createDataFrame([(1, "plain body")], "doc_id long, text string")
    # documents_as_warc writes BARE text bodies (no HTTP framing):
    # the HTTP lane must produce zero rows for them
    assert warc_http_records(documents_as_warc(docs)).count() == 0
