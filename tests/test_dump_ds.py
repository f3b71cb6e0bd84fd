"""dumpfile DataSource (sources/dump_ds.py): mixed-codec batch scan,
per-file partitioning, stream tail == batch, corrupt degrade."""

from __future__ import annotations

import pytest

from seaexplorertools_spark.sources.dump_ds import DumpDataSource


def _write_all(d, offset=0):
    from seaexplorertools_spark.sources.bson import encode_document
    from seaexplorertools_spark.sources.cbor import encode_value
    from seaexplorertools_spark.sources.msgpack import pack_value

    def rec(i, s):
        return {"doc_id": i, "seq": s, "body": f"b{i}-{s}", "score": i + s / 4.0}

    (d / f"a{offset}.msgpack").write_bytes(
        pack_value(rec(offset + 1, 0)) + pack_value(rec(offset + 1, 1))
    )
    (d / f"b{offset}.cbor").write_bytes(encode_value(rec(offset + 2, 0)))
    (d / f"c{offset}.bson").write_bytes(encode_document(rec(offset + 3, 0)))


def test_batch_scan_mixed_codecs(spark, tmp_path):
    d = tmp_path / "dumps"
    d.mkdir()
    _write_all(d)
    spark.dataSource.register(DumpDataSource)
    df = spark.read.format("dumpfile").load(f"{d}/*.*")
    rows = sorted(
        (r["doc_id"], r["seq"], r["body"], r["score"]) for r in df.collect()
    )
    assert rows == [
        (1, 0, "b1-0", 1.0),
        (1, 1, "b1-1", 1.25),
        (2, 0, "b2-0", 2.0),
        (3, 0, "b3-0", 3.0),
    ]
    # per-file parallelism: one partition per file
    assert df.rdd.getNumPartitions() == 3


def test_stream_tail_equals_batch(spark, tmp_path):
    d = tmp_path / "live"
    d.mkdir()
    _write_all(d, offset=0)
    spark.dataSource.register(DumpDataSource)
    q = (
        spark.readStream.format("dumpfile")
        .load(f"{d}/*.*")
        .writeStream.format("memory")
        .queryName("dump_tail")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        n0 = spark.sql("select count(*) n from dump_tail").collect()[0]["n"]
        assert n0 == 4
        _write_all(d, offset=100)
        q.processAllAvailable()
        stream_ids = sorted(
            r["doc_id"]
            for r in spark.sql("select doc_id from dump_tail").collect()
        )
        batch_ids = sorted(
            r["doc_id"]
            for r in spark.read.format("dumpfile").load(f"{d}/*.*").collect()
        )
        assert stream_ids == batch_ids == [1, 1, 2, 3, 101, 101, 102, 103]
    finally:
        q.stop()


def test_corrupt_and_unknown_ext_degrade(spark, tmp_path):
    d = tmp_path / "bad"
    d.mkdir()
    _write_all(d)
    (d / "junk.cbor").write_bytes(b"\xff\xff\xff")
    (d / "notes.txt").write_bytes(b"hello")
    spark.dataSource.register(DumpDataSource)
    rows = spark.read.format("dumpfile").load(f"{d}/*.*").collect()
    assert sorted(r["doc_id"] for r in rows) == [1, 1, 2, 3]


def test_missing_pattern_raises(spark, tmp_path):
    spark.dataSource.register(DumpDataSource)
    with pytest.raises(Exception):
        spark.read.format("dumpfile").load(f"{tmp_path}/nothing/*.cbor").collect()
