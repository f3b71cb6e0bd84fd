"""Avro OCF DataSource (sources/avro_ds.py): schema inference from the
embedded header, batch scan parity with the payload lane, stream ==
batch equivalence with set-offset pickup, schema-evolution NULLs, and
corrupt-file degrade — the streaming-twin contract shared with the
WARC and NetCDF3 sources."""

from __future__ import annotations

import time

import pytest

from seaexplorertools_spark.sources.avro import write_avro_bytes
from seaexplorertools_spark.sources.avro_ds import AvroDataSource

SCHEMA = {
    "type": "record",
    "name": "doc",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "seq", "type": "long"},
        {"name": "body", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
    ],
}


def _write(path, recs, codec="null"):
    path.write_bytes(write_avro_bytes(recs, SCHEMA, codec=codec))


def _recs(doc_ids):
    return [
        {"doc_id": d, "seq": 0, "body": f"b{d}", "score": float(d)} for d in doc_ids
    ]


def test_schema_inference_and_batch_scan(spark, tmp_path):
    d = tmp_path / "dumps"
    d.mkdir()
    _write(d / "a.avro", _recs([1, 2]))
    _write(d / "b.avro", _recs([10]), codec="deflate")

    spark.dataSource.register(AvroDataSource)
    df = spark.read.format("avrofile").load(f"{d}/*.avro")
    assert [f.name for f in df.schema.fields] == [
        "src_file", "doc_id", "seq", "body", "score",
    ]
    assert dict(df.dtypes)["doc_id"] == "bigint"
    assert dict(df.dtypes)["score"] == "double"
    assert df.schema["body"].nullable
    rows = sorted(df.collect(), key=lambda r: r["doc_id"])
    assert [(r["doc_id"], r["body"], r["score"]) for r in rows] == [
        (1, "b1", 1.0), (2, "b2", 2.0), (10, "b10", 10.0),
    ]
    assert all(r["src_file"].endswith(".avro") for r in rows)


def test_schema_evolution_missing_field_is_null(spark, tmp_path):
    d = tmp_path / "evolve"
    d.mkdir()
    _write(d / "full.avro", _recs([1]))
    old = {
        "type": "record",
        "name": "doc",
        "fields": [
            {"name": "doc_id", "type": "long"},
            {"name": "seq", "type": "long"},
        ],
    }
    (d / "old.avro").write_bytes(
        write_avro_bytes([{"doc_id": 5, "seq": 0}], old)
    )
    spark.dataSource.register(AvroDataSource)
    # inference uses the FIRST file (lexicographic: full.avro)
    rows = sorted(
        spark.read.format("avrofile").load(f"{d}/*.avro").collect(),
        key=lambda r: r["doc_id"],
    )
    assert [(r["doc_id"], r["body"], r["score"]) for r in rows] == [
        (1, "b1", 1.0), (5, None, None),
    ]


def test_stream_tail_equals_batch(spark, tmp_path):
    d = tmp_path / "live"
    d.mkdir()
    _write(d / "seg_b.avro", _recs([1, 2]))

    spark.dataSource.register(AvroDataSource)
    q = (
        spark.readStream.format("avrofile")
        .load(f"{d}/*.avro")
        .writeStream.format("memory")
        .queryName("avro_tail")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("select count(*) n from avro_tail").collect()[0]["n"] == 2
        # later file sorting EARLIER: set offset picks it up, no re-read
        _write(d / "seg_a.avro", _recs([10, 11, 12]), codec="deflate")
        # processAllAvailable can race the prefetching SimpleStreamReader
        # wrapper's latestOffset poll under load (observed ~1/900 full-suite
        # runs): bounded retry, still asserting the file IS picked up.
        deadline = time.time() + 60
        while True:
            q.processAllAvailable()
            rows = spark.sql("select doc_id from avro_tail").collect()
            if len(rows) == 5 or time.time() > deadline:
                break
            time.sleep(0.5)
        assert sorted(r["doc_id"] for r in rows) == [1, 2, 10, 11, 12]
        batch = spark.read.format("avrofile").load(f"{d}/*.avro").collect()
        assert sorted(r["doc_id"] for r in batch) == [1, 2, 10, 11, 12]
    finally:
        q.stop()


def test_corrupt_file_degrades(spark, tmp_path):
    d = tmp_path / "bad"
    d.mkdir()
    _write(d / "a_ok.avro", _recs([1]))
    (d / "broken.avro").write_bytes(b"Obj\x01 not really avro")
    spark.dataSource.register(AvroDataSource)
    rows = spark.read.format("avrofile").load(f"{d}/*.avro").collect()
    assert [r["doc_id"] for r in rows] == [1]


def test_missing_pattern_raises(spark, tmp_path):
    spark.dataSource.register(AvroDataSource)
    with pytest.raises(Exception):
        spark.read.format("avrofile").load(f"{tmp_path}/nope/*.avro").collect()
