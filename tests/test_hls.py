"""HLS playlist explosion (operators/markup.py::hls_entries): media vs
master discrimination, EXTINF+URI pairing across comment lines,
header flags, absent-field NULLs, and plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from seaexplorertools_spark.operators.markup import documents_as_m3u8, hls_entries

MEDIA = """#EXTM3U
#EXT-X-VERSION:3
#EXT-X-TARGETDURATION:10
#EXTINF:9.009,First segment
seg-000.ts
#EXT-X-BYTERANGE:1000@0
#EXTINF:8.5,
seg-001.ts
#EXT-X-ENDLIST"""

MASTER = """#EXTM3U
#EXT-X-STREAM-INF:BANDWIDTH=1280000,RESOLUTION=1920x1080,CODECS="avc1"
chunklist_hi.m3u8
#EXT-X-STREAM-INF:BANDWIDTH=640000
chunklist_lo.m3u8"""


def _run(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, m3u8_text string")
    return hls_entries(df).orderBy("entry_idx").collect()


def test_media_playlist(spark):
    rows = _run(spark, MEDIA)
    assert [r["kind"] for r in rows] == ["segment", "segment"]
    a, b = rows
    assert a["uri"] == "seg-000.ts" and a["duration_s"] == 9.009
    assert a["title"] == "First segment"
    assert b["uri"] == "seg-001.ts" and b["title"] is None  # empty title
    assert all(r["target_duration"] == 10 and r["endlist"] for r in rows)
    assert all(r["bandwidth"] is None and r["width"] is None for r in rows)


def test_master_playlist(spark):
    rows = _run(spark, MASTER)
    assert [r["kind"] for r in rows] == ["variant", "variant"]
    a, b = rows
    assert a["uri"] == "chunklist_hi.m3u8" and a["bandwidth"] == 1280000
    assert (a["width"], a["height"]) == (1920, 1080)
    assert b["bandwidth"] == 640000 and b["width"] is None  # no RESOLUTION
    assert all(
        r["duration_s"] is None and not r["endlist"]
        and r["target_duration"] is None
        for r in rows
    )


def test_empty_playlist_no_rows(spark):
    assert _run(spark, "#EXTM3U\n#EXT-X-TARGETDURATION:5") == []


def test_fixture_branches(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = hls_entries(documents_as_m3u8(docs))
    kinds = {r["kind"] for r in out.select("kind").distinct().collect()}
    assert kinds == {"segment", "variant"}
    n_end = out.filter("endlist").select("doc_id").distinct().count()
    assert n_end > 0


def test_stays_jvm_side(spark):
    df = spark.createDataFrame([(1, MEDIA)], "doc_id long, m3u8_text string")
    plan = hls_entries(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
