"""GeoJSON VARIANT lane (operators/geojson.py): per-geometry bbox
semantics, outer-ring-only Polygon handling, unknown-type and
malformed degrade, and plan shape (no Python workers)."""

from __future__ import annotations

from seaexplorertools_spark.operators.geojson import (
    documents_as_geojson,
    geojson_features,
)

GJ = (
    '{"type":"FeatureCollection","features":['
    '{"type":"Feature","geometry":{"type":"Point","coordinates":[10.5,-2]},'
    '"properties":{"name":"pt"}},'
    '{"type":"Feature","geometry":{"type":"LineString",'
    '"coordinates":[[0,0],[4,1],[2,5]]},"properties":{}},'
    '{"type":"Feature","geometry":{"type":"Polygon","coordinates":'
    '[[[0,0],[2,0],[2,3],[0,3],[0,0]],[[1,1],[1.5,1],[1,1.5],[1,1]]]},'
    '"properties":{"name":"sq"}}]}'
)


def _run(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, geojson string")
    return geojson_features(df).orderBy("feat_idx").collect()


def test_geometries(spark):
    pt, ls, pg = _run(spark, GJ)
    assert (pt["geom_type"], pt["name"], pt["n_points"]) == ("Point", "pt", 1)
    assert (pt["min_x"], pt["max_x"], pt["min_y"]) == (10.5, 10.5, -2.0)
    assert (ls["n_points"], ls["min_x"], ls["max_x"]) == (3, 0.0, 4.0)
    assert (ls["min_y"], ls["max_y"], ls["name"]) == (0.0, 5.0, None)
    # polygon bbox uses the OUTER ring only (the hole must not shrink it)
    assert (pg["n_points"], pg["max_x"], pg["max_y"]) == (5, 2.0, 3.0)


def test_unknown_geometry_degrades(spark):
    t = (
        '{"type":"FeatureCollection","features":[{"type":"Feature",'
        '"geometry":{"type":"Blob","coordinates":true},"properties":{}}]}'
    )
    r = _run(spark, t)[0]
    assert r["geom_type"] == "Blob"
    assert r["n_points"] is None and r["min_x"] is None


def test_malformed_and_empty(spark):
    assert _run(spark, "not json") == []
    assert _run(spark, '{"type":"FeatureCollection","features":[]}') == []


def test_fixture_rotates_types(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = geojson_features(documents_as_geojson(docs))
    types = {r["geom_type"] for r in out.select("geom_type").distinct().collect()}
    assert types == {"Point", "LineString", "Polygon", "Weird"}


def test_stays_jvm_side(spark):
    df = spark.createDataFrame([(1, GJ)], "doc_id long, geojson string")
    plan = geojson_features(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
