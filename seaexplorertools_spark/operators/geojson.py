"""GeoJSON feature explosion — the geo-metadata ingest lane, built on
Spark 4's VARIANT type.

GeoJSON (RFC 7946) is schema-heterogeneous where it matters: a
geometry's ``coordinates`` nesting depth depends on its type (Point =
pair, LineString = array of pairs, Polygon = array of rings), so a
fixed ``from_json`` schema can't hold it. This lane is the showcase
for the right Spark-4 answer: ``parse_json`` → VARIANT, typed path
access with ``try_variant_get``, and VARIANT-array ``transform`` /
``array_min``/``array_max`` for the bbox math — all JVM-side, no
Python worker, zero shuffle.

Per feature: geometry type, the ``name`` property, vertex count and
the bounding box. Polygon uses the OUTER ring (index 0) for both count
and bbox, per the RFC's ring ordering. Unknown geometry types and
malformed documents degrade to NULL fields / zero rows.

Reference parity: no geo path exists in the reference
(`/root/reference/seaexplorertools/process_adcp.py`) beyond scalar
lat/lon columns; part of the web-ingest surface the brief adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def geojson_features(
    df: DataFrame, key: str = "doc_id", gj: str = "geojson"
) -> DataFrame:
    """Explode a FeatureCollection into one row per feature:
    (key, feat_idx, geom_type, name, n_points, min_x, min_y, max_x,
    max_y)."""
    # try_parse_json: malformed documents → NULL variant → zero rows
    # (plain parse_json THROWS, which would violate the degrade contract)
    v = F.try_parse_json(F.col(gj))
    feats = F.try_variant_get(v, "$.features", "array<variant>")
    e = df.select(key, F.posexplode(feats).alias("feat_idx", "f"))
    f = F.col("f")
    gtype = F.try_variant_get(f, "$.geometry.type", "string")
    name = F.try_variant_get(f, "$.properties.name", "string")
    coords = F.try_variant_get(f, "$.geometry.coordinates", "array<variant>")
    ring0 = F.try_variant_get(
        f, "$.geometry.coordinates[0]", "array<variant>"
    )
    point_pair = F.try_variant_get(f, "$.geometry.coordinates", "variant")
    pts = (
        F.when(gtype == "Point", F.array(point_pair))
        .when(gtype == "LineString", coords)
        .when(gtype == "Polygon", ring0)
    )
    xs = F.transform(pts, lambda c: F.try_variant_get(c, "$[0]", "double"))
    ys = F.transform(pts, lambda c: F.try_variant_get(c, "$[1]", "double"))
    return e.select(
        key,
        F.col("feat_idx").cast("long").alias("feat_idx"),
        gtype.alias("geom_type"),
        name.alias("name"),
        F.when(pts.isNotNull(), F.size(pts).cast("long")).alias("n_points"),
        F.array_min(xs).alias("min_x"),
        F.array_min(ys).alias("min_y"),
        F.array_max(xs).alias("max_x"),
        F.array_max(ys).alias("max_y"),
    )


def documents_as_geojson(docs: DataFrame) -> DataFrame:
    """Adapter: per document a FeatureCollection of ``1 + doc_id % 2``
    features rotating geometry by doc_id % 3 — Point (half-integer
    coords), LineString (3 vertices), Polygon (closed 5-vertex square
    ring) — name property only on feature 0 (NULL branch), plus an
    unknown-geometry decoy feature on doc_id % 7 == 0 (NULL-fields
    branch). Closed-form in doc_id for ``q_geojson_features``."""
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731

    def geom():
        a, b = d % 6, d % 5
        point = F.concat(
            F.lit('{"type":"Point","coordinates":['),
            s(d % 10), F.lit(".5,"), s(d % 7), F.lit(".25]}"),
        )
        line = F.concat(
            F.lit('{"type":"LineString","coordinates":[['),
            s(d % 4), F.lit(","), s(d % 3), F.lit("],["),
            s(d % 4 + 2), F.lit(","), s(d % 3 + 1), F.lit("],["),
            s(d % 4 + 4), F.lit(","), s(d % 3 + 2), F.lit("]]}"),
        )
        poly = F.concat(
            F.lit('{"type":"Polygon","coordinates":[[['),
            s(a), F.lit(","), s(b), F.lit("],["),
            s(a + 2), F.lit(","), s(b), F.lit("],["),
            s(a + 2), F.lit(","), s(b + 3), F.lit("],["),
            s(a), F.lit(","), s(b + 3), F.lit("],["),
            s(a), F.lit(","), s(b), F.lit("]]]}"),
        )
        return (
            F.when(d % 3 == 0, point)
            .when(d % 3 == 1, line)
            .otherwise(poly)
        )

    def feature(i: int):
        props = (
            F.concat(F.lit('{"name":"f'), s(d), F.lit(f'-{i}"}}'))
            if i == 0
            else F.lit("{}")
        )
        return F.concat(
            F.lit('{"type":"Feature","geometry":'), geom(),
            F.lit(',"properties":'), props, F.lit("}"),
        )

    decoy = F.lit(
        '{"type":"Feature","geometry":{"type":"Weird","coordinates":8},'
        '"properties":{}}'
    )
    feats = F.concat_ws(
        ",",
        feature(0),
        F.when(d % 2 == 1, feature(1)),
        F.when(d % 7 == 0, decoy),
    )
    body = F.concat(
        F.lit('{"type":"FeatureCollection","features":['), feats, F.lit("]}")
    )
    return docs.select("doc_id", body.alias("geojson"))
