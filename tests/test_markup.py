"""Sitemap and SVG markup lanes (pure-JVM regex): urlset vs
sitemapindex, optional fields, root-tag-only dimension anchoring,
tag-stripped text extraction, degrade cases, and plan purity."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_sitemap_urlset(spark):
    from seaexplorertools_spark.operators.markup import sitemap_urls

    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc> https://a.example.com/1 </loc>"
        "<lastmod>2024-01-15</lastmod><priority>0.8</priority></url>"
        "<url><loc>https://a.example.com/2</loc></url>"
        "<url><lastmod>2024-02-02</lastmod></url>"  # no loc: dropped
        "</urlset>"
    )
    df = spark.createDataFrame([(1, xml)], "doc_id long, sitemap_xml string")
    rows = sorted(sitemap_urls(df).collect(), key=lambda r: r["entry_idx"])
    assert [(r["entry_idx"], r["loc"], r["lastmod"], r["priority"], r["is_index"])
            for r in rows] == [
        (0, "https://a.example.com/1", "2024-01-15", 0.8, False),
        (1, "https://a.example.com/2", None, None, False),
    ]


def test_sitemap_index_and_degrade(spark):
    from seaexplorertools_spark.operators.markup import sitemap_urls

    xml = (
        "<sitemapindex><sitemap><loc>https://h/s1.xml</loc></sitemap>"
        "<sitemap><loc>https://h/s2.xml</loc></sitemap></sitemapindex>"
    )
    df = spark.createDataFrame(
        [(1, xml), (2, "not xml at all"), (3, None)],
        "doc_id long, sitemap_xml string",
    )
    rows = sitemap_urls(df).collect()
    assert sorted((r["doc_id"], r["entry_idx"], r["loc"], r["is_index"]) for r in rows) == [
        (1, 0, "https://h/s1.xml", True),
        (1, 1, "https://h/s2.xml", True),
    ]


def test_svg_meta(spark):
    from seaexplorertools_spark.operators.markup import svg_meta

    svg = (
        '<svg xmlns="x" width="120px" height="60px" viewBox="0 0 120 60">'
        '<path d="M0 0"/><path d="M1 1"/>'
        '<rect width="10" height="10"/>'  # child width must NOT win
        '<text x="0" y="0">hello <tspan>there</tspan></text>'
        "<text>second</text></svg>"
    )
    df = spark.createDataFrame([(1, svg)], "doc_id long, svg_text string")
    r = svg_meta(df).collect()[0]
    assert (r["width"], r["height"]) == (120.0, 60.0)
    assert (r["vb_x"], r["vb_y"], r["vb_w"], r["vb_h"]) == (0.0, 0.0, 120.0, 60.0)
    assert (r["n_paths"], r["n_rects"], r["n_circles"]) == (2, 1, 0)
    assert r["text"] == "hello there second"


def test_svg_degrade(spark):
    from seaexplorertools_spark.operators.markup import svg_meta

    df = spark.createDataFrame(
        [(1, "<html>no svg here</html>"), (2, None)],
        "doc_id long, svg_text string",
    )
    rows = {r["doc_id"]: r for r in svg_meta(df).collect()}
    assert rows[1]["width"] is None and rows[1]["n_paths"] is None
    assert rows[2]["width"] is None


def test_plans_stay_jvm(spark):
    from seaexplorertools_spark.operators.markup import (
        documents_as_sitemaps,
        documents_as_svg,
        sitemap_urls,
        svg_meta,
    )

    docs = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    for df in (
        sitemap_urls(documents_as_sitemaps(docs)),
        svg_meta(documents_as_svg(docs)),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "Arrow" not in plan


def test_fixture_empty_paths_case(spark):
    """doc_id % 4 == 0 must emit ZERO paths (sequence(1,0) counts down
    in Spark — the guarded branch)."""
    from seaexplorertools_spark.operators.markup import documents_as_svg, svg_meta

    docs = spark.createDataFrame([(4, "t"), (5, "t")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in svg_meta(documents_as_svg(docs)).collect()}
    assert rows[4]["n_paths"] == 0
    assert rows[5]["n_paths"] == 1


def test_markdown_meta(spark):
    from seaexplorertools_spark.operators.markup import markdown_meta

    md = (
        '---\ntitle: "My Page"\nlicense: mit\ntags:\n  - a\n---\n'
        "# Top\n## Sub\nbody text [a](http://x) and [b](http://y)\n"
        "```py\nx=1\n```\ncode done\n"
    )
    df = spark.createDataFrame([(1, md)], "doc_id long, markdown string")
    r = markdown_meta(df).collect()[0]
    assert (r["title"], r["license"]) == ("My Page", "mit")
    assert (r["n_headings"], r["n_links"], r["n_code_blocks"]) == (2, 2, 1)
    assert r["body"].startswith("# Top")


def test_markdown_no_frontmatter(spark):
    from seaexplorertools_spark.operators.markup import markdown_meta

    df = spark.createDataFrame(
        [(1, "# Just a doc\nno fences"), (2, None)],
        "doc_id long, markdown string",
    )
    rows = {r["doc_id"]: r for r in markdown_meta(df).collect()}
    assert rows[1]["title"] is None and rows[1]["n_headings"] == 1
    assert rows[1]["body"] == "# Just a doc\nno fences"
    assert rows[2]["n_headings"] == 0 and rows[2]["body"] == ""


def test_markdown_plan_jvm(spark):
    from seaexplorertools_spark.operators.markup import (
        documents_as_markdown,
        markdown_meta,
    )

    docs = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    plan = markdown_meta(documents_as_markdown(docs))._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
