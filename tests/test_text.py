"""URL canonicalization operator tests (operators/text.py)."""

from __future__ import annotations


def test_canonicalize_url_cases(spark):
    """Parser-level URL canonicalization cases the contract's
    constructor-oracle can't enumerate: no query, no port, explicit
    non-default port on the other scheme, IPv4 host, non-URL → NULL."""
    from pyspark.sql import functions as F

    from seaexplorertools_spark.operators.text import canonicalize_url

    rows = [
        (1, "https://WWW.EXAMPLE.com:443/Path?b=2&a=1#x"),
        (2, "http://example.com:8080"),
        (3, "HTTP://sub.Example.COM/deep/path"),
        (4, "https://10.0.0.1:443/x"),
        (5, "not a url at all"),
        (6, "ftp://Files.Example.org:21/pub"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    cols = canonicalize_url(F.col("url"))
    got = {
        r["id"]: (r["c"], r["h"], r["d"])
        for r in df.select(
            "id", cols["canon_url"].alias("c"), cols["host"].alias("h"),
            cols["domain"].alias("d"),
        ).collect()
    }
    assert got[1] == ("https://example.com/Path?a=1&b=2", "example.com", "example.com")
    assert got[2] == ("http://example.com:8080/", "example.com", "example.com")
    assert got[3] == ("http://sub.example.com/deep/path", "sub.example.com", "example.com")
    assert got[4] == ("https://10.0.0.1/x", "10.0.0.1", "0.1")  # naive 2-label domain: documented
    assert got[5] == (None, None, None)
    assert got[6] == ("ftp://files.example.org:21/pub", "files.example.org", "example.org")


def test_html_extract_cases(spark):
    """Parser-level cases the constructor oracle can't enumerate:
    nested-ish tags, attributes with '>', entity edge order, multiple
    scripts, case-insensitive tags, lists/tables, bare text."""
    from pyspark.sql import functions as F

    from seaexplorertools_spark.operators.text import html_extract

    rows = [
        (1, "<P>one</P><ul><li>a</li><li>b</li></ul>"),
        (2, "<SCRIPT>if(a<b){x()}</SCRIPT>keep<script>\nmore\n</script>!"),
        (3, "plain text, no markup"),
        (4, "&amp;lt; stays &amp; stops"),  # double-encoded: one level only
        (5, "<table><tr><td>c1</td><td>c2</td></tr><tr><td>c3</td></tr></table>"),
        (6, "A<br>B<BR/>C"),
        (7, "  spaced\tout  <div>block</div>  "),
    ]
    df = spark.createDataFrame(rows, "id long, html string")
    got = {r["id"]: r["t"] for r in df.select(
        "id", html_extract(F.col("html")).alias("t")).collect()}
    assert got[1] == "one\na\nb"
    assert got[2] == "keep !"
    assert got[3] == "plain text, no markup"
    assert got[4] == "&lt; stays & stops"
    assert got[5] == "c1 c2\nc3"
    assert got[6] == "A\nB\nC"
    assert got[7] == "spaced out block"
