"""XML-ish markup lanes that stay JVM-side — sitemap.xml and SVG.

Both formats are regular enough at the fields a pipeline wants that
codegen ``regexp_extract`` / ``regexp_extract_all`` + ``explode`` cover
them without a Python worker — the same design call text.py made for
HTML extraction. Full XML parsing (namespaces, CDATA, entities beyond
the standard five) is deliberately out of scope; payloads that don't
match emit zero rows / NULL fields.

- ``sitemap_urls``: the crawl-frontier feed — explode ``<url>`` blocks
  of a urlset (or ``<sitemap>`` blocks of a sitemapindex) into
  (loc, lastmod, priority, is_index) rows. Pairs with
  operators/robots.py (which surfaces the Sitemap pointers) and
  text.py::canonicalize_url (which keys the frontier).
- ``svg_meta``: vector images ride web corpora as markup, not pixels —
  width/height (unit-stripped), the viewBox quad, element counts
  (path/rect/circle), and the concatenated ``<text>`` content.

Reference parity: no markup path exists in the reference
(`/root/reference/seaexplorertools/process_adcp.py`); part of the
web-ingest surface the brief adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sitemap_urls(df: DataFrame, key: str = "doc_id", xml: str = "sitemap_xml") -> DataFrame:
    """Explode a sitemap document into one row per entry:
    (key, entry_idx, loc, lastmod, priority, is_index). Handles both
    urlset ``<url>`` and sitemapindex ``<sitemap>`` blocks; lastmod /
    priority are NULL when absent. Pure codegen + one explode."""
    x = F.col(xml)
    is_index = x.contains("<sitemapindex")
    blocks = F.when(
        is_index, F.regexp_extract_all(x, F.lit(r"(?s)<sitemap>(.*?)</sitemap>"), F.lit(1))
    ).otherwise(
        F.regexp_extract_all(x, F.lit(r"(?s)<url>(.*?)</url>"), F.lit(1))
    )
    exploded = df.select(
        key,
        is_index.alias("is_index"),
        F.posexplode(blocks).alias("entry_idx", "block"),
    )
    loc = F.regexp_extract("block", r"<loc>\s*(.*?)\s*</loc>", 1)
    lastmod = F.regexp_extract("block", r"<lastmod>\s*(.*?)\s*</lastmod>", 1)
    prio = F.regexp_extract("block", r"<priority>\s*(.*?)\s*</priority>", 1)
    return exploded.select(
        key,
        F.col("entry_idx").cast("long").alias("entry_idx"),
        loc.alias("loc"),
        F.when(lastmod != "", lastmod).alias("lastmod"),
        F.when(prio != "", prio.cast("double")).alias("priority"),
        "is_index",
    ).filter(F.col("loc") != "")


def svg_meta(df: DataFrame, key: str = "doc_id", svg: str = "svg_text") -> DataFrame:
    """Per-SVG metadata row: unit-stripped width/height, the viewBox
    quad (as 4 doubles), path/rect/circle element counts, and the
    concatenated <text> content (tags inside stripped). NULL fields for
    payloads without an <svg> root."""
    x = F.col(svg)
    has_svg = x.rlike("<svg[\\s>]")
    dim = lambda name: F.regexp_extract(  # noqa: E731
        x, rf'<svg[^>]*\b{name}="\s*([0-9.]+)', 1
    )
    vb = F.regexp_extract(x, r'<svg[^>]*\bviewBox="([^"]*)"', 1)
    vbp = F.split(F.trim(vb), r"[\s,]+")
    count = lambda tag: F.size(  # noqa: E731
        F.regexp_extract_all(x, F.lit(f"<{tag}[\\s/>]"), F.lit(0))
    ).cast("long")
    texts = F.array_join(
        F.transform(
            F.regexp_extract_all(x, F.lit(r"(?s)<text[^>]*>(.*?)</text>"), F.lit(1)),
            lambda t: F.regexp_replace(t, "<[^>]*>", ""),
        ),
        " ",
    )
    out = df.select(
        key,
        F.when(dim("width") != "", dim("width").cast("double")).alias("width"),
        F.when(dim("height") != "", dim("height").cast("double")).alias("height"),
        F.when(vb != "", vbp.getItem(0).cast("double")).alias("vb_x"),
        F.when(vb != "", vbp.getItem(1).cast("double")).alias("vb_y"),
        F.when(vb != "", vbp.getItem(2).cast("double")).alias("vb_w"),
        F.when(vb != "", vbp.getItem(3).cast("double")).alias("vb_h"),
        count("path").alias("n_paths"),
        count("rect").alias("n_rects"),
        count("circle").alias("n_circles"),
        F.when(texts != "", texts).alias("text"),
        has_svg.alias("_ok"),
    )
    nulled = [
        F.when(F.col("_ok"), F.col(c)).alias(c)
        for c in out.columns
        if c not in (key, "_ok")
    ]
    return out.select(key, *nulled)


def documents_as_sitemaps(docs: DataFrame) -> DataFrame:
    """Adapter: per document a real urlset sitemap of ``1 + doc_id % 4``
    url entries (lastmod on even entries, priority on entries divisible
    by 3), or a sitemapindex of 2 entries when doc_id % 5 == 0 — all
    fields closed-form for ``q_sitemap_urls``."""
    d = F.col("doc_id")

    def url_entry(i):
        loc = F.concat(
            F.lit("https://site"), (d % 40).cast("string"),
            F.lit(".example.com/page/"), d.cast("string"),
            F.lit("-"), F.lit(str(i)),
        )
        lastmod = (
            F.concat(F.lit("<lastmod>20"), F.lpad(((d + i) % 30).cast("string"), 2, "0"),
                     F.lit("-01-15</lastmod>"))
            if i % 2 == 0 else F.lit("")
        )
        prio = (
            F.concat(F.lit("<priority>0."), ((d + i) % 9 + 1).cast("string"),
                     F.lit("</priority>"))
            if i % 3 == 0 else F.lit("")
        )
        return F.concat(F.lit("<url><loc>"), loc, F.lit("</loc>"), lastmod, prio,
                        F.lit("</url>"))

    urlset = F.concat(
        F.lit('<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'),
        url_entry(0),
        F.when(d % 4 >= 1, url_entry(1)).otherwise(F.lit("")),
        F.when(d % 4 >= 2, url_entry(2)).otherwise(F.lit("")),
        F.when(d % 4 >= 3, url_entry(3)).otherwise(F.lit("")),
        F.lit("</urlset>"),
    )
    index = F.concat(
        F.lit('<?xml version="1.0"?><sitemapindex>'),
        F.lit("<sitemap><loc>https://site"), (d % 40).cast("string"),
        F.lit(".example.com/sitemap-a.xml</loc></sitemap>"),
        F.lit("<sitemap><loc>https://site"), (d % 40).cast("string"),
        F.lit(".example.com/sitemap-b.xml</loc></sitemap>"),
        F.lit("</sitemapindex>"),
    )
    xml = F.when(d % 5 == 0, index).otherwise(urlset)
    return docs.select("doc_id", xml.alias("sitemap_xml"))


def documents_as_svg(docs: DataFrame) -> DataFrame:
    """Adapter: per document a real SVG — unit-suffixed width/height
    (the parser must strip "px"), a viewBox, ``doc_id % 4`` paths, one
    rect, a circle on odd ids, and a <text> element carrying the
    document text with an inner <tspan> (the tag-strip case) — all
    closed-form for ``mm_svg_meta``."""
    d = F.col("doc_id")
    t = F.coalesce(F.col("text"), F.lit(""))
    # NB: sequence(1, 0) counts DOWN in Spark — guard the empty case
    paths = F.when(
        d % 4 > 0,
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), (d % 4).cast("int")),
                lambda i: F.concat(
                    F.lit('<path d="M0 0 L'), i.cast("string"), F.lit(' 1"/>')
                ),
            ),
            "",
        ),
    ).otherwise(F.lit(""))
    svg = F.concat(
        F.lit('<svg xmlns="http://www.w3.org/2000/svg" width="'),
        (10 + d % 90).cast("string"),
        F.lit('px" height="'), (5 + d % 45).cast("string"),
        F.lit('px" viewBox="0 0 '), (10 + d % 90).cast("string"),
        F.lit(" "), (5 + d % 45).cast("string"), F.lit('">'),
        paths,
        F.lit('<rect x="0" y="0" width="1" height="1"/>'),
        F.when(d % 2 == 1, F.lit('<circle cx="1" cy="1" r="1"/>')).otherwise(F.lit("")),
        F.lit('<text x="0" y="0">'), t, F.lit("<tspan> tail</tspan></text></svg>"),
    )
    return docs.select("doc_id", svg.alias("svg_text"))


def markdown_meta(df: DataFrame, key: str = "doc_id", md: str = "markdown") -> DataFrame:
    """Markdown + YAML-front-matter metadata — the docs-site /
    dataset-card corpus shape (Jekyll/Hugo pages, model cards), pure
    codegen: the front-matter block is the leading ``---`` fence pair;
    flat ``key: value`` pairs are extracted positionally for the two
    fields card pipelines filter on (``title``, ``license``), and the
    body is profiled with regexp counts — ATX headings, links, fenced
    code blocks — plus the body text with headings/fences kept (a
    markdown corpus trains on the markup itself; stripping is
    html_extract's job, not this one's).

    Columns: title, license (NULL when absent), n_headings, n_links,
    n_code_blocks, body. Documents without a front-matter fence get
    NULL title/license and the whole payload as body."""
    x = F.coalesce(F.col(md), F.lit(""))
    has_fm = x.rlike(r"(?s)^---\n.*?\n---\n")
    fm = F.regexp_extract(x, r"(?s)^---\n(.*?)\n---\n", 1)
    body = F.when(has_fm, F.regexp_replace(x, r"(?s)^---\n.*?\n---\n", "")).otherwise(x)

    def fm_field(name: str):
        v = F.regexp_extract(fm, rf"(?m)^{name}:\s*(.+?)\s*$", 1)
        return F.when(has_fm & (v != ""), F.regexp_replace(v, "^\"|\"$", ""))

    n_code = F.size(F.regexp_extract_all(body, F.lit(r"(?m)^```"), F.lit(0))).cast("long") / 2
    return df.select(
        key,
        fm_field("title").alias("title"),
        fm_field("license").alias("license"),
        F.size(F.regexp_extract_all(body, F.lit(r"(?m)^#{1,6} "), F.lit(0)))
        .cast("long").alias("n_headings"),
        F.size(F.regexp_extract_all(body, F.lit(r"\[[^\]]*\]\([^)]*\)"), F.lit(0)))
        .cast("long").alias("n_links"),
        F.floor(n_code).cast("long").alias("n_code_blocks"),
        body.alias("body"),
    )


def documents_as_markdown(docs: DataFrame) -> DataFrame:
    """Adapter: per document a real markdown page — YAML front matter
    (title quoted, license rotating over four SPDX ids, a list field
    the flat parser must ignore) on ids not divisible by 7 (those get
    a bare body: the NULL-front-matter branch), a heading per
    ``1 + doc_id % 3``, one link, and a fenced code block on even ids
    — all closed-form for ``txt_markdown_meta``."""
    d = F.col("doc_id")
    t = F.coalesce(F.col("text"), F.lit(""))
    lic = (
        F.when(d % 4 == 0, F.lit("mit"))
        .when(d % 4 == 1, F.lit("apache-2.0"))
        .when(d % 4 == 2, F.lit("cc-by-4.0"))
        .otherwise(F.lit("unlicense"))
    )
    fm = F.concat(
        F.lit('---\ntitle: "Doc '), d.cast("string"), F.lit('"\n'),
        F.lit("license: "), lic, F.lit("\n"),
        F.lit("tags:\n  - a\n  - b\n---\n"),
    )
    headings = F.concat(
        F.lit("# H0\n"),
        F.when(d % 3 >= 1, F.lit("## H1\n")).otherwise(F.lit("")),
        F.when(d % 3 >= 2, F.lit("### H2\n")).otherwise(F.lit("")),
    )
    code = F.when(d % 2 == 0, F.lit("```py\nx = 1\n```\n")).otherwise(F.lit(""))
    body = F.concat(
        headings, t, F.lit("\nsee [link](https://example.com/"),
        d.cast("string"), F.lit(")\n"), code,
    )
    md = F.when(d % 7 == 0, body).otherwise(F.concat(fm, body))
    return docs.select("doc_id", md.alias("markdown"))


def _ics_unescape(v):
    """RFC 5545 §3.3.11 TEXT unescaping for the values we surface:
    ``\\n`` → newline, ``\\,`` → ',', ``\\;`` → ';' (no ``\\\\`` pass —
    documented scope)."""
    v = F.regexp_replace(v, r"\\n", "\n")
    v = F.regexp_replace(v, r"\\,", ",")
    return F.regexp_replace(v, r"\\;", ";")


def _ics_prop(block, name: str):
    """One content line's value: ``NAME[;params]:value`` with (?m)
    anchors; '' → absent (NULL at the caller)."""
    return F.regexp_extract(block, rf"(?m)^{name}(?:;[^:\r\n]*)?:([^\r\n]*)", 1)


def _ics_ts(v):
    """DATE-TIME value (``yyyyMMdd'T'HHmmss`` with optional trailing
    'Z') → timestamp_ntz — session-timezone-independent on purpose (the
    driver may run non-UTC). Shape-guarded BEFORE the parse: under ANSI
    mode (Spark 4 default) ``to_timestamp_ntz`` THROWS on junk instead
    of returning NULL, so the degrade contract needs the rlike gate."""
    shaped = F.when(v.rlike(r"^\d{8}T\d{6}Z?$"), v)
    part = lambda a, b: F.substring(shaped, a, b).cast("int")  # noqa: E731
    # try_make_* stays NULL on range-invalid fields (month 13) where a
    # format parse would still throw under ANSI
    return F.try_make_timestamp_ntz(
        part(1, 4), part(5, 2), part(7, 2),
        part(10, 2), part(12, 2), part(14, 2),
    )


def ics_events(df: DataFrame, key: str = "doc_id", ics: str = "ics_text") -> DataFrame:
    """Explode iCalendar (RFC 5545) payloads into one row per VEVENT:
    (key, event_idx, uid, summary, dtstart, dtend, duration_s,
    location). Fully codegen: line UNFOLDING first (CRLF + single
    space/tab continuation, §3.1), then a DOTALL block explode
    (BEGIN:VEVENT…END:VEVENT — non-VEVENT components like VTIMEZONE
    never match), then per-property regex with parameter-tolerant
    ``NAME[;params]:`` heads and TEXT unescaping on summary/location.
    Absent properties are NULL; unparseable DATE-TIMEs are NULL (the
    to_timestamp_ntz degrade)."""
    unfolded = F.regexp_replace(F.col(ics), r"\r?\n[ \t]", "")
    blocks = F.regexp_extract_all(
        unfolded, F.lit(r"(?s)BEGIN:VEVENT(.*?)END:VEVENT"), F.lit(1)
    )
    exploded = df.select(
        key, F.posexplode(blocks).alias("event_idx", "block")
    )
    b = F.col("block")
    uid = _ics_prop(b, "UID")
    summary = _ics_prop(b, "SUMMARY")
    loc = _ics_prop(b, "LOCATION")
    dtstart = _ics_ts(_ics_prop(b, "DTSTART"))
    dtend = _ics_ts(_ics_prop(b, "DTEND"))
    return exploded.select(
        key,
        F.col("event_idx").cast("long").alias("event_idx"),
        F.when(uid != "", uid).alias("uid"),
        F.when(summary != "", _ics_unescape(summary)).alias("summary"),
        dtstart.alias("dtstart"),
        dtend.alias("dtend"),
        F.when(loc != "", _ics_unescape(loc)).alias("location"),
    ).withColumn(
        "duration_s", F.expr("timestampdiff(SECOND, dtstart, dtend)")
    )


def documents_as_ics(docs: DataFrame) -> DataFrame:
    """Adapter: per document a REAL iCalendar payload with a VTIMEZONE
    decoy component (must yield no rows), ``1 + doc_id % 3`` VEVENTs,
    a FOLDED summary line (CRLF + space continuation — pins §3.1
    unfolding), a parameterized ``DTSTART;TZID=Etc/UTC:`` head on even
    doc_ids, an escaped comma in LOCATION, and LOCATION only on even
    event indices (NULL branch). All closed-form in doc_id for
    ``mm_ics_events``."""
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    date = F.concat(
        F.lit("2026"),
        F.lpad(s(1 + d % 12), 2, "0"),
        F.lpad(s(1 + d % 28), 2, "0"),
    )

    def event(i: int):
        start_min = i * 10
        end_min = i * 10 + 30  # + 5 on odd docs, stays < 60
        dtstart_val = F.concat(
            date, F.lit("T"), F.lpad(s(d % 24), 2, "0"),
            F.lit(f"{start_min:02d}00Z"),
        )
        dtend_val = F.concat(
            date, F.lit("T"), F.lpad(s(d % 24), 2, "0"),
            F.when(d % 2 == 1, F.lit(f"{end_min + 5:02d}00Z")).otherwise(
                F.lit(f"{end_min:02d}00Z")
            ),
        )
        dtstart_line = F.when(
            d % 2 == 0,
            F.concat(F.lit("DTSTART;TZID=Etc/UTC:"), dtstart_val),
        ).otherwise(F.concat(F.lit("DTSTART:"), dtstart_val))
        parts = [
            F.lit("BEGIN:VEVENT"),
            F.concat(F.lit(f"UID:ev-"), s(d), F.lit(f"-{i}")),
            # folded summary: 'Ev' + CRLF + SPACE + 'ent <doc_id>'
            F.concat(F.lit("SUMMARY:Ev\r\n ent "), s(d)),
            dtstart_line,
            F.concat(F.lit("DTEND:"), dtend_val),
        ]
        if i % 2 == 0:
            parts.append(F.lit(f"LOCATION:Room {i}\\, A"))
        parts.append(F.lit("END:VEVENT"))
        return F.concat_ws("\r\n", *parts)

    k = 1 + d % 3
    tz_decoy = (
        "BEGIN:VTIMEZONE\r\nTZID:Etc/UTC\r\nEND:VTIMEZONE"
    )
    body = F.concat_ws(
        "\r\n",
        F.lit("BEGIN:VCALENDAR"),
        F.lit("VERSION:2.0"),
        F.lit(tz_decoy),
        event(0),
        F.when(k >= 2, event(1)).otherwise(F.lit("")),
        F.when(k >= 3, event(2)).otherwise(F.lit("")),
        F.lit("END:VCALENDAR"),
    )
    return docs.select("doc_id", body.alias("ics_text"))


def hls_entries(df: DataFrame, key: str = "doc_id", m3u8: str = "m3u8_text") -> DataFrame:
    """Explode HLS playlists (RFC 8216) into one row per entry — both
    flavors in one shape:

    - media playlists: ``#EXTINF:<duration>,[title]`` + URI line →
      kind='segment' rows with duration_s/title
    - master playlists: ``#EXT-X-STREAM-INF:<attrs>`` + URI line →
      kind='variant' rows with bandwidth/width/height

    plus the playlist-level columns every row carries:
    target_duration (media), endlist flag. Pure codegen: the
    tag+URI pairing is a full-match ``regexp_extract_all`` (URI = next
    non-comment line), then per-entry field regexes. Zero shuffle."""
    x = F.col(m3u8)
    seg_re = r"#EXTINF:[^\n]*\n[^#\n][^\n]*"
    var_re = r"#EXT-X-STREAM-INF:[^\n]*\n[^#\n][^\n]*"
    is_master = x.contains("#EXT-X-STREAM-INF:")
    blocks = F.when(
        is_master, F.regexp_extract_all(x, F.lit(var_re), F.lit(0))
    ).otherwise(F.regexp_extract_all(x, F.lit(seg_re), F.lit(0)))
    target = F.regexp_extract(x, r"#EXT-X-TARGETDURATION:(\d+)", 1)
    exploded = df.select(
        key,
        is_master.alias("is_master"),
        F.when(target != "", target.cast("long")).alias("target_duration"),
        x.contains("#EXT-X-ENDLIST").alias("endlist"),
        F.posexplode(blocks).alias("entry_idx", "block"),
    )
    b = F.col("block")
    dur = F.regexp_extract(b, r"#EXTINF:([0-9.]+)", 1)
    title = F.regexp_extract(b, r"#EXTINF:[0-9.]+,([^\n]*)", 1)
    bw = F.regexp_extract(b, r"BANDWIDTH=(\d+)", 1)
    res_w = F.regexp_extract(b, r"RESOLUTION=(\d+)x\d+", 1)
    res_h = F.regexp_extract(b, r"RESOLUTION=\d+x(\d+)", 1)
    uri = F.regexp_extract(b, r"\n([^\n]+)$", 1)
    return exploded.select(
        key,
        F.col("entry_idx").cast("long").alias("entry_idx"),
        F.when(F.col("is_master"), F.lit("variant"))
        .otherwise(F.lit("segment"))
        .alias("kind"),
        uri.alias("uri"),
        F.when(dur != "", dur.cast("double")).alias("duration_s"),
        F.when(title != "", title).alias("title"),
        F.when(bw != "", bw.cast("long")).alias("bandwidth"),
        F.when(res_w != "", res_w.cast("long")).alias("width"),
        F.when(res_h != "", res_h.cast("long")).alias("height"),
        "target_duration",
        "endlist",
    )


def documents_as_m3u8(docs: DataFrame) -> DataFrame:
    """Adapter: even doc_ids get a MEDIA playlist (``2 + doc_id % 3``
    segments, dyadic durations ``4 + i/4``, title only on even i, a
    TARGETDURATION header, ENDLIST on doc_id % 4 == 0); odd doc_ids a
    MASTER playlist (2 variants, bandwidth ``(1 + doc_id % 7)·100000``
    and half of it, 1280x720 / 640x360). Closed-form in doc_id for
    ``mm_hls_entries``."""
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731

    def seg(i: int):
        t = F.when(F.lit(i % 2 == 0), F.concat(F.lit(f"Seg "), s(d % 50))).otherwise(F.lit(""))
        return F.concat(
            F.lit(f"#EXTINF:{4 + i / 4.0},"), t, F.lit(f"\nseg{i}.ts"),
        )

    k = 2 + d % 3
    media = F.concat(
        F.lit("#EXTM3U\n#EXT-X-VERSION:3\n#EXT-X-TARGETDURATION:"),
        s(5 + d % 3),
        F.lit("\n"),
        seg(0), F.lit("\n"), seg(1),
        F.when(k >= 3, F.concat(F.lit("\n"), seg(2))).otherwise(F.lit("")),
        F.when(k >= 4, F.concat(F.lit("\n"), seg(3))).otherwise(F.lit("")),
        F.when(d % 4 == 0, F.lit("\n#EXT-X-ENDLIST")).otherwise(F.lit("")),
    )
    bw = (1 + d % 7) * 100000
    master = F.concat(
        F.lit("#EXTM3U\n#EXT-X-STREAM-INF:BANDWIDTH="), s(bw),
        F.lit(",RESOLUTION=1280x720\nhi.m3u8\n#EXT-X-STREAM-INF:BANDWIDTH="),
        s((bw / 2).cast("long")), F.lit(",RESOLUTION=640x360\nlo.m3u8"),
    )
    body = F.when(d % 2 == 0, media).otherwise(master)
    return docs.select("doc_id", body.alias("m3u8_text"))


def vcard_contacts(df: DataFrame, key: str = "doc_id", vcf: str = "vcf_text") -> DataFrame:
    """Explode vCard payloads (RFC 6350) into one row per card:
    (key, card_idx, fn, family, given, org, n_emails, first_email,
    tel). Shares the iCalendar machinery: line unfolding, DOTALL block
    explode, parameter-tolerant property heads, TEXT unescaping. The
    structured N property is split on unescaped ';' (family, given =
    components 0, 1); EMAIL may repeat — the lane surfaces the count
    and the first. Pure codegen + one explode, zero shuffle."""
    unfolded = F.regexp_replace(F.col(vcf), r"\r?\n[ \t]", "")
    blocks = F.regexp_extract_all(
        unfolded, F.lit(r"(?s)BEGIN:VCARD(.*?)END:VCARD"), F.lit(1)
    )
    exploded = df.select(key, F.posexplode(blocks).alias("card_idx", "block"))
    b = F.col("block")
    fn = _ics_prop(b, "FN")
    n = _ics_prop(b, "N")
    org = _ics_prop(b, "ORG")
    tel = _ics_prop(b, "TEL")
    emails = F.regexp_extract_all(
        b, F.lit(r"(?m)^EMAIL(?:;[^:\r\n]*)?:([^\r\n]*)"), F.lit(1)
    )
    n_parts = F.split(n, r"(?<!\\);")
    return exploded.select(
        key,
        F.col("card_idx").cast("long").alias("card_idx"),
        F.when(fn != "", _ics_unescape(fn)).alias("fn"),
        F.when(n != "", _ics_unescape(n_parts.getItem(0))).alias("family"),
        F.when(
            (n != "") & (F.size(n_parts) >= 2), _ics_unescape(n_parts.getItem(1))
        ).alias("given"),
        F.when(org != "", _ics_unescape(org)).alias("org"),
        F.size(emails).cast("long").alias("n_emails"),
        F.when(F.size(emails) > 0, emails.getItem(0)).alias("first_email"),
        F.when(tel != "", tel).alias("tel"),
    )


def documents_as_vcf(docs: DataFrame) -> DataFrame:
    """Adapter: per document ``1 + doc_id % 2`` vCards — FOLDED FN
    line, structured N, ORG with an escaped comma on doc_id % 3 == 0,
    ``1 + (doc_id + i) % 2`` EMAILs (the first with a TYPE param), TEL
    only on even card index. Closed-form in doc_id for
    ``mm_vcard_contacts``."""
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731

    def card(i: int):
        parts = [
            F.lit("BEGIN:VCARD"),
            F.lit("VERSION:4.0"),
            # folded FN: 'Per' + CRLF + SPACE + 'son <d>-<i>'
            F.concat(F.lit("FN:Per\r\n son "), s(d), F.lit(f"-{i}")),
            F.concat(
                F.lit("N:Last"), s(d % 30), F.lit(f";First{i % 5};;;")
            ),
            F.concat(
                F.lit("EMAIL;TYPE=work:p"), s(d), F.lit(f"-{i}-0@example.com")
            ),
        ]
        second_mail = F.concat(
            F.lit("\r\nEMAIL:p"), s(d), F.lit(f"-{i}-1@example.com")
        )
        org = F.concat(F.lit("\r\nORG:Acme\\, Inc "), s(d % 20))
        tel = F.lit(f"\r\nTEL;TYPE=cell:+1-555-010{i}")
        head = F.concat_ws("\r\n", *parts)
        return F.concat(
            head,
            F.when((d + F.lit(i)) % 2 == 1, second_mail).otherwise(F.lit("")),
            F.when(d % 3 == 0, org).otherwise(F.lit("")),
            tel if i % 2 == 0 else F.lit(""),
            F.lit("\r\nEND:VCARD"),
        )

    body = F.concat_ws(
        "\r\n",
        card(0),
        F.when(d % 2 == 1, card(1)),
    )
    return docs.select("doc_id", body.alias("vcf_text"))


def _xml_unescape(v):
    """The five standard XML entities (the module's documented scope —
    numeric character references are out, same as the sitemap/SVG/EPUB
    lanes). ``&amp;`` last so double-escapes resolve one level."""
    v = F.regexp_replace(v, "&lt;", "<")
    v = F.regexp_replace(v, "&gt;", ">")
    v = F.regexp_replace(v, "&quot;", '"')
    v = F.regexp_replace(v, "&apos;", "'")
    return F.regexp_replace(v, "&amp;", "&")


def xml_records(
    df: DataFrame,
    record_tag: str,
    fields: list[tuple[str, str]],
    key: str = "doc_id",
    xml: str = "xml_text",
) -> DataFrame:
    """Generic XML record explosion (the spark-xml-lite surface): one
    row per ``<record_tag>…</record_tag>`` block, one string column per
    requested field. Field paths are the subset data XML needs:

    - ``'child'`` — text of the first ``<child>`` element
    - ``'@attr'`` — attribute on the record tag itself
    - ``'child@attr'`` — attribute on the first ``<child>`` element

    Values get the five standard entities unescaped. Missing fields
    are NULL; documents without the record tag yield zero rows. Pure
    codegen + one explode, zero shuffle; callers cast columns to their
    types (the established CSV-lane division of labor)."""
    x = F.col(xml)
    blocks = F.regexp_extract_all(
        x,
        F.lit(rf"(?s)<{record_tag}(?:\s[^>]*)?>(.*?)</{record_tag}>"),
        F.lit(0),
    )
    exploded = df.select(key, F.posexplode(blocks).alias("rec_idx", "block"))
    b = F.col("block")
    cols = [F.col(key), F.col("rec_idx").cast("long").alias("rec_idx")]
    for name, path in fields:
        if path.startswith("@"):
            raw = F.regexp_extract(
                b, rf'<{record_tag}[^>]*\s{path[1:]}="([^"]*)"', 1
            )
        elif "@" in path:
            child, attr = path.split("@", 1)
            raw = F.regexp_extract(b, rf'<{child}[^>]*\s{attr}="([^"]*)"', 1)
        else:
            raw = F.regexp_extract(
                b, rf"(?s)<{path}(?:\s[^>]*)?>(.*?)</{path}>", 1
            )
        cols.append(F.when(raw != "", _xml_unescape(raw)).alias(name))
    return exploded.select(*cols)


def documents_as_xml(docs: DataFrame) -> DataFrame:
    """Adapter: per document a catalog of ``1 + doc_id % 3`` <item>
    records — id attribute on the record tag, <name> with an entity on
    doc_id % 4 == 0, <price currency=…> (attribute-on-child), <desc>
    with quote entities only on even item index (the NULL branch on
    odd). Closed-form in doc_id for ``q_xml_records``."""
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731

    def item(i: int):
        name = F.when(
            d % 4 == 0,
            F.concat(F.lit("A &amp; B "), s(d % 60)),
        ).otherwise(F.concat(F.lit("Part "), s(d % 60)))
        desc = (
            F.lit(f"<desc>say &quot;hi&quot; item {i}</desc>")
            if i % 2 == 0
            else F.lit("")
        )
        return F.concat(
            F.lit(f'<item id="'), s(d * 10 + i), F.lit('">'),
            F.lit("<name>"), name, F.lit("</name>"),
            F.lit('<price currency="'),
            F.when(d % 2 == 0, F.lit("usd")).otherwise(F.lit("eur")),
            F.lit('">'), s(d % 90), F.lit(".25</price>"),
            desc,
            F.lit("</item>"),
        )

    k = 1 + d % 3
    body = F.concat(
        F.lit('<?xml version="1.0"?><catalog>'),
        item(0),
        F.when(k >= 2, item(1)).otherwise(F.lit("")),
        F.when(k >= 3, item(2)).otherwise(F.lit("")),
        F.lit("</catalog>"),
    )
    return docs.select("doc_id", body.alias("xml_text"))


_RSS_MONTHS = "Jan Feb Mar Apr May Jun Jul Aug Sep Oct Nov Dec".split()


def _rfc822_ts(v):
    """RSS pubDate (`Tue, 03 Jun 2026 09:39:21 GMT` / `+0200`) → UTC
    timestamp_ntz — month by array position (locale-proof), offset
    subtracted arithmetically, try_make_* degrade (the weblogs-lane
    policy applied to feeds)."""
    part = lambda i: F.regexp_extract(  # noqa: E731
        v,
        r"^(?:[A-Za-z]{3}, )?(\d{2}) ([A-Za-z]{3}) (\d{4}) "
        r"(\d{2}):(\d{2}):(\d{2}) (GMT|UT|[+-]\d{4})$",
        i,
    )
    mon_arr = F.array(*[F.lit(m) for m in _RSS_MONTHS])
    month = F.array_position(mon_arr, part(2)).cast("int")
    local = F.try_make_timestamp_ntz(
        part(3).try_cast("int"), F.when(month > 0, month),
        part(1).try_cast("int"), part(4).try_cast("int"),
        part(5).try_cast("int"), part(6).try_cast("int"),
    )
    off = part(7)
    numeric = off.rlike(r"^[+-]\d{4}$")
    off_minutes = F.when(
        numeric,
        (F.substring(off, 2, 2).try_cast("int") * 60
         + F.substring(off, 4, 2).try_cast("int"))
        * F.when(F.substring(off, 1, 1) == "-", -1).otherwise(1),
    ).otherwise(F.lit(0))
    return local - F.make_dt_interval(F.lit(0), F.lit(0), off_minutes)


def rss_items(df: DataFrame, key: str = "doc_id", xml: str = "xml_text") -> DataFrame:
    """RSS 2.0 feed explosion — a COMPOSITION of the generic
    :func:`xml_records` (record tag ``item``; title/link/guid child
    text, podcast ``enclosure`` url/length attributes) plus the
    RFC-822 pubDate parse. One row per item: (key, rec_idx, title,
    link, guid, enclosure_url, enclosure_bytes, pub_ts). Pure codegen,
    zero shuffle."""
    raw = xml_records(
        df,
        record_tag="item",
        fields=[
            ("title", "title"),
            ("link", "link"),
            ("guid", "guid"),
            ("pubdate", "pubDate"),
            ("enclosure_url", "enclosure@url"),
            ("enclosure_len", "enclosure@length"),
        ],
        key=key,
        xml=xml,
    )
    return raw.select(
        key,
        "rec_idx",
        "title",
        "link",
        "guid",
        "enclosure_url",
        F.col("enclosure_len").cast("long").alias("enclosure_bytes"),
        _rfc822_ts(F.col("pubdate")).alias("pub_ts"),
    )


def documents_as_rss(docs: DataFrame) -> DataFrame:
    """Adapter: per document an RSS 2.0 feed with a channel header,
    ``1 + doc_id % 3`` items — entity-bearing titles on doc_id % 4,
    enclosures (podcast mp3) only on even item index, pubDate with a
    +0200 offset on doc_id % 5 == 0 and GMT otherwise. Closed-form in
    doc_id for ``q_rss_items``."""
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731

    def item(i: int):
        title = F.when(
            d % 4 == 0, F.concat(F.lit("News &amp; views "), s(d % 80))
        ).otherwise(F.concat(F.lit("Episode "), s(d % 80)))
        enc = (
            F.concat(
                F.lit('<enclosure url="https://cdn.example.com/ep'),
                s(d), F.lit(f"-{i}"),
                F.lit('.mp3" length="'), s(10000 + d % 5000),
                F.lit('" type="audio/mpeg"/>'),
            )
            if i % 2 == 0
            else F.lit("")
        )
        tz = F.when(d % 5 == 0, F.lit("+0200")).otherwise(F.lit("GMT"))
        pub = F.concat(
            F.lit("Mon, "), F.lpad(s(1 + d % 28), 2, "0"),
            F.lit(" Apr 2026 "), F.lpad(s(d % 24), 2, "0"),
            F.lit(f":{i:02d}:00 "), tz,
        )
        return F.concat(
            F.lit("<item><title>"), title, F.lit("</title><link>"),
            F.lit("https://pod"), s(d % 30), F.lit(".example.com/"), s(d),
            F.lit(f"-{i}"), F.lit("</link><guid>tag:"), s(d),
            F.lit(f"-{i}"), F.lit("</guid><pubDate>"), pub,
            F.lit("</pubDate>"), enc, F.lit("</item>"),
        )

    k = 1 + d % 3
    body = F.concat(
        F.lit(
            '<?xml version="1.0"?><rss version="2.0"><channel>'
            "<title>Feed</title>"
        ),
        item(0),
        F.when(k >= 2, item(1)).otherwise(F.lit("")),
        F.when(k >= 3, item(2)).otherwise(F.lit("")),
        F.lit("</channel></rss>"),
    )
    return docs.select("doc_id", body.alias("xml_text"))
