"""robots.txt parsing — crawl governance, JVM-side.

A crawl pipeline stores one robots.txt per host and needs them as a
RULES TABLE it can join fetch frontiers against: (host, group, ua,
directive, path). The parse is line-oriented with GROUP state (a rule
belongs to the contiguous block of ``User-agent`` lines above it —
RFC 9309), which maps exactly onto Spark primitives:

- ``posexplode(split(txt, '\\n'))`` → ordered lines,
- comment strip / directive split via codegen ``regexp_extract``,
- group ids via a window PARTITIONED BY host (running sum of
  group-start markers — a new group starts at a ``User-agent`` line
  not preceded by another ``User-agent`` line),
- rule rows × their group's user-agent rows via a running
  ``collect_list`` of the group's UA lines (they always precede the
  group's rules) + one explode — one row per (rule, ua), the
  join-ready denormal form, with NO self-join and ONE pass over the
  parsed lines.

``Sitemap`` directives are group-independent per the RFC and emit with
group −1 / NULL ua. Unknown directives and malformed lines drop out in
the filter — per-line degrade.

Everything is partitioned by host: at 100 TB (billions of hosts) the
whole parse is ONE shuffle on the host key (the UA-run window is
clustered by (host, group), which the host partitioning satisfies);
no global ordering anywhere.

Reference parity: no crawl path exists in the reference
(`/root/reference/seaexplorertools/process_adcp.py`); part of the
web-ingest surface the brief adds (with text.py::canonicalize_url and
the WARC lanes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def robots_rules(df: DataFrame, key: str = "doc_id", txt: str = "robots_txt") -> DataFrame:
    """Parse robots.txt text into the denormalized rules table:
    (key, group_id, ua, directive, path) — one row per (rule line,
    user-agent in its group) plus group-independent sitemap rows."""
    lines = df.select(
        key,
        F.posexplode(F.split(F.col(txt), "\n")).alias("line_no", "raw"),
    )
    # strip comments + surrounding whitespace; split "Directive: value"
    cleaned = lines.withColumn(
        "line", F.trim(F.regexp_replace("raw", "#.*$", ""))
    ).withColumn(
        "directive",
        F.lower(F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1)),
    ).withColumn(
        "value", F.trim(F.regexp_extract("line", r"^[A-Za-z-]+\s*:(.*)$", 1))
    ).filter(F.col("directive") != "")

    w = Window.partitionBy(key).orderBy("line_no")
    grouped = (
        cleaned.withColumn("is_ua", (F.col("directive") == "user-agent"))
        .withColumn(
            "group_start",
            F.col("is_ua")
            & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False)),
        )
        .withColumn(
            "group_id",
            F.sum(F.col("group_start").cast("int")).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    # Fan rules out per user-agent WITHOUT the rules⋈uas self-join
    # (round 9, guide §2.4/§7.2: the join recomputed the whole parse
    # subtree on both sides — posexplode + regexes + two windows, twice).
    # Within a group every User-agent line precedes every rule line (a
    # User-agent line after a non-UA line STARTS a new group by the
    # group_start predicate above), so at each rule row the running
    # collect_list of UA values within (key, group_id) is exactly the
    # group's full UA set; collect_list skips the NULLs from non-UA rows.
    # The window is clustered by (key, group_id), which the existing
    # (key) hash partitioning already satisfies — no second exchange.
    # Group-independent Sitemap rows ride the SAME single pass as a
    # one-element array(NULL ua) instead of a union of a second parse.
    wg = (
        Window.partitionBy(key, "group_id")
        .orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    is_sitemap = F.col("directive") == "sitemap"
    return (
        grouped.withColumn(
            "__uas",
            F.collect_list(F.when(F.col("is_ua"), F.col("value"))).over(wg),
        )
        .filter(
            (
                F.col("directive").isin("allow", "disallow")
                & (F.length("value") > 0)
            )
            | is_sitemap
        )
        .select(
            key,
            F.when(is_sitemap, F.lit(-1))
            .otherwise(F.col("group_id"))
            .cast("long")
            .alias("group_id"),
            F.explode(
                F.when(is_sitemap, F.array(F.lit(None).cast("string"))).otherwise(
                    F.col("__uas")
                )
            ).alias("ua"),
            "directive",
            F.col("value").alias("path"),
        )
    )


def robots_allowed(
    rules: DataFrame,
    frontier: DataFrame,
    ua: str = "mybot",
    key: str = "doc_id",
    path_col: str = "path",
) -> DataFrame:
    """Longest-match allow decision (RFC 9309 §2.2.2) for a fetch
    frontier: join each (host, url_path) against the host's rules for
    ``ua`` (falling back to the ``*`` group when no specific group
    exists), keep prefix-matching rules, pick the LONGEST match —
    allow wins ties — default allow when nothing matches. One
    host-keyed join + one host/path-keyed argmax aggregation."""
    r = rules.filter(F.col("directive").isin("allow", "disallow")).withColumnRenamed(
        "path", "_rule_path"
    )
    # "does this host have a ua-specific group" as a host-partitioned
    # window max instead of a distinct + self-join (round 9, guide §2.4:
    # the join recomputed the whole rules parse a second time for its
    # build side; the window rides the rules table's existing host
    # partitioning — no join, no second parse, no new exchange)
    r = (
        r.withColumn(
            "_specific",
            F.max(F.when(F.col("ua") == ua, F.lit(True))).over(
                Window.partitionBy(key)
            ),
        )
        .filter(
            F.when(F.col("_specific"), F.col("ua") == ua)
            .otherwise(F.col("ua") == "*")
        )
        .drop("_specific")
    )
    j = frontier.join(r, key, "left")
    matched = j.withColumn(
        "_hit",
        F.col("_rule_path").isNotNull()
        & F.col(path_col).startswith(F.col("_rule_path")),
    )
    scored = matched.withColumn(
        "_score",
        F.when(
            F.col("_hit"),
            F.length("_rule_path") * 2
            + (F.col("directive") == "allow").cast("int"),
        ).otherwise(F.lit(-1)),
    )
    best = (
        scored.groupBy(key, path_col)
        .agg(F.max(F.struct("_score", (F.col("directive") == "allow").alias("_allow"))).alias("m"))
        .select(
            key,
            path_col,
            F.when(F.col("m._score") < 0, F.lit(True))  # default allow
            .otherwise(F.col("m._allow"))
            .alias("allowed"),
        )
    )
    return best


def documents_as_robots(docs: DataFrame) -> DataFrame:
    """Adapter: per document a real robots.txt — a ``*`` group with a
    Disallow + Allow (plus an inline comment and a blank line, both of
    which the parser must strip), an AI-crawler group with TWO stacked
    user-agent lines (gptbot, ccbot — pins the group-start logic) on
    doc_ids not divisible by 3, and a group-independent Sitemap line.
    Built JVM-side with concat; every parsed row is closed-form in
    doc_id for ``q_robots_rules``."""
    d = F.col("doc_id")
    s = d.cast("string")
    txt = F.concat(
        F.lit("# robots for site"), (d % 40).cast("string"), F.lit("\n"),
        F.lit("User-agent: *\n"),
        F.lit("Disallow: /private/"), (d % 5).cast("string"),
        F.lit("/  # keep out\n"),
        F.lit("Allow: /public/\n"),
        F.lit("Crawl-delay: 1\n"),
        F.lit("\n"),
        F.when(
            d % 3 != 0,
            F.concat(
                F.lit("User-agent: gptbot\nUser-agent: ccbot\nDisallow: /\n\n")
            ),
        ).otherwise(F.lit("")),
        F.lit("Sitemap: https://site"), (d % 40).cast("string"),
        F.lit(".example.com/sitemap-"), s, F.lit(".xml\n"),
    )
    return docs.select("doc_id", txt.alias("robots_txt"))
