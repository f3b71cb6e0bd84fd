"""Web access-log parsing — the ops-telemetry ingest lane.

Crawl and serving infrastructure emits Apache/nginx "combined" log
lines; corpus pipelines mine them for fetch governance (status mix,
bot share, bytes moved per host). One line:

    host - user [21/Jul/2026:10:12:01 +0000] "GET /p?q=1 HTTP/1.1"
        200 5120 "referer" "user-agent"

Fully codegen: one anchored ``regexp_extract`` per field over the
line, ``try_make_timestamp`` from the numeric timestamp parts (ANSI-
safe — junk fields NULL, never throw), and a small bot classifier on
the user-agent (token membership, the governance pipelines' standard
first cut). Zero shuffle. Lines that don't match the combined shape
degrade to NULL fields with ``parsed = false``.

Timestamps: the offset is applied arithmetically and the result is a
timestamp_ntz in UTC — session-timezone-independent (the driverlike
non-UTC session), same policy as the iCalendar lane.

Reference parity: none (web-ingest surface the brief adds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MONTHS = "Jan Feb Mar Apr May Jun Jul Aug Sep Oct Nov Dec".split()

_BOT_RE = "(?i)bot|crawler|spider|slurp|fetch"

_LINE_RE = (
    r'^(\S+) \S+ (\S+) \[([^\]]+)\] "(\S+) (\S+) [^"]*" '
    r'(\d{3}) (\S+) "([^"]*)" "([^"]*)"$'
)


def _ts_utc(stamp: Column) -> Column:
    """``21/Jul/2026:10:12:01 +0000`` → UTC timestamp_ntz. Month by
    array position (locale-proof), offset subtracted arithmetically,
    try_make_* so malformed stamps NULL under ANSI."""
    part = lambda i: F.regexp_extract(  # noqa: E731
        stamp, r"^(\d{2})/([A-Za-z]{3})/(\d{4}):(\d{2}):(\d{2}):(\d{2}) ([+-]\d{4})$", i
    )
    mon_arr = F.array(*[F.lit(m) for m in _MONTHS])
    month = F.array_position(mon_arr, part(2)).cast("int")
    local = F.try_make_timestamp_ntz(
        part(3).try_cast("int"), F.when(month > 0, month),
        part(1).try_cast("int"), part(4).try_cast("int"),
        part(5).try_cast("int"), part(6).try_cast("int"),
    )
    off = part(7)
    off_minutes = F.when(
        off != "",
        (F.substring(off, 2, 2).try_cast("int") * 60
         + F.substring(off, 4, 2).try_cast("int"))
        * F.when(F.substring(off, 1, 1) == "-", -1).otherwise(1),
    )
    return local - F.make_dt_interval(F.lit(0), F.lit(0), off_minutes)


def is_bot(ua: Column) -> Column:
    """The governance first-cut bot test: UA token membership."""
    return F.coalesce(ua.rlike(_BOT_RE), F.lit(False))


def access_log_entries(
    df: DataFrame, key: str = "doc_id", log: str = "log_line"
) -> DataFrame:
    """One combined-format line → (key, host, method, path, status,
    bytes, referer, user_agent, ts_utc, bot, parsed)."""
    x = F.col(log)
    g = lambda i: F.regexp_extract(x, _LINE_RE, i)  # noqa: E731
    parsed = x.rlike(_LINE_RE)
    nn = lambda c: F.when(parsed, c)  # noqa: E731
    byts = g(7)
    return df.select(
        key,
        nn(g(1)).alias("host"),
        nn(g(4)).alias("method"),
        nn(g(5)).alias("path"),
        nn(g(6).cast("long")).alias("status"),
        # '-' means zero bytes logged, per the format
        nn(
            F.when(byts == "-", F.lit(0)).otherwise(
                F.try_to_number(byts, F.lit("999999999999"))
            ).cast("long")
        ).alias("bytes"),
        nn(F.when(g(8) != "-", g(8))).alias("referer"),
        nn(g(9)).alias("user_agent"),
        nn(_ts_utc(g(3))).alias("ts_utc"),
        F.coalesce(nn(is_bot(g(9))), F.lit(False)).alias("bot"),
        parsed.alias("parsed"),
    )


def documents_as_access_logs(docs: DataFrame) -> DataFrame:
    """Adapter: per document one combined log line — host rotating on
    doc_id % 50, method GET/POST by % 2, path with a query string,
    status from {200, 301, 404, 503} by % 4, '-' bytes on % 9 == 0,
    referer '-' on % 3 == 0, a bot UA on % 5 == 0, and a NON-UTC
    (+0200) offset on % 7 == 0 (pins the arithmetic normalization);
    % 11 == 0 lines are JUNK (the parsed=false branch). Closed-form in
    doc_id for ``q_access_logs``."""
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    host = F.concat(F.lit("10.0."), s(d % 50), F.lit(".7"))
    method = F.when(d % 2 == 0, F.lit("GET")).otherwise(F.lit("POST"))
    path = F.concat(F.lit("/page/"), s(d % 200), F.lit("?q="), s(d % 9))
    status = (
        F.when(d % 4 == 0, F.lit("200")).when(d % 4 == 1, F.lit("301"))
        .when(d % 4 == 2, F.lit("404")).otherwise(F.lit("503"))
    )
    byts = F.when(d % 9 == 0, F.lit("-")).otherwise(s(512 + d % 4096))
    referer = F.when(d % 3 == 0, F.lit("-")).otherwise(
        F.concat(F.lit("https://ref"), s(d % 12), F.lit(".example.com/"))
    )
    ua = F.when(
        d % 5 == 0, F.lit("FetchBot/2.1 (+https://bots.example.com)")
    ).otherwise(F.lit("Mozilla/5.0 (X11; Linux x86_64) Gecko/20100101"))
    off = F.when(d % 7 == 0, F.lit("+0200")).otherwise(F.lit("+0000"))
    stamp = F.concat(
        F.lpad(s(1 + d % 28), 2, "0"),
        F.lit("/Mar/2026:"),
        F.lpad(s(d % 24), 2, "0"),
        F.lit(":"),
        F.lpad(s(d % 60), 2, "0"),
        F.lit(":"),
        F.lpad(s((d * 7) % 60), 2, "0"),
        F.lit(" "),
        off,
    )
    line = F.concat(
        host, F.lit(" - frank ["), stamp, F.lit('] "'),
        method, F.lit(" "), path, F.lit(' HTTP/1.1" '),
        status, F.lit(" "), byts,
        F.lit(' "'), referer, F.lit('" "'), ua, F.lit('"'),
    )
    junk = F.lit("::corrupted line with no format::")
    return docs.select(
        "doc_id",
        F.when(d % 11 == 0, junk).otherwise(line).alias("log_line"),
    )
