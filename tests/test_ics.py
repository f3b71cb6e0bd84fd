"""iCalendar VEVENT explosion (operators/markup.py::ics_events):
unfolding, parameter heads, TEXT unescaping, decoy components,
missing/unparseable properties, and the fixture's branch coverage."""

from __future__ import annotations

from seaexplorertools_spark.operators.markup import documents_as_ics, ics_events

ICS = (
    "BEGIN:VCALENDAR\r\n"
    "VERSION:2.0\r\n"
    "BEGIN:VTIMEZONE\r\nTZID:X\r\nEND:VTIMEZONE\r\n"
    "BEGIN:VEVENT\r\n"
    "UID:u1\r\n"
    "SUMMARY:Team sync\\, weekly\r\n"
    "DTSTART;TZID=Etc/UTC:20260304T090000Z\r\n"
    "DTEND:20260304T093000\r\n"
    "LOCATION:HQ\r\n"
    "END:VEVENT\r\n"
    "BEGIN:VEVENT\r\n"
    "UID:u2\r\n"
    "SUMMARY:Long su\r\n mmary folded\r\n"
    "DTSTART:not-a-date\r\n"
    "END:VEVENT\r\n"
    "END:VCALENDAR\r\n"
)


def _run(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, ics_text string")
    return ics_events(df).orderBy("event_idx").collect()


def test_events_parse(spark):
    rows = _run(spark, ICS)
    assert len(rows) == 2  # VTIMEZONE is not an event
    a, b = rows
    assert a["uid"] == "u1"
    assert a["summary"] == "Team sync, weekly"  # \, unescaped
    assert str(a["dtstart"]) == "2026-03-04 09:00:00"  # param head + Z
    assert str(a["dtend"]) == "2026-03-04 09:30:00"  # no Z
    assert a["duration_s"] == 1800
    assert a["location"] == "HQ"
    # folded summary reassembles; bad DTSTART degrades to NULL
    assert b["summary"] == "Long summary folded"
    assert b["dtstart"] is None and b["duration_s"] is None
    assert b["location"] is None and b["dtend"] is None


def test_no_events_no_rows(spark):
    assert _run(spark, "BEGIN:VCALENDAR\r\nEND:VCALENDAR") == []


def test_range_invalid_datetime_degrades(spark):
    # month 13: shape-valid but range-invalid — must NULL, not throw
    # (ANSI mode is the Spark 4 default)
    t = (
        "BEGIN:VEVENT\r\nUID:u\r\nDTSTART:20261399T250000Z\r\nEND:VEVENT"
    )
    assert _run(spark, t)[0]["dtstart"] is None


def test_escaped_newline(spark):
    t = (
        "BEGIN:VEVENT\r\nUID:u\r\nSUMMARY:line1\\nline2\r\nEND:VEVENT"
    )
    assert _run(spark, t)[0]["summary"] == "line1\nline2"


def test_fixture_branches(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = ics_events(documents_as_ics(docs))
    import pyspark.sql.functions as F

    agg = out.agg(
        F.count("*").alias("n"),
        F.sum(F.col("location").isNull().cast("long")).alias("n_noloc"),
        F.countDistinct("duration_s").alias("n_dur"),
        F.sum(F.col("dtstart").isNull().cast("long")).alias("n_badts"),
    ).collect()[0]
    assert agg["n"] > 0 and agg["n_noloc"] > 0 and agg["n_dur"] == 2
    assert agg["n_badts"] == 0


def test_stays_jvm_side(spark):
    df = spark.createDataFrame([(1, ICS)], "doc_id long, ics_text string")
    plan = ics_events(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
