"""SRT/WebVTT parsing: round-trips in both dialects, VTT extras (NOTE
blocks, cue ids, settings, tags, short timestamps), 3-digit hours,
hostile degrade, and the Spark explode lane."""

from __future__ import annotations

import pandas as pd
import pytest

from seaexplorertools_spark.operators.subtitles import (
    encode_subtitles,
    parse_subtitles,
)

CUES = [(100, 1600, "hello world"), (2100, 3600, "Cue 1"), (4100, 5600, "Cue 2")]


@pytest.mark.parametrize("vtt", [False, True])
def test_roundtrip(vtt):
    out = parse_subtitles(encode_subtitles(CUES, vtt=vtt))
    assert [(c["start_ms"], c["end_ms"], c["text"]) for c in out] == CUES
    assert [c["cue_idx"] for c in out] == [0, 1, 2]


def test_vtt_extras():
    doc = (
        b"WEBVTT\n\nNOTE a comment\n\nintro\n"
        b"00:01.000 --> 00:02.500 align:start position:10%\n"
        b"<i>styl</i>ed <c.loud>text</c.loud>\n\n"
        b"00:00:05.000 --> 00:00:06.000\nplain\nsecond line\n"
    )
    out = parse_subtitles(doc)
    assert [(c["start_ms"], c["end_ms"], c["text"]) for c in out] == [
        (1000, 2500, "styled text"),
        (5000, 6000, "plain\nsecond line"),
    ]


def test_srt_edges():
    # 3-digit hours, CRLF line endings, missing index line tolerated
    doc = b"1\r\n100:00:01,000 --> 100:00:02,000\r\nx\r\n\r\n00:00:03,000 --> 00:00:04,000\r\ny\r\n"
    out = parse_subtitles(doc)
    assert out[0]["start_ms"] == 100 * 3600000 + 1000
    assert out[1]["text"] == "y"


def test_hostile():
    for bad in (None, b"", b"not a subtitle file", b"1\nbroken --> time\nx"):
        with pytest.raises(ValueError):
            parse_subtitles(bad)
    # VTT header with no parseable cues is valid-but-empty
    assert parse_subtitles(b"WEBVTT\n\ngarbage block\n") == []


def test_spark_lane(spark):
    from seaexplorertools_spark.operators.subtitles import (
        documents_as_subtitles,
        subtitle_cues,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(8)], "doc_id long, text string"
    )
    rows = sorted(
        subtitle_cues(documents_as_subtitles(docs)).collect(),
        key=lambda r: (r["media_id"], r["cue_idx"]),
    )
    expect = []
    for did in range(8):
        for i in range(1 + did % 4):
            start = i * 2000 + (did % 5) * 100
            expect.append(
                (did, i, start, start + 1500, f"text {did}" if i == 0 else f"Cue {i}")
            )
    assert [
        (r["media_id"], r["cue_idx"], r["start_ms"], r["end_ms"], r["text"])
        for r in rows
    ] == expect
    mixed = spark.createDataFrame(
        pd.DataFrame({"media_id": [1, 2], "payload": [b"garbage", None]})
    )
    assert subtitle_cues(mixed).count() == 0
