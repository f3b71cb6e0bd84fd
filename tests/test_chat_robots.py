"""Chat-transcript SFT prep and robots.txt parsing — the two pure-JVM
lanes: validation rules case-by-case, template rendering, group state
machine edges, longest-match allow decisions, and plan shape (no
Python workers in the chat projection)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F


def _flatten_one(spark, turns):
    from seaexplorertools_spark.operators.chat import chat_flatten

    df = spark.createDataFrame([(1, json.dumps(turns))], "doc_id long, transcript string")
    return chat_flatten(df).collect()[0]


def test_chat_valid_and_render(spark):
    turns = [
        {"role": "system", "content": "sys"},
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "hello"},
    ]
    r = _flatten_one(spark, turns)
    assert r["valid"] is True and r["n_turns"] == 3
    assert r["rendered"] == (
        "<|system|>\nsys\n<|end|>\n<|user|>\nhi\n<|end|>\n"
        "<|assistant|>\nhello\n<|end|>"
    )
    assert r["n_assistant_chars"] == 5


@pytest.mark.parametrize(
    "turns",
    [
        [{"role": "user", "content": "a"}],  # no assistant target
        [{"role": "assistant", "content": "a"}],  # starts with assistant
        [{"role": "user", "content": "a"}, {"role": "user", "content": "b"},
         {"role": "assistant", "content": "c"}],  # double user
        [{"role": "user", "content": "a"},
         {"role": "system", "content": "late"},
         {"role": "assistant", "content": "c"}],  # system not leading
        [{"role": "tool", "content": "a"},
         {"role": "assistant", "content": "c"}],  # unknown role
        [{"role": "user", "content": ""},
         {"role": "assistant", "content": "c"}],  # empty content
        [],  # empty transcript
    ],
    ids=["no-target", "assistant-first", "double-user", "late-system",
         "unknown-role", "empty-content", "empty"],
)
def test_chat_invalid_cases(spark, turns):
    assert _flatten_one(spark, turns)["valid"] is False


def test_chat_malformed_json_degrades(spark):
    from seaexplorertools_spark.operators.chat import chat_flatten

    df = spark.createDataFrame([(1, "{not json")], "doc_id long, transcript string")
    r = chat_flatten(df).collect()[0]
    assert r["valid"] is False and r["rendered"] == ""


def test_chat_no_python_workers(spark):
    """The whole projection stays JVM-side: no Arrow/Python eval nodes."""
    from seaexplorertools_spark.operators.chat import (
        chat_flatten,
        documents_as_transcripts,
    )

    docs = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    plan = chat_flatten(documents_as_transcripts(docs))._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan


ROBOTS = """# comment line
User-agent: *
Disallow: /private/   # inline comment
Allow: /public/
Crawl-delay: 2

User-agent: gptbot
User-agent: ccbot
Disallow: /

Sitemap: https://h.example.com/s.xml
"""


def test_robots_rules(spark):
    from seaexplorertools_spark.operators.robots import robots_rules

    df = spark.createDataFrame([(1, ROBOTS)], "doc_id long, robots_txt string")
    rows = sorted(
        robots_rules(df).collect(),
        key=lambda r: (r["group_id"], r["ua"] or "", r["path"]),
    )
    got = [(r["group_id"], r["ua"], r["directive"], r["path"]) for r in rows]
    assert got == [
        (-1, None, "sitemap", "https://h.example.com/s.xml"),
        (1, "*", "disallow", "/private/"),
        (1, "*", "allow", "/public/"),
        (2, "ccbot", "disallow", "/"),
        (2, "gptbot", "disallow", "/"),
    ]


def test_robots_allowed_longest_match_and_fallback(spark):
    from seaexplorertools_spark.operators.robots import (
        robots_allowed,
        robots_rules,
    )

    txt = (
        "User-agent: *\nDisallow: /a/\nAllow: /a/b/\n\n"
        "User-agent: special\nDisallow: /only/\n"
    )
    rules = robots_rules(
        spark.createDataFrame([(1, txt)], "doc_id long, robots_txt string")
    )
    frontier = spark.createDataFrame(
        [(1, "/a/x"), (1, "/a/b/x"), (1, "/free")], "doc_id long, path string"
    )
    # generic bot: falls to the * group; /a/b/ allow beats /a/ disallow
    got = {
        r["path"]: r["allowed"]
        for r in robots_allowed(rules, frontier, ua="mybot").collect()
    }
    assert got == {"/a/x": False, "/a/b/x": True, "/free": True}
    # the specific group REPLACES * entirely (RFC 9309 group selection)
    got = {
        r["path"]: r["allowed"]
        for r in robots_allowed(rules, frontier, ua="special").collect()
    }
    assert got == {"/a/x": True, "/a/b/x": True, "/free": True}
