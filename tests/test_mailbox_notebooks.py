"""mbox and .ipynb ingest: envelope split + MIME walk + unstuffing,
RFC-2047 headers, quoted-printable transfer decode, notebook source
shapes, hostile degrade, and the Spark explode lanes."""

from __future__ import annotations

import json

import pandas as pd
import pytest

from seaexplorertools_spark.operators.mailbox import (
    parse_mbox,
    split_mbox,
)
from seaexplorertools_spark.operators.notebooks import parse_notebook_cells


def _msg(frm, subject, body, extra_headers=""):
    return (
        f"From {frm} Thu Jan  1 00:00:00 1970\n"
        f"From: {frm}\nSubject: {subject}\n"
        "Content-Type: text/plain; charset=utf-8\n"
        f"{extra_headers}\n{body}\n"
    )


def test_split_and_parse():
    blob = (_msg("a@example.com", "one", "hello\n>From stuffed line")
            + "\n" + _msg("b@example.com", "two", "world")).encode()
    msgs = parse_mbox(blob)
    assert [m["subject"] for m in msgs] == ["one", "two"]
    assert msgs[0]["body"] == "hello\nFrom stuffed line"
    assert msgs[1]["from_addr"] == "b@example.com"
    with pytest.raises(ValueError):
        split_mbox(b"not an mbox")


def test_rfc2047_and_quoted_printable():
    blob = (
        "From x@example.com Thu Jan  1 00:00:00 1970\n"
        "From: x@example.com\n"
        "Subject: =?utf-8?q?na=C3=AFve_subject?=\n"
        "Content-Type: text/plain; charset=utf-8\n"
        "Content-Transfer-Encoding: quoted-printable\n"
        "\nna=C3=AFve body =E2=99=AA\n"
    ).encode()
    msgs = parse_mbox(blob)
    assert msgs[0]["subject"] == "naïve subject"
    assert msgs[0]["body"] == "naïve body ♪"


def test_multipart_picks_text_plain():
    blob = (
        "From m@example.com Thu Jan  1 00:00:00 1970\n"
        "From: m@example.com\nSubject: mp\n"
        'Content-Type: multipart/alternative; boundary="X"\n'
        "\n--X\nContent-Type: text/html\n\n<b>html</b>\n"
        "--X\nContent-Type: text/plain\n\nplain wins\n--X--\n"
    ).encode()
    assert parse_mbox(blob)[0]["body"] == "plain wins"


def test_html_only_degrades_to_empty():
    blob = (
        "From h@example.com Thu Jan  1 00:00:00 1970\n"
        "From: h@example.com\nSubject: h\nContent-Type: text/html\n"
        "\n<p>only html</p>\n"
    ).encode()
    assert parse_mbox(blob)[0]["body"] == ""


def test_notebook_cells():
    nb = {
        "nbformat": 4,
        "cells": [
            {"cell_type": "markdown", "source": ["# a\n", "b"]},
            {"cell_type": "code", "source": "x = 1\ny = 2\nz = 3"},
            {"cell_type": "raw", "source": ""},
            "not a dict — skipped",
            {"cell_type": "code", "source": 42},
        ],
    }
    cells = parse_notebook_cells(json.dumps(nb).encode())
    assert [(c["cell_type"], c["n_lines"]) for c in cells] == [
        ("markdown", 2), ("code", 3), ("raw", 0), ("code", 0),
    ]
    assert cells[0]["source"] == "# a\nb"
    for bad in (b"not json", b"[1,2]", b'{"cells": 5}', None):
        with pytest.raises(ValueError):
            parse_notebook_cells(bad)


def test_spark_lanes(spark):
    from seaexplorertools_spark.operators.mailbox import (
        documents_as_mbox,
        mbox_records,
    )
    from seaexplorertools_spark.operators.notebooks import (
        documents_as_notebooks,
        notebook_cells,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(4)], "doc_id long, text string"
    )
    mrows = sorted(
        mbox_records(documents_as_mbox(docs)).collect(),
        key=lambda r: (r["media_id"], r["msg_idx"]),
    )
    assert len(mrows) == 8
    for r in mrows:
        did = r["media_id"]
        if r["msg_idx"] == 0:
            assert r["body"] == f"text {did}\nFrom the archive"
            assert r["subject"] == f"Thread {did % 17}"
        else:
            assert r["body"] == f"reply to doc {did}"
    nrows = sorted(
        notebook_cells(documents_as_notebooks(docs)).collect(),
        key=lambda r: (r["media_id"], r["cell_idx"]),
    )
    assert len(nrows) == 12
    assert [r["cell_type"] for r in nrows[:3]] == ["markdown", "code", "raw"]
    mixed = spark.createDataFrame(
        pd.DataFrame({"media_id": [1, 2], "payload": [b"garbage", None]})
    )
    assert mbox_records(mixed).count() == 0
    assert notebook_cells(mixed).count() == 0


def test_fast_path_is_result_identical_to_stdlib():
    """The header-subset fast path must agree with policy=default on
    every fixture class AND fall back (still agreeing) on encoded
    words, quoted-printable, and folded headers."""
    from seaexplorertools_spark.operators.mailbox import parse_mbox

    plain = (
        b"From a@x Thu Jan  1 00:00:00 1970\nFrom: u7@example.com\n"
        b"Subject: Thread 3\nDate: Thu, 01 Jan 1970 00:00:07 +0000\n"
        b"Content-Type: text/plain; charset=utf-8\n"
        b"Content-Transfer-Encoding: 8bit\n\nbody text\n>From stuffed\n"
    )
    multi = (
        b"From b@x Thu Jan  1 00:00:01 1970\nFrom: u8@example.com\n"
        b"Subject: Re: Thread 3\n"
        b'Content-Type: multipart/alternative; boundary="B"\n\n'
        b"--B\nContent-Type: text/plain; charset=utf-8\n\nreply\n"
        b"--B\nContent-Type: text/html\n\n<p>x</p>\n--B--\n"
    )
    tricky = (
        b"From c@x Thu Jan  1 00:00:02 1970\n"
        b"From: =?utf-8?B?SsO2cmc=?= <j@x>\n"
        b"Subject: long\n subject folded\n"
        b"Content-Type: text/plain\n"
        b"Content-Transfer-Encoding: quoted-printable\n\ncaf=C3=A9\n"
    )
    # Round-9 ADVICE classes: (1) a "--B" substring at line start inside
    # a part body IS a delimiter per RFC 2046, but "x --B y" mid-line or
    # "--BX" (longer token) is NOT — the split must be line-anchored;
    # (2) declared charset=iso-8859-1 whose bytes are valid UTF-8 must
    # decode per the declaration (stdlib), not as UTF-8;
    # (3) tab-folded headers keep the tab under policy=default.
    boundary_trap = (
        b"From d@x Thu Jan  1 00:00:03 1970\nFrom: u9@example.com\n"
        b"Subject: trap\n"
        b'Content-Type: multipart/mixed; boundary="B"\n\n'
        b"--B\nContent-Type: text/plain; charset=utf-8\n\n"
        b"text with --B inline and a longer --BX line\n"
        b"--BX\nnot a delimiter\n"
        b"--B\nContent-Type: text/html\n\n<p>x</p>\n--B--\n"
    )
    latin1 = (
        b"From e@x Thu Jan  1 00:00:04 1970\nFrom: u10@example.com\n"
        b"Subject: latin\n"
        b"Content-Type: text/plain; charset=iso-8859-1\n"
        b"Content-Transfer-Encoding: 8bit\n\n"
        # bytes that are VALID UTF-8 ("café") but must read as latin-1
        # ("cafÃ©") because of the declared charset
        b"caf\xc3\xa9\n"
    )
    tabfold = (
        b"From f@x Thu Jan  1 00:00:05 1970\nFrom: u11@example.com\n"
        b"Subject: tab\n\tfolded subject\n"
        b"Content-Type: text/plain\n\nbody\n"
    )
    for payload in (plain, multi, tricky, plain + b"\n" + multi,
                    boundary_trap, latin1, tabfold):
        assert parse_mbox(payload, fast=True) == parse_mbox(payload, fast=False)
    # and the line-anchored fast path must still TAKE the fast path on
    # the trap (agreeing), not just fall back: the part body containing
    # "--B" mid-line parses to the pre-delimiter text
    trap_rows = parse_mbox(boundary_trap, fast=True)
    assert trap_rows[0]["body"] == (
        "text with --B inline and a longer --BX line\n--BX\nnot a delimiter"
    )
