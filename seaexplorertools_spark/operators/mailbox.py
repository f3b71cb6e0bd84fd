"""mbox / RFC-5322 email ingest — mailing-list archives as training data.

Mailing-list dumps (mboxrd/mboxo) are a classic text-corpus source.
This lane splits an mbox payload on its ``From `` envelope lines,
parses each message with the stdlib ``email`` package (header decode
incl. RFC-2047 encoded-words, MIME multipart walk), and emits one row
per message: (msg_idx, from_addr, subject, date, body) with the body
taken from the first ``text/plain`` leaf part (HTML-only mail degrades
to the empty string — the HTML lane is text.py::html_extract's job).
``>From `` unstuffing (the mboxrd convention) is applied to body lines.

Malformed messages degrade per-message; non-mbox payloads degrade the
row to zero messages. Headers and the quoted-printable/base64 transfer
decodings are bijective on the fixture's value domain, so
``mm_mbox_records`` pins the split + parse + decode path under an
exact constructor oracle.

Reference parity: no mail path exists in the reference
(`/root/reference/seaexplorertools/process_adcp.py`); part of the
text-ingest surface the brief adds.
"""

from __future__ import annotations

import email
import email.policy
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MBOX_RECORD_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("msg_idx", LongType(), False),
        StructField("from_addr", StringType(), True),
        StructField("subject", StringType(), True),
        StructField("date", StringType(), True),
        StructField("body", StringType(), True),
    ]
)


def split_mbox(payload: bytes) -> list[bytes]:
    """Split an mbox blob into raw messages on envelope ``From `` lines
    (start-of-line only — body occurrences are ``>From``-stuffed by
    writers, and we unstuff on parse). ValueError if the payload does
    not start with an envelope line."""
    b = bytes(payload)
    if not b.startswith(b"From "):
        raise ValueError("mbox: payload does not start with an envelope line")
    parts = b.split(b"\nFrom ")
    out = []
    for k, p in enumerate(parts):
        raw = (b"From " + p) if k else p
        # drop the envelope line itself
        nl = raw.find(b"\n")
        out.append(raw[nl + 1 :] if nl >= 0 else b"")
    return out


def _body_text(msg) -> str:
    """First text/plain leaf, transfer-decoded; '' when none."""
    if msg.is_multipart():
        for part in msg.walk():
            if part.get_content_type() == "text/plain" and not part.is_multipart():
                return part.get_content()
        return ""
    if msg.get_content_type() == "text/plain":
        return msg.get_content()
    return ""


def _fast_message(raw: bytes) -> dict | None:
    """Header-subset fast path for the COMMON message shape — the
    SCALING.md round-8 note made real (stdlib ``policy=default`` runs
    full RFC-5322 header machinery per message, ~10 header objects at
    ~0.2 ms each; most list mail doesn't need it). Handles: pure-ASCII
    headers with no RFC-2047 encoded-words, single-space folding,
    bodies that are ``text/plain`` (7bit/8bit, charset us-ascii/utf-8)
    directly or the first such part of a single-level ``multipart/*``
    with line-anchored RFC-2046 delimiters. Returns None for ANYTHING
    else (encoded-words, qp/base64, nested multiparts, non-UTF8 bytes,
    declared non-UTF8 charsets, tab/multi-WSP folds) — the caller
    falls back to the stdlib parser, so the fast path can only ever be
    a result-identical shortcut (identity is test-pinned against the
    stdlib answer on every fixture class)."""
    try:
        text = raw.decode("utf-8")
    except UnicodeDecodeError:
        return None
    head, sep, body = text.partition("\n\n")
    if not sep:
        return None
    if "=?" in head:  # RFC-2047 encoded-word anywhere → stdlib
        return None
    headers: dict[str, str] = {}
    last = None
    for ln in head.split("\n"):
        if ln[:1] in (" ", "\t"):  # folded continuation
            # stdlib policy=default preserves the fold's WSP run
            # verbatim (a tab stays a tab); only the single-space fold
            # is reproduced here — anything else goes to the stdlib.
            if last is None or ln[:1] == "\t" or ln[1:2] in (" ", "\t"):
                return None
            headers[last] += " " + ln.strip()
            continue
        name, colon, val = ln.partition(":")
        if not colon:
            return None
        last = name.strip().lower()
        headers[last] = val.strip()
    cte = headers.get("content-transfer-encoding", "7bit").lower()
    if cte not in ("7bit", "8bit", "binary"):
        return None
    ctype = headers.get("content-type", "text/plain").lower()
    import re as _re

    # A declared charset other than ascii/utf-8 (e.g. iso-8859-1 whose
    # bytes happen to be valid UTF-8) must be decoded per declaration —
    # stdlib territory, the blind utf-8 decode above would differ.
    cs = _re.search(r'charset="?([^";\s]+)"?', ctype)
    if cs and cs.group(1) not in ("us-ascii", "ascii", "utf-8"):
        return None
    if ctype.startswith("multipart/"):
        mb = _re.search(r'boundary="?([^";\s]+)"?', headers.get("content-type", ""))
        if not mb:
            return None
        # RFC-2046 delimiters are LINES: exactly "--boundary" (plus
        # optional transport-padding WSP) at line start — a "--B"
        # substring inside a part body is NOT a delimiter, so split by
        # line scan, never by substring.
        dash = "--" + mb.group(1)
        parts: list[list[str]] = []
        cur: list[str] | None = None
        for ln in body.split("\n"):
            s = ln.rstrip(" \t")
            if s == dash:
                if cur is not None:
                    parts.append(cur)
                cur = []
                continue
            if s == dash + "--":
                if cur is not None:
                    parts.append(cur)
                cur = None
                break
            if cur is not None:
                cur.append(ln)
        if cur is not None:  # unterminated final part: stdlib keeps it
            parts.append(cur)
        for plines in parts:
            sub = _fast_message("\n".join(plines).encode("utf-8"))
            if sub is None:
                return None
            if sub["_ctype"].startswith("text/plain"):
                return {**sub, "from_addr": headers.get("from"),
                        "subject": headers.get("subject"),
                        "date": headers.get("date"), "_ctype": ctype}
        body_text = ""
    elif ctype.startswith("text/plain"):
        body_text = body
    else:
        body_text = ""
    return {
        "from_addr": headers.get("from"),
        "subject": headers.get("subject"),
        "date": headers.get("date"),
        "body": body_text,
        "_ctype": ctype,
    }


def parse_mbox(payload: bytes, fast: bool = True) -> list[dict]:
    """One dict per message: {msg_idx, from_addr, subject, date, body}
    with mboxrd ``>From `` unstuffing on the body. ``fast=True`` tries
    the header-subset shortcut first and falls back to the stdlib
    parser per message (see :func:`_fast_message`)."""
    msgs = []
    for k, raw in enumerate(split_mbox(payload)):
        try:
            fm = _fast_message(raw) if fast else None
            if fm is not None:
                body = fm["body"]
            else:
                m = email.message_from_bytes(raw, policy=email.policy.default)
                body = _body_text(m)
            body = "\n".join(
                ln[1:] if ln.startswith(">") and ln.lstrip(">").startswith("From ")
                else ln
                for ln in body.split("\n")
            ).rstrip("\n")
            if fm is not None:
                msgs.append(
                    {
                        "msg_idx": k,
                        "from_addr": fm["from_addr"],
                        "subject": fm["subject"],
                        "date": fm["date"],
                        "body": body,
                    }
                )
                continue
            msgs.append(
                {
                    "msg_idx": k,
                    "from_addr": str(m["From"]) if m["From"] else None,
                    "subject": str(m["Subject"]) if m["Subject"] else None,
                    "date": str(m["Date"]) if m["Date"] else None,
                    "body": body,
                }
            )
        except Exception:
            continue  # malformed message: skip, keep the rest
    return msgs


def mbox_records(media: DataFrame) -> DataFrame:
    """Explode mbox payloads into one row per message — Arrow-batched
    mapInPandas, zero shuffle, per-payload degrade to zero rows."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "msg_idx", "from_addr", "subject", "date", "body"]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    msgs = parse_mbox(bytes(payload))
                except ValueError:
                    continue
                for m in msgs:
                    rows.append(
                        (mid, m["msg_idx"], m["from_addr"], m["subject"],
                         m["date"], m["body"])
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "payload").mapInPandas(
        extract, MBOX_RECORD_SCHEMA
    )


def documents_as_mbox(docs: DataFrame) -> DataFrame:
    """Adapter: per document a REAL 2-message mbox — message 0 plain
    7-bit with the document text as body (a ``From `` line planted in
    the body arrives ``>From``-stuffed and must unstuff back), message
    1 a multipart/alternative whose text/plain part is
    ``reply to doc <id>`` — headers closed-form in doc_id, so
    ``mm_mbox_records`` pins the envelope split, header parse,
    multipart walk and the unstuffing in one constructor oracle."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                t = (text or "").replace("\r", " ")
                body0 = f"{t}\n>From the archive\n"
                m0 = (
                    "From alice@example.com Thu Jan  1 00:00:00 1970\n"
                    f"From: user{did % 40}@example.com\n"
                    f"Subject: Thread {did % 17}\n"
                    f"Date: Thu, 01 Jan 1970 00:00:{did % 60:02d} +0000\n"
                    "Content-Type: text/plain; charset=utf-8\n"
                    "Content-Transfer-Encoding: 8bit\n"
                    f"\n{body0}"
                )
                m1 = (
                    "From bob@example.com Thu Jan  1 00:00:01 1970\n"
                    f"From: user{(did + 1) % 40}@example.com\n"
                    f"Subject: Re: Thread {did % 17}\n"
                    f"Date: Thu, 01 Jan 1970 00:01:{did % 60:02d} +0000\n"
                    'Content-Type: multipart/alternative; boundary="B"\n'
                    "\n--B\n"
                    "Content-Type: text/plain; charset=utf-8\n"
                    f"\nreply to doc {did}\n"
                    "--B\n"
                    "Content-Type: text/html; charset=utf-8\n"
                    f"\n<p>reply to doc {did}</p>\n"
                    "--B--\n"
                )
                payload = (m0 + "\n" + m1).encode("utf-8")
                rows.append((did, "mbox", payload))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )
    return docs.select("doc_id", "text").mapInPandas(build, schema)
