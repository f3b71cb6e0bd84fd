"""SRT / WebVTT subtitle parsing — the transcript-ingest lane.

Subtitle files are how video corpora carry their text layer (ASR
training pairs, video-caption alignment, dubbing corpora). This parses
both wire formats that dominate the web:

- **SRT**: blank-line-separated blocks of ``index`` / ``HH:MM:SS,mmm
  --> HH:MM:SS,mmm`` / text lines;
- **WebVTT**: ``WEBVTT`` header, optional cue identifiers, dot
  milliseconds, optional ``MM:SS.mmm`` short form, cue settings after
  the timing line (dropped), inline markup tags (``<i>``, ``<c.loud>``,
  ``<00:00:01.000>`` karaoke stamps) stripped.

Output cue rows: (cue_idx — 0-based document order, start_ms, end_ms,
text with internal newlines preserved). Malformed blocks are skipped
per-cue; payloads that are neither format degrade the row (ValueError
→ zero rows in the Spark lane).

Timestamps are integer arithmetic end-to-end, and the fixture builder
formats them from the same closed forms the oracle recomputes — so
``mm_subtitle_cues`` pins parse + format + block framing exactly.

Reference parity: no media path exists in the reference
(`/root/reference/seaexplorertools/process_adcp.py`); part of the
multimodal ingest surface the brief adds.
"""

from __future__ import annotations

import re
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

_TIME_RE = re.compile(
    r"(?:(\d{1,3}):)?(\d{1,2}):(\d{2})[.,](\d{3})"
)
_ARROW_RE = re.compile(
    r"(?:(\d{1,3}):)?(\d{1,2}):(\d{2})[.,](\d{3})\s*-->\s*"
    r"(?:(\d{1,3}):)?(\d{1,2}):(\d{2})[.,](\d{3})"
)
_TAG_RE = re.compile(r"</?[^>\n]*>")


def _ms(h, m, s, ms) -> int:
    return ((int(h or 0) * 60 + int(m)) * 60 + int(s)) * 1000 + int(ms)


def parse_subtitles(payload: bytes | str) -> list[dict]:
    """Parse an SRT or WebVTT document → cue dicts
    {cue_idx, start_ms, end_ms, text}. ValueError when the payload is
    neither format (no WEBVTT header AND no valid timing line)."""
    if payload is None:
        raise ValueError("subtitles: null payload")
    text = (
        bytes(payload).decode("utf-8", "replace")
        if isinstance(payload, (bytes, bytearray))
        else payload
    )
    text = text.lstrip("﻿")
    is_vtt = text.startswith("WEBVTT")
    body = text.split("\n", 1)[1] if is_vtt and "\n" in text else ("" if is_vtt else text)
    cues = []
    for block in re.split(r"\n\s*\n", body.replace("\r\n", "\n").replace("\r", "\n")):
        lines = [ln for ln in block.split("\n")]
        while lines and not lines[0].strip():
            lines.pop(0)
        if not lines:
            continue
        if is_vtt and lines[0].startswith(("NOTE", "STYLE", "REGION")):
            continue
        ti = 0
        if "-->" not in lines[0]:
            ti = 1  # SRT index / VTT cue identifier line
        if ti >= len(lines):
            continue
        m = _ARROW_RE.search(lines[ti])
        if m is None:
            continue
        start = _ms(m.group(1), m.group(2), m.group(3), m.group(4))
        end = _ms(m.group(5), m.group(6), m.group(7), m.group(8))
        cue_text = "\n".join(lines[ti + 1 :]).strip("\n")
        cue_text = _TAG_RE.sub("", cue_text)
        cues.append(
            {
                "cue_idx": len(cues),
                "start_ms": start,
                "end_ms": end,
                "text": cue_text,
            }
        )
    if not cues and not is_vtt:
        raise ValueError("subtitles: no valid cues and no WEBVTT header")
    return cues


def _fmt(ms: int, sep: str) -> str:
    h, rem = divmod(ms, 3600000)
    m, rem = divmod(rem, 60000)
    s, milli = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d}{sep}{milli:03d}"


def encode_subtitles(cues: list[tuple[int, int, str]], vtt: bool = False) -> bytes:
    """Emit SRT (or WebVTT) bytes from (start_ms, end_ms, text) cues
    (fixture builder and a genuine writer)."""
    out = []
    if vtt:
        out.append("WEBVTT\n")
    sep = "." if vtt else ","
    for i, (start, end, text) in enumerate(cues):
        if not vtt:
            out.append(f"{i + 1}\n")
        out.append(f"{_fmt(start, sep)} --> {_fmt(end, sep)}\n{text}\n\n")
    return "".join(out).encode("utf-8")


SUBTITLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("cue_idx", LongType(), False),
        StructField("start_ms", LongType(), False),
        StructField("end_ms", LongType(), False),
        StructField("text", StringType(), True),
    ]
)


def subtitle_cues(media: DataFrame) -> DataFrame:
    """Explode subtitle payloads into one row per cue — Arrow-batched
    mapInPandas, zero shuffle, malformed payloads degrade to zero
    rows."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "cue_idx", "start_ms", "end_ms", "text"]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    cues = parse_subtitles(bytes(payload))
                except ValueError:
                    continue
                for c in cues:
                    rows.append(
                        (mid, c["cue_idx"], c["start_ms"], c["end_ms"], c["text"])
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "payload").mapInPandas(extract, SUBTITLE_SCHEMA)


def documents_as_subtitles(docs: DataFrame) -> DataFrame:
    """Adapter: per document a REAL subtitle file — SRT for even
    doc_ids, WebVTT for odd — of ``1 + doc_id % 4`` cues: cue i spans
    [i·2000 + (doc_id % 5)·100, +1500) ms and its text is ``Cue <i>``
    except cue 0, which carries the document text (newlines flattened
    to spaces, since a blank line would legitimately split an SRT
    block). All closed-form in (doc_id, text) for
    ``mm_subtitle_cues``."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                t = (text or "").replace("\r", " ").replace("\n", " ")
                cues = []
                for i in range(1 + did % 4):
                    start = i * 2000 + (did % 5) * 100
                    cues.append((start, start + 1500, t if i == 0 else f"Cue {i}"))
                rows.append(
                    (did, "subtitles", encode_subtitles(cues, vtt=did % 2 == 1))
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )
    return docs.select("doc_id", "text").mapInPandas(build, schema)
