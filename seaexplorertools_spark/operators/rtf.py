"""RTF text extraction — the word-processor sibling of the DOCX lane.

RTF (the public Microsoft Rich Text Format spec, v1.9.1) is a
brace-grouped control-word markup; office-document corpora still carry
plenty of it. Extraction needs a STACK, not a regex: destination
groups ``{\\fonttbl …}`` ``{\\colortbl …}`` ``{\\*\\anything …}`` nest
arbitrary sub-groups that must be dropped wholesale, so this is a
pure-python group walker in Arrow-batched ``mapInPandas`` — the same
call the DOCX/PDF lanes made (operators/docx.py, operators/pdfcodec.py)
versus the regex-only markup lanes (operators/markup.py).

Walker semantics (the subset that carries text):

- group open/close tracked; known destination groups (and any
  ``{\\*`` starred destination) skipped to their matching brace
- ``\\par`` / ``\\line`` → newline, ``\\tab`` → tab
- ``\\'hh`` hex escapes (cp1252-ish: decoded via latin-1 for the
  8-bit range), ``\\uN`` unicode escapes with the ``\\ucN`` fallback-
  character skip (default 1)
- other control words stripped; a control word consumes ONE following
  space as its delimiter (the spec's rule — the classic
  text-mangling bug when missed)
- ``\\{`` ``\\}`` ``\\\\`` escaped literals; raw CR/LF ignored
- unbalanced braces / non-RTF payloads degrade to NULL

Reference parity: none (multimodal surface the brief adds).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_DESTINATIONS = {
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "header",
    "footer", "generator",
}

_SPECIAL = {"par": "\n", "line": "\n", "tab": "\t"}


def rtf_to_text(s: str) -> str:
    """Extract plain text from one RTF document (raises ValueError on
    payloads that don't start with ``{\\rtf`` or have unbalanced
    braces)."""
    if not s.startswith("{\\rtf"):
        raise ValueError("rtf: missing {\\rtf header")
    out: list[str] = []
    i, n = 0, len(s)
    depth = 0
    skip_until: list[int] = []  # depths whose groups are being dropped
    uc_stack = [1]
    while i < n:
        c = s[i]
        if c == "{":
            depth += 1
            uc_stack.append(uc_stack[-1])
            # starred destination: {\* ...}
            if s.startswith("{\\*", i):
                skip_until.append(depth)
            i += 1
            continue
        if c == "}":
            if depth == 0:
                raise ValueError("rtf: unbalanced close brace")
            if skip_until and skip_until[-1] == depth:
                skip_until.pop()
            depth -= 1
            uc_stack.pop()
            i += 1
            continue
        if c in "\r\n":
            i += 1
            continue
        if c != "\\":
            if not skip_until:
                out.append(c)
            i += 1
            continue
        # control symbol or word
        i += 1
        if i >= n:
            raise ValueError("rtf: dangling backslash")
        c = s[i]
        if c in "{}\\":
            if not skip_until:
                out.append(c)
            i += 1
            continue
        if c == "'":
            if i + 2 >= n:
                raise ValueError("rtf: truncated hex escape")
            if not skip_until:
                out.append(bytes([int(s[i + 1 : i + 3], 16)]).decode("latin-1"))
            i += 3
            continue
        if not c.isalpha():
            i += 1  # other control symbol: ignore
            continue
        j = i
        while j < n and s[j].isalpha():
            j += 1
        word = s[i:j]
        # optional signed numeric parameter
        k = j
        if k < n and (s[k] == "-" or s[k].isdigit()):
            k += 1
            while k < n and s[k].isdigit():
                k += 1
        param = s[j:k]
        i = k
        if i < n and s[i] == " ":  # the delimiter space is consumed
            i += 1
        if word == "uc" and param:
            uc_stack[-1] = int(param)
            continue
        if word == "u" and param:
            if not skip_until:
                cp = int(param)
                out.append(chr(cp + 65536 if cp < 0 else cp))
            # skip the fallback character(s)
            i += uc_stack[-1]
            continue
        if word in _DESTINATIONS and not skip_until:
            skip_until.append(depth)
            continue
        if word in _SPECIAL and not skip_until:
            out.append(_SPECIAL[word])
    if depth != 0:
        raise ValueError("rtf: unbalanced open brace")
    return "".join(out)


RTF_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)


def rtf_extract(df: DataFrame, key: str = "doc_id", rtf: str = "rtf_text") -> DataFrame:
    """(key, text, n_chars) per RTF payload; malformed → NULL text."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[key], pdf[rtf]):
                try:
                    text = rtf_to_text(payload) if payload is not None else None
                except ValueError:
                    text = None
                rows.append(
                    (did, text, len(text) if text is not None else None)
                )
            yield pd.DataFrame(rows, columns=["doc_id", "text", "n_chars"])

    return df.select(F.col(key), F.col(rtf)).mapInPandas(run, RTF_SCHEMA)


def documents_as_rtf(docs: DataFrame) -> DataFrame:
    """Adapter: per document a REAL RTF with a font table, a color
    table, a starred generator destination (all must be dropped), the
    document text behind formatting control words, a hex escape
    (``\\'e9`` → é), a ``\\u`` escape with fallback char, bold toggles,
    and two paragraphs. Closed-form in (doc_id, text) for
    ``mm_rtf_text``. Built JVM-side (codegen concat)."""
    d = F.col("doc_id")
    t = F.coalesce(F.col("text"), F.lit(""))
    body = F.concat(
        F.lit(
            "{\\rtf1\\ansi\\deff0"
            "{\\fonttbl{\\f0 Times New Roman;}}"
            "{\\colortbl;\\red0\\green0\\blue0;}"
            "{\\*\\generator Fixture 1.0;}"
            "\\pard\\f0\\fs24 "
        ),
        t,
        F.lit("\\par\nCaf\\'e9 \\u8212 x row \\b "),
        (d % 50).cast("string"),
        F.lit(" \\b0\\par}"),
    )
    return docs.select("doc_id", body.alias("rtf_text"))
