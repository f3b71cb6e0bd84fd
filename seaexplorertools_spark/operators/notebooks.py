"""Jupyter notebook (.ipynb) ingest — code-corpus cell explosion.

Notebooks dominate scraped code corpora alongside plain source files;
the training-prep step is "one row per cell, typed, with the source
flattened and outputs dropped". A .ipynb is nbformat-4 JSON (public
spec: https://nbformat.readthedocs.io/): ``cells`` is a list of
``{cell_type, source, ...}`` where ``source`` is a string OR a list of
line strings (both occur in the wild), markdown/code/raw cell types,
and outputs/metadata that a text pipeline discards.

Rows: (media_id, cell_idx, cell_type, source, n_lines). ``n_lines``
counts newline-separated lines of the flattened source ('' → 0).
Payloads that are not JSON, not dicts, or have no list-shaped
``cells`` degrade to zero rows; individual non-dict cells are skipped.

JSON is lossless, so ``mm_notebook_cells`` pins the parse + both
source shapes + the line count under an exact constructor oracle.

Reference parity: no code-corpus path exists in the reference
(`/root/reference/seaexplorertools/process_adcp.py`); part of the
text-ingest surface the brief adds.
"""

from __future__ import annotations

import json
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

NOTEBOOK_CELL_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("cell_idx", LongType(), False),
        StructField("cell_type", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_lines", LongType(), True),
    ]
)


def parse_notebook_cells(payload: bytes) -> list[dict]:
    """One dict per cell: {cell_idx, cell_type, source, n_lines} with
    list-of-lines sources flattened. ValueError for non-notebook JSON."""
    if payload is None:
        raise ValueError("ipynb: null payload")
    try:
        nb = json.loads(bytes(payload).decode("utf-8", "replace"))
    except json.JSONDecodeError as e:
        raise ValueError(f"ipynb: {e}") from e
    if not isinstance(nb, dict) or not isinstance(nb.get("cells"), list):
        raise ValueError("ipynb: no cells list")
    out = []
    for cell in nb["cells"]:
        if not isinstance(cell, dict):
            continue
        src = cell.get("source", "")
        if isinstance(src, list):
            src = "".join(s for s in src if isinstance(s, str))
        elif not isinstance(src, str):
            src = ""
        ctype = cell.get("cell_type")
        out.append(
            {
                "cell_idx": len(out),
                "cell_type": ctype if isinstance(ctype, str) else None,
                "source": src,
                "n_lines": len(src.split("\n")) if src else 0,
            }
        )
    return out


def notebook_cells(media: DataFrame) -> DataFrame:
    """Explode .ipynb payloads into one row per cell — Arrow-batched
    mapInPandas, zero shuffle, per-payload degrade to zero rows."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "cell_idx", "cell_type", "source", "n_lines"]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    cells = parse_notebook_cells(bytes(payload))
                except ValueError:
                    continue
                for c in cells:
                    rows.append(
                        (mid, c["cell_idx"], c["cell_type"], c["source"],
                         c["n_lines"])
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "payload").mapInPandas(
        extract, NOTEBOOK_CELL_SCHEMA
    )


def documents_as_notebooks(docs: DataFrame) -> DataFrame:
    """Adapter: per document a REAL nbformat-4 notebook of three cells —
    a markdown title cell with LIST-shaped source (two lines), a code
    cell whose STRING source carries the document text on a comment
    line (JSON string escaping is the lossless carrier), and a raw cell
    with the empty source — so cell count, both source shapes, the type
    column and the n_lines arithmetic are all closed-form for
    ``mm_notebook_cells``."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                t = text or ""
                nb = {
                    "nbformat": 4,
                    "nbformat_minor": 5,
                    "metadata": {"language_info": {"name": "python"}},
                    "cells": [
                        {
                            "cell_type": "markdown",
                            "metadata": {},
                            "source": [f"# Doc {did}\n", f"source {did % 9}"],
                        },
                        {
                            "cell_type": "code",
                            "metadata": {},
                            "execution_count": None,
                            "outputs": [],
                            "source": f"x = {did}\n# {t}",
                        },
                        {"cell_type": "raw", "metadata": {}, "source": ""},
                    ],
                }
                rows.append(
                    (did, "ipynb", json.dumps(nb, ensure_ascii=False).encode())
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
