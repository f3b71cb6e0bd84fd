"""Python UDTFs (SURVEY §2.9 table-function surface; Spark 4 ``@udtf``).

The reference reshapes one-row→many-rows in pandas memory (e.g. the
per-ping bin expansion feeding gridding, process_adcp.py:117-134); in
Spark the declarative twin is LATERAL + a table function. Production paths
in this engine use pure-JVM explode/posexplode for that (see
``operators/grid.py``); these UDTFs exist so the Python-UDTF machinery
itself — registration, LATERAL correlation, Arrow-batched eval — is a
tested, oracle-checked part of the engine surface.

Determinism contract: everything here sticks to the regex/string subset
Python's ``re``, Java's regex, and DuckDB's RE2 interpret identically
(char classes, ``+`` repetition, ``\\s``; no lookarounds), so results are
exactly reproducible in the DuckDB oracle.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf


@udtf(returnType="doc_id bigint, sent_id int, sentence string")
class SplitSentences:
    """text → one row per sentence. Sentences split on terminal
    punctuation runs followed by whitespace; ``sent_id`` indexes the raw
    split (before empty-fragment filtering) so ids are stable under
    filtering, and fragments are space-trimmed (DuckDB ``trim``
    semantics: spaces only, not all whitespace)."""

    def eval(self, doc_id, text):  # noqa: D102 — UDTF protocol method
        if text is None:
            return
        for i, frag in enumerate(re.split(r"[.!?]+\s+", text)):
            s = frag.strip(" ")
            if s:
                yield doc_id, i, s


def register_udtfs(spark) -> None:
    """Idempotently register all engine UDTFs for SQL/LATERAL use."""
    spark.udtf.register("split_sentences", SplitSentences)
