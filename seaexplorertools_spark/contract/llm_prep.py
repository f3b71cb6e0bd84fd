"""Round-8 continuation lanes: RLHF/preference data prep, tokenizer
surface extensions, and further ingest formats. New module so the
per-module size budget (contract/_order.py rotation unchanged) holds.

Conventions: contract/_base.py; canonical key order: contract/_order.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from ._base import ORACLES, QUERIES, q, r6, r6p, table  # noqa: F401


@q(
    "q_dpo_pairs",
    """
    WITH p AS (
      SELECT doc_id,
             CASE WHEN doc_id % 19 = 0 THEN NULL
                  ELSE 'q ' || (doc_id % 97) END AS prompt,
             CASE WHEN doc_id % 19 = 0 THEN NULL
                  ELSE 'good ' || (doc_id % 17) END AS chosen,
             CASE WHEN doc_id % 19 = 0 THEN NULL
                  WHEN doc_id % 11 = 0 THEN 'good ' || (doc_id % 17)
                  WHEN doc_id % 13 = 0 THEN ''
                  ELSE 'meh ' || (doc_id % 5) END AS rejected
      FROM documents
    ),
    v AS (
      SELECT doc_id, prompt, chosen, rejected,
             coalesce(length(prompt) > 0 AND length(chosen) > 0
                      AND length(rejected) > 0 AND chosen <> rejected,
                      FALSE) AS valid,
             CAST(length(chosen) AS BIGINT) AS chosen_chars,
             CAST(length(rejected) AS BIGINT) AS rejected_chars,
             CAST(length(chosen) - length(rejected) AS BIGINT) AS margin,
             CASE WHEN prompt IS NOT NULL THEN
               '<|user|>' || chr(10) || prompt || chr(10) || '<|end|>'
               || chr(10) || '<|assistant|>' || chr(10) || chosen
               || chr(10) || '<|end|>'
             END AS rendered_chosen
      FROM p
    )
    SELECT doc_id, prompt, valid,
           coalesce(valid AND doc_id = min(CASE WHEN valid THEN doc_id END)
                    OVER (PARTITION BY prompt), FALSE) AS keep,
           chosen_chars, rejected_chars, margin, rendered_chosen
    FROM v
    """,
)
def q_dpo_pairs(spark, sf_dir):
    """DPO/RLHF preference-pair prep (operators/chat.py — the RLHF twin
    of q_chat_flatten): parse {prompt, chosen, rejected} JSON records,
    validate (non-empty sides, chosen ≠ rejected, parseable), render the
    chosen sequence with the shared role-tag template, compute the
    length-margin diagnostic, and dedup prompts keep-first (one hash
    shuffle on the prompt). Everything before the dedup window is pure
    codegen — no Python, no Arrow. The fixture plants every violation
    class on coprime moduli (junk JSON %19, tie %11, empty rejected
    %13) and collides prompts on %97 so the dedup has real work; the
    constructor oracle rebuilds all of it closed-form from doc_id."""
    from ..operators.chat import (
        documents_as_preference_pairs,
        keep_first_per_prompt,
        preference_prep,
    )

    pairs = documents_as_preference_pairs(table(spark, sf_dir, "documents"))
    out = keep_first_per_prompt(preference_prep(pairs))
    return out.select(
        "doc_id", "prompt", "valid", "keep", "chosen_chars",
        "rejected_chars", "margin", "rendered_chosen",
    )
