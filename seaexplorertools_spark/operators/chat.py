"""Chat-transcript operators — SFT/RLHF data prep, pure JVM.

Instruction-tuning corpora arrive as JSON transcripts: an array of
``{role, content}`` turns. The prep steps a training pipeline runs —
parse, validate the turn structure, render with a chat template, count
turns/chars — are all expressible with Spark's built-in higher-order
functions, so these operators stay INSIDE whole-stage codegen:
``from_json`` for the parse, ``transform``/``exists``/``filter`` for
per-turn logic, ``concat_ws``/``aggregate`` for the render. No Python
worker, no shuffle, no UDF — the deliberate contrast to the byte-format
lanes (which need mapInPandas because they decode binary payloads).

The rendered template is the ubiquitous role-tagged form::

    <|role|>
    content
    <|end|>

one block per turn, newline-joined. Validation checks the structural
rules SFT filtering actually applies: known roles only, at most one
leading system turn, user/assistant strictly alternating afterwards,
ending on assistant, no empty content.

Reference parity: no conversational path exists in the reference
(`/root/reference/seaexplorertools/process_adcp.py`); part of the
LLM-training surface the brief adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TURNS_SCHEMA = "array<struct<role:string,content:string>>"

KNOWN_ROLES = ("system", "user", "assistant")


def parse_turns(json_col) -> Column:
    """JSON transcript string → array<struct<role,content>> (JVM
    ``from_json``; malformed JSON → NULL, the degrade contract)."""
    return F.from_json(json_col, TURNS_SCHEMA)


def render_template(turns: Column) -> Column:
    """Render turns with the role-tag template — one ``transform`` +
    ``concat_ws``, fully codegen."""
    return F.concat_ws(
        "\n",
        F.transform(
            turns,
            lambda t: F.concat(
                F.lit("<|"), t["role"], F.lit("|>\n"),
                F.coalesce(t["content"], F.lit("")), F.lit("\n<|end|>"),
            ),
        ),
    )


def validate_turns(turns: Column) -> Column:
    """Structural validity — every check a JVM higher-order function:

    - parseable, non-empty
    - every role ∈ {system, user, assistant}; no NULL/empty content
    - at most one system turn, and only at position 0
    - after the optional system turn, roles strictly alternate
      user/assistant starting with user
    - the last turn is assistant (a training example needs a target)
    """
    n = F.size(turns)
    roles_ok = ~F.exists(
        turns,
        lambda t: t["role"].isNull()
        | ~t["role"].isin(*KNOWN_ROLES)
        | t["content"].isNull()
        | (F.length(t["content"]) == 0),
    )
    sys_extra = F.exists(
        F.zip_with(
            turns,
            F.sequence(F.lit(0), n - 1),
            lambda t, i: (t["role"] == "system") & (i > 0),
        ),
        lambda bad: bad,
    )
    # alternation: role at index i (past the optional leading system
    # turn) must be 'user' on even offsets, 'assistant' on odd
    offset = F.when(turns[0]["role"] == F.lit("system"), F.lit(1)).otherwise(
        F.lit(0)
    )
    alternate_ok = ~F.exists(
        F.zip_with(
            turns,
            F.sequence(F.lit(0), n - 1),
            lambda t, i: (i >= offset)
            & (
                t["role"]
                != F.when((i - offset) % 2 == 0, F.lit("user")).otherwise(
                    F.lit("assistant")
                )
            ),
        ),
        lambda bad: bad,
    )
    ends_on_assistant = turns[n - 1]["role"] == F.lit("assistant")
    return (
        turns.isNotNull()
        & (n > 0)
        & roles_ok
        & ~sys_extra
        & alternate_ok
        & ends_on_assistant
    )


def chat_flatten(df: DataFrame, json_col: str = "transcript") -> DataFrame:
    """Parse + validate + render + count in ONE projection (no shuffle,
    no Python): adds ``n_turns``, ``valid``, ``rendered``,
    ``n_assistant_chars`` (the supervised-token budget — chars of
    assistant turns only)."""
    turns = parse_turns(F.col(json_col))
    assistant_chars = F.aggregate(
        F.filter(turns, lambda t: t["role"] == F.lit("assistant")),
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.length(F.coalesce(t["content"], F.lit(""))),
    )
    return df.select(
        "*",
        F.size(turns).cast("long").alias("n_turns"),
        validate_turns(turns).alias("valid"),
        render_template(turns).alias("rendered"),
        assistant_chars.alias("n_assistant_chars"),
    )


def documents_as_transcripts(docs: DataFrame) -> DataFrame:
    """Adapter: per document a JSON transcript built JVM-side
    (``to_json`` over struct arrays — the fixture itself stays codegen):
    system turn, user turn carrying the document text, assistant ack;
    odd doc_ids append a second user/assistant exchange; doc_ids
    divisible by 7 get a planted VIOLATION (trailing user turn with no
    assistant reply) so the validity column has both outcomes under the
    oracle."""
    d = F.col("doc_id")
    t = F.coalesce(F.col("text"), F.lit(""))

    def turn(role, content):
        return F.struct(
            F.lit(role).alias("role"), content.alias("content")
        )

    base = [
        turn("system", F.lit("You are a helpful assistant.")),
        turn("user", t),
        turn("assistant", F.concat(F.lit("ack "), d.cast("string"))),
    ]
    extra = [
        turn("user", F.concat(F.lit("more on "), (d % 13).cast("string"))),
        turn("assistant", F.concat(F.lit("detail "), (d % 13).cast("string"))),
    ]
    dangling = [turn("user", F.lit("are you there?"))]
    arr = (
        F.when(d % 7 == 0, F.array(*base, *dangling))
        .when(d % 2 == 1, F.array(*base, *extra))
        .otherwise(F.array(*base))
    )
    return docs.select("doc_id", F.to_json(arr).alias("transcript"))
