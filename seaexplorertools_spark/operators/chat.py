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


PAIR_SCHEMA = "struct<prompt:string,chosen:string,rejected:string>"


def parse_pair(json_col) -> Column:
    """JSON preference record → struct(prompt, chosen, rejected)
    (JVM ``from_json``; malformed JSON → NULL struct, the degrade
    contract shared with :func:`parse_turns`)."""
    return F.from_json(json_col, PAIR_SCHEMA)


def render_exchange(prompt: Column, response: Column) -> Column:
    """One user/assistant exchange in the role-tag template — the DPO
    twin of :func:`render_template` (both the chosen and the rejected
    sequence go through this so the policy/reference forward passes see
    identical formatting)."""
    return F.concat(
        F.lit("<|user|>\n"), prompt, F.lit("\n<|end|>\n<|assistant|>\n"),
        response, F.lit("\n<|end|>"),
    )


def preference_prep(df: DataFrame, json_col: str = "pair") -> DataFrame:
    """DPO/RLHF preference-pair prep in ONE codegen projection (no
    shuffle, no Python): parse the JSON record, validate it the way a
    preference-training filter does — parseable; prompt, chosen and
    rejected all non-empty; chosen ≠ rejected (a tie carries no
    preference signal) — and add the training-side columns: rendered
    chosen sequence, per-side char counts, and the length margin
    (chosen − rejected), the standard length-bias diagnostic.

    Invalid-but-parseable rows keep their counts (the filter report
    wants them); unparseable rows degrade to NULLs with ``valid=false``.
    """
    p = parse_pair(F.col(json_col))
    prompt, chosen, rejected = p["prompt"], p["chosen"], p["rejected"]
    valid = F.coalesce(
        (F.length(prompt) > 0)
        & (F.length(chosen) > 0)
        & (F.length(rejected) > 0)
        & (chosen != rejected),
        F.lit(False),
    )
    return df.select(
        "*",
        prompt.alias("prompt"),
        valid.alias("valid"),
        F.length(chosen).cast("long").alias("chosen_chars"),
        F.length(rejected).cast("long").alias("rejected_chars"),
        (F.length(chosen) - F.length(rejected)).cast("long").alias("margin"),
        F.when(p.isNotNull(), render_exchange(prompt, chosen)).alias(
            "rendered_chosen"
        ),
    )


def keep_first_per_prompt(
    df: DataFrame, prompt_col: str = "prompt", order_col: str = "doc_id",
    valid_col: str = "valid",
) -> DataFrame:
    """Prompt-level dedup for preference corpora: among VALID rows
    sharing a prompt, keep the first by ``order_col`` (DPO training
    assumes one pair per prompt; duplicated prompts double-count their
    gradient). One hash shuffle on the prompt — the min-over-window
    form, no row_number over a filtered self-join."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(prompt_col)
    first_valid = F.min(
        F.when(F.col(valid_col), F.col(order_col))
    ).over(w)
    keep = F.col(valid_col) & (F.col(order_col) == first_valid)
    return df.withColumn("keep", F.coalesce(keep, F.lit(False)))


def documents_as_preference_pairs(docs: DataFrame) -> DataFrame:
    """Adapter: per document a JSON preference record built JVM-side.
    Prompts collide on purpose (``q <doc_id % 97>``) so the prompt-dedup
    step has real work; planted violations rotate on coprime moduli so
    every validity branch exists under the oracle: doc_id % 19 → raw
    junk (unparseable), % 11 → chosen == rejected (tie), % 13 → empty
    rejected."""
    d = F.col("doc_id")
    prompt = F.concat(F.lit("q "), (d % 97).cast("string"))
    chosen = F.concat(F.lit("good "), (d % 17).cast("string"))
    rejected = (
        F.when(d % 11 == 0, chosen)
        .when(d % 13 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("meh "), (d % 5).cast("string")))
    )
    record = F.to_json(
        F.struct(
            prompt.alias("prompt"),
            chosen.alias("chosen"),
            rejected.alias("rejected"),
        )
    )
    junk = F.lit("not json {")
    return docs.select(
        "doc_id",
        F.when(d % 19 == 0, junk).otherwise(record).alias("pair"),
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
