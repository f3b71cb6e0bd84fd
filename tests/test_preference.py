"""DPO/RLHF preference-pair prep (operators/chat.py): validity rules
case-by-case, template render, length margin, keep-first prompt dedup,
malformed-JSON degrade, and plan shape (prep stays JVM-side)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from seaexplorertools_spark.operators.chat import (
    documents_as_preference_pairs,
    keep_first_per_prompt,
    preference_prep,
)


def _prep_one(spark, rec):
    payload = rec if isinstance(rec, str) else json.dumps(rec)
    df = spark.createDataFrame([(1, payload)], "doc_id long, pair string")
    return preference_prep(df).collect()[0]


def test_valid_pair_renders_and_measures(spark):
    r = _prep_one(
        spark, {"prompt": "why?", "chosen": "because", "rejected": "no"}
    )
    assert r["valid"] is True
    assert r["rendered_chosen"] == (
        "<|user|>\nwhy?\n<|end|>\n<|assistant|>\nbecause\n<|end|>"
    )
    assert (r["chosen_chars"], r["rejected_chars"], r["margin"]) == (7, 2, 5)


@pytest.mark.parametrize(
    "rec",
    [
        {"prompt": "p", "chosen": "same", "rejected": "same"},  # tie
        {"prompt": "p", "chosen": "", "rejected": "r"},  # empty chosen
        {"prompt": "p", "chosen": "c", "rejected": ""},  # empty rejected
        {"prompt": "", "chosen": "c", "rejected": "r"},  # empty prompt
        {"chosen": "c", "rejected": "r"},  # missing prompt
    ],
)
def test_invalid_pairs(spark, rec):
    assert _prep_one(spark, rec)["valid"] is False


def test_malformed_json_degrades(spark):
    r = _prep_one(spark, "not json {")
    assert r["valid"] is False
    assert r["rendered_chosen"] is None and r["chosen_chars"] is None


def test_keep_first_per_prompt(spark):
    rows = [
        (1, json.dumps({"prompt": "p", "chosen": "a", "rejected": "b"})),
        (2, json.dumps({"prompt": "p", "chosen": "same", "rejected": "same"})),
        (3, json.dumps({"prompt": "p", "chosen": "c", "rejected": "d"})),
        (4, json.dumps({"prompt": "q", "chosen": "e", "rejected": "f"})),
    ]
    df = spark.createDataFrame(rows, "doc_id long, pair string")
    out = {
        r["doc_id"]: r["keep"]
        for r in keep_first_per_prompt(preference_prep(df)).collect()
    }
    # doc 1 is the first VALID row for prompt p; the invalid doc 2 never
    # wins nor blocks; doc 3 is a valid duplicate and is dropped
    assert out == {1: True, 2: False, 3: False, 4: True}


def test_prep_stays_jvm_side(spark):
    docs = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    plan = (
        preference_prep(documents_as_preference_pairs(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Arrow" not in plan


def test_fixture_plants_every_branch(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = keep_first_per_prompt(
        preference_prep(documents_as_preference_pairs(docs))
    )
    agg = out.agg(
        F.sum(F.col("valid").cast("long")).alias("n_valid"),
        F.sum((~F.col("valid")).cast("long")).alias("n_invalid"),
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
        F.sum(F.col("prompt").isNull().cast("long")).alias("n_junk"),
    ).collect()[0]
    assert agg["n_valid"] > 0 and agg["n_invalid"] > 0 and agg["n_junk"] > 0
    # keep-first selects at most one row per distinct prompt
    n_prompts = out.filter("valid").select("prompt").distinct().count()
    assert agg["n_keep"] == n_prompts
