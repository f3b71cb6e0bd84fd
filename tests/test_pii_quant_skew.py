"""Unit tests for the PII-redaction, int8-quantization, token-entropy and
salted-join operators (engine additions for training-data pipelines; the
contract queries txt_pii_redact / ann_quantize_int8 / txt_entropy /
q_salted_join are the oracle-parity checks — these tests pin the operator
semantics on crafted inputs)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from seaexplorertools_spark.operators.similarity import quantize_int8
from seaexplorertools_spark.operators.skew import salted_join
from seaexplorertools_spark.operators.text import pii_redact, token_entropy


def test_pii_redact_crafted(spark):
    df = spark.createDataFrame(
        [
            (0, "mail me at jo.doe+x@sub.example.org or call +44-123-456-7890"),
            (1, "server 192.168.0.1 and 10.0.0.255 talked"),
            (2, "nothing sensitive here, v1.2 and a@b are not matches"),
        ],
        "id long, text string",
    )
    out = {r["id"]: r for r in pii_redact(df).collect()}
    assert out[0]["n_emails"] == 1 and out[0]["n_phones"] == 1
    assert "<EMAIL>" in out[0]["redacted"] and "<PHONE>" in out[0]["redacted"]
    assert "jo.doe" not in out[0]["redacted"]
    assert out[1]["n_ips"] == 2 and out[1]["redacted"].count("<IP>") == 2
    # 'v1.2' / 'a@b' (no TLD) must NOT be flagged
    assert out[2]["n_emails"] == 0 and out[2]["n_ips"] == 0 and out[2]["n_phones"] == 0
    assert out[2]["redacted"] == out[2]["text"]


def test_quantize_int8_bounds_and_direction(spark):
    df = spark.createDataFrame(
        [(0, [3.0, -4.0, 0.0]), (1, [1.0, 1.0, 1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    # vec 0: norm 5, y = (.6, -.8, 0), scale .8 → q = (95|96, -127, 0)
    assert abs(out[0]["l2_norm"] - 5.0) < 1e-12
    assert out[0]["q"][1] == -127 and out[0]["q"][2] == 0
    assert out[0]["q"][0] == math.floor(0.6 / 0.8 * 127 + 0.5)
    # every element within int8 range, max |q| == 127 exactly
    for r in out.values():
        assert all(-127 <= v <= 127 for v in r["q"])
        assert max(abs(v) for v in r["q"]) == 127


def test_token_entropy_crafted(spark):
    df = spark.createDataFrame(
        [(0, "a a a a"), (1, "a b c d")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in token_entropy(df).collect()}
    assert out[0]["entropy"] == 0.0  # single repeated token → zero entropy
    assert abs(out[1]["entropy"] - round(math.log(4), 6)) < 1e-9  # uniform → ln 4
    assert out[1]["n_types"] == 4 and out[1]["n_tokens"] == 4


def test_salted_join_equals_plain_join(spark, sf_dir):
    from seaexplorertools_spark.contract import events

    ev = events(spark, sf_dir).select("event_id", "event_type", "value")
    dim = ev.groupBy("event_type").agg(F.round(F.avg("value"), 6).alias("type_avg"))
    salted = salted_join(ev, dim, ["event_type"], n_salts=8, salt_from="event_id")
    plain = ev.join(dim, "event_type")
    cols = ["event_id", "event_type", "value", "type_avg"]
    assert salted.count() == plain.count()
    assert salted.select(*cols).exceptAll(plain.select(*cols)).count() == 0
