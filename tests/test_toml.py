"""TOML key/value mining (operators/configs.py): section ffill,
typing, comments, and the 'other' fallback."""

from __future__ import annotations

from seaexplorertools_spark.operators.configs import (
    documents_as_toml,
    toml_entries,
)

TOML = """# header comment
name = "demo"   # trailing
port = 8080
pi = 3.5
on = true
off = false
neg = -12
arr = [1, "two"]

[server]
host = "h1"

[server.tls]
enabled = false
"""


def _run(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, toml_text string")
    return {
        (r["section"], r["key_name"]): r for r in toml_entries(df).collect()
    }


def test_typing_and_sections(spark):
    got = _run(spark, TOML)
    assert got[(None, "name")]["vtype"] == "string"
    assert got[(None, "name")]["str_val"] == "demo"  # trailing comment gone
    assert got[(None, "port")]["num_val"] == 8080.0
    assert got[(None, "pi")]["vtype"] == "float" and got[(None, "pi")]["num_val"] == 3.5
    assert got[(None, "on")]["bool_val"] is True
    assert got[(None, "off")]["bool_val"] is False
    assert got[(None, "neg")]["num_val"] == -12.0
    assert got[(None, "arr")]["vtype"] == "other"
    # section attribution ffills, dotted section names pass through
    assert got[("server", "host")]["str_val"] == "h1"
    assert got[("server.tls", "enabled")]["bool_val"] is False


def test_no_keys(spark):
    assert _run(spark, "# only comments\n\n[empty]") == {}


def test_fixture_branches(spark, sf_dir):
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = toml_entries(documents_as_toml(docs))
    types = {r["vtype"] for r in out.select("vtype").distinct().collect()}
    assert types == {"string", "int", "float", "bool", "other"}
    secs = {r["section"] for r in out.select("section").distinct().collect()}
    assert secs == {None, "owner", "features"}
