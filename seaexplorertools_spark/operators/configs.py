"""TOML config parsing — the repo/config-file ingest lane.

Code corpora are full of TOML (pyproject, Cargo.toml, config files —
public spec at toml.io). The training-side ask is key/value extraction
with section attribution and value typing. The Spark shape is the
interesting part: section attribution is a FORWARD FILL — explode
lines, mark ``[section]`` headers, then ``last(..., ignorenulls)``
over a doc-partitioned line-ordered window (the same ffill idiom as
operators/windows.py::ffill) — so the whole parse is codegen + one
doc-partitioned window, no Python.

Scope (documented): flat ``key = value`` pairs with string / integer /
float / boolean values; full-line and trailing comments (naive — a
``#`` inside a quoted value is out of scope); dotted keys, arrays,
inline tables and dates surface as vtype='other' with the raw text in
str_val. That's the subset config-mining actually keys on.

Reference parity: none (LLM-data surface the brief adds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def toml_entries(df: DataFrame, key: str = "doc_id", toml: str = "toml_text") -> DataFrame:
    """Explode a TOML document into one row per key:
    (key, section, key_name, vtype, str_val, num_val, bool_val) —
    section NULL for top-level keys."""
    lines = F.split(F.col(toml), "\n")
    e = df.select(key, F.posexplode(lines).alias("line_idx", "raw"))
    # strip trailing comment, then whitespace (naive: no # in strings)
    line = F.trim(F.regexp_replace(F.col("raw"), "#.*$", ""))
    sec = F.regexp_extract(line, r"^\[([^\]]+)\]$", 1)
    k = F.regexp_extract(line, r"^([A-Za-z0-9_-]+)\s*=", 1)
    v = F.trim(F.regexp_extract(line, r"^[A-Za-z0-9_-]+\s*=\s*(.*)$", 1))
    marked = e.select(
        key,
        "line_idx",
        F.when(sec != "", sec).alias("sec_header"),
        F.when(k != "", k).alias("key_name"),
        v.alias("val"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy("line_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = marked.withColumn(
        "section", F.last("sec_header", ignorenulls=True).over(w)
    ).filter(F.col("key_name").isNotNull())
    val = F.col("val")
    is_str = val.rlike('^".*"$')
    is_bool = val.isin("true", "false")
    is_int = val.rlike(r"^-?\d+$")
    is_float = val.rlike(r"^-?\d+\.\d+$")
    vtype = (
        F.when(is_str, "string")
        .when(is_bool, "bool")
        .when(is_int, "int")
        .when(is_float, "float")
        .otherwise("other")
    )
    return filled.select(
        key,
        "section",
        "key_name",
        vtype.alias("vtype"),
        F.when(is_str, F.regexp_extract(val, '^"(.*)"$', 1))
        .when(vtype == "other", val)
        .alias("str_val"),
        F.when(is_int | is_float, val.cast("double")).alias("num_val"),
        F.when(is_bool, val == "true").alias("bool_val"),
    )


def documents_as_toml(docs: DataFrame) -> DataFrame:
    """Adapter: per document a REAL TOML config — top-level string/
    int/float/bool keys, a comment line and a trailing comment (both
    must strip), an ``[owner]`` section, a ``[features]`` section only
    on doc_id % 3 == 0, and an array value (the vtype='other' branch).
    Closed-form in doc_id for ``q_toml_entries``."""
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    body = F.concat(
        F.lit('# generated fixture\ntitle = "Doc '), s(d),
        F.lit('"\ncount = '), s(d % 100),
        F.lit("  # trailing comment\nratio = "), s(d % 7),
        F.lit(".25\nactive = "),
        F.when(d % 2 == 0, F.lit("true")).otherwise(F.lit("false")),
        F.lit("\ntags = [1, 2]\n\n[owner]\nname = \"User "), s(d % 30),
        F.lit('"\nlevel = '), s(d % 5),
        F.when(
            d % 3 == 0, F.lit("\n\n[features]\nflag = true")
        ).otherwise(F.lit("")),
    )
    return docs.select("doc_id", body.alias("toml_text"))
