"""Physical-plan inspection helpers.

The engine's scale story rests on Catalyst doing the right thing: filters
reaching the Parquet scan (PushedFilters), projections pruning the read
schema (ReadSchema), small dims broadcasting, aggregates running map-side
first. These helpers make those properties ASSERTABLE in tests instead of
hoped-for (tests/test_plans.py).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def scan_info(df: DataFrame) -> list[dict]:
    """Parse every Parquet scan node: pushed filters + read schema columns."""
    text = explain_str(df)
    scans = []
    for block in re.split(r"\n\(\d+\) ", text):
        if not block.startswith("Scan parquet"):
            continue
        pushed = re.search(r"PushedFilters: \[(.*?)\]", block)
        schema = re.search(r"ReadSchema: struct<(.*?)>", block, re.S)
        cols = []
        if schema:
            cols = [c.split(":")[0].strip() for c in schema.group(1).split(",") if ":" in c]
        scans.append(
            {
                "pushed_filters": [f.strip() for f in pushed.group(1).split(",")] if pushed and pushed.group(1) else [],
                "read_columns": cols,
            }
        )
    return scans


def has_pushed_filters(df: DataFrame) -> bool:
    return any(s["pushed_filters"] for s in scan_info(df))


def read_schema_columns(df: DataFrame) -> set[str]:
    cols: set[str] = set()
    for s in scan_info(df):
        cols |= set(s["read_columns"])
    return cols


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan — the scale currency."""
    return explain_str(df, "simple").count("Exchange")


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")
