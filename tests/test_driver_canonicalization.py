"""Driver-canonicalization conformance (VERDICT r5 #8): every contract
oracle's output must round-trip IDENTICALLY through the pandas conversion
paths a driver most plausibly uses — Spark ``toPandas()`` vs DuckDB
``.df()`` — under a canonicalization that never bridges representations
via float (the coercion that hid the q_table_checksum red cell: a >2^53
DECIMAL(38,0) survives ``str`` but loses digits through ``repr(float)``).

Reuses the mini-driver harness (scripts/check_contract.py) so the pinned
rules live in ONE place. The default run covers the rotation head (the
queries the driver will sample next round) plus every query whose output
carries a representation-risky dtype (object/Decimal, arrays, datetimes);
set SPARK_GRAFT_FULL_CONFORMANCE=1 for the full 237-query sweep (the same
check `scripts/check_contract.py` runs standalone).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
sys.path.insert(0, REPO)

from check_contract import TABLES, canon_frame  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# rotation head size: everything the driver's ~50-query sample will touch
HEAD_N = 50


def _selected_names():
    from seaexplorertools_spark.contract import ORACLES
    from seaexplorertools_spark.contract._order import CANONICAL_ORDER

    if os.environ.get("SPARK_GRAFT_FULL_CONFORMANCE"):
        return [n for n in CANONICAL_ORDER if n in ORACLES]
    return [n for n in CANONICAL_ORDER[:HEAD_N] if n in ORACLES]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _selected_names())
def test_native_pandas_conversions_agree(spark, duck, name):
    from seaexplorertools_spark.contract import ORACLES, QUERIES

    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    odf = duck.sql(ORACLES[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns), name
    assert len(sdf) == len(odf), name
    a, b = canon_frame(sdf), canon_frame(odf)
    diffs = [(x, y) for x, y in zip(a, b) if x != y]
    assert not diffs, f"{name}: {len(diffs)}/{len(a)} rows diverge; first: {diffs[0]}"


def test_decimal_canonicalization_is_exact():
    """The harness rule itself: a >2^53 integral Decimal must canonicalize
    to its exact digit string (what Spark's object column yields), NOT the
    float round-trip (what DuckDB's float64 coercion yields) — so a big-
    decimal representation split between engines FAILS instead of being
    silently bridged."""
    from decimal import Decimal

    from check_contract import canon_cell

    big = Decimal("21125030814269941484")  # the sf0.1 checksum magnitude
    assert canon_cell(big) == "21125030814269941484"
    assert canon_cell(big) != canon_cell(float(big))  # no float bridge
    assert canon_cell(Decimal("2.50")) == "2.5"
    assert canon_cell(Decimal("7")) == canon_cell(7)  # int64 engine agrees
