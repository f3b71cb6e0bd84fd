"""Guards for the round-5 contract package split: the per-domain modules
must expose EXACTLY the flat module's surface — same key order (the
driver's sampling depends on it), same oracle SQL text — and stay within
the review-size budget that motivated the split."""

from __future__ import annotations

import glob
import hashlib
import json
import os

SNAP = os.path.join(os.path.dirname(__file__), "contract_snapshot.json")
PKG = os.path.join(
    os.path.dirname(__file__), "..", "seaexplorertools_spark", "contract"
)


def test_registry_order_and_oracles_match_snapshot():
    from seaexplorertools_spark.contract import ORACLES, QUERIES

    snap = json.load(open(SNAP))
    assert list(QUERIES) == snap["order"]
    assert list(ORACLES) == [k for k in snap["order"] if k in ORACLES]
    for k, want in snap["oracle_md5"].items():
        got = hashlib.md5(ORACLES[k].encode()).hexdigest()
        assert got == want, f"oracle text drifted for {k}"


def test_entry_surface_matches_registry():
    import __spark_entry__ as e
    from seaexplorertools_spark.contract import ORACLES, QUERIES

    assert list(e.queries()) == list(QUERIES)
    assert e.oracle_sql() == ORACLES


def test_no_contract_module_exceeds_size_budget():
    for p in glob.glob(os.path.join(PKG, "*.py")):
        n = len(open(p).read().split("\n"))
        assert n <= 2000, f"{os.path.basename(p)} has {n} lines (> 2000)"


def test_canonical_order_covers_registry_exactly():
    from seaexplorertools_spark.contract import QUERIES
    from seaexplorertools_spark.contract._order import CANONICAL_ORDER

    assert len(CANONICAL_ORDER) == len(set(CANONICAL_ORDER))
    assert set(CANONICAL_ORDER) == set(QUERIES)
