#!/usr/bin/env python
"""Mini-driver: run every __spark_entry__.queries() entry on Spark AND its
oracle_sql() on DuckDB, compare row count + column names + sorted values.

This replicates the driver's CORRECTNESS gate locally (order-insensitive
exact compare). Exit non-zero on any mismatch.

Usage: python scripts/check_contract.py [--sf DIR] [--only name1,name2]
       python scripts/check_contract.py --stale N   (no Spark session:
           list queries whose last official green CORRECTNESS_r*.json
           row is older than N rounds — rotation-head candidates)
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "∅"
        # deliberately NOT normalizing -0.0: repr keeps the sign, making this
        # harness stricter than any plausible driver canonicalization
        return repr(f)
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if v is pd.NaT:
        return "∅"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            # EXACT decimal canonicalization — never via float. The round-5
            # red cell (q_table_checksum) was a >int64 DECIMAL(38,0) that
            # this harness's old repr(float(v)) bridged while the driver's
            # canonicalization did not: beyond 2^53 the float round-trip
            # loses digits, so float-coercing here HIDES exactly the class
            # of divergence the conformance gate exists to catch. Integral
            # decimals canonicalize as plain int strings so an engine
            # returning int64 for the same value still matches.
            if v == v.to_integral_value():
                return str(int(v))
            return str(v.normalize())
    except Exception:
        pass
    return str(v)


def canon_frame(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(canon_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    return rows


def stale_report(n_rounds: int) -> int:
    """List queries whose last official green driver row (from the
    committed CORRECTNESS_r*.json records) is older than ``n_rounds``
    rounds — ordered oldest-first, the rotation-head candidates. The
    round routine puts the top ~10 of these at the head of
    contract/_order.py::CANONICAL_ORDER each round so official rows
    refresh (306 queries / ~50 driver samples per round means a full
    refresh cycle is 6+ rounds without rotation)."""
    import glob
    import json
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last: dict[str, int] = {}
    latest_round = 0
    for p in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(p))
        if not m:
            continue
        rnd = int(m.group(1))
        latest_round = max(latest_round, rnd)
        for k, v in json.load(open(p)).items():
            if v.get("hash_match") or v.get("rows_match"):
                last[k] = max(last.get(k, 0), rnd)
    from seaexplorertools_spark.contract import QUERIES

    stale = sorted(
        ((last.get(k, 0), k) for k in QUERIES
         if latest_round - last.get(k, 0) >= n_rounds),
    )
    for rnd, k in stale:
        tag = f"r{rnd}" if rnd else "never"
        print(f"{tag:>6}  {k}")
    print(f"\n{len(stale)} queries with last official row older than "
          f"{n_rounds} rounds (latest round on disk: r{latest_round})")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("--only", default=None)
    ap.add_argument(
        "--driverlike",
        action="store_true",
        help="adversarial session: ANSI on, non-UTC timezone, default "
        "shuffle partitions — revalidates that every query is session-proof",
    )
    ap.add_argument(
        "--stale",
        type=int,
        default=None,
        metavar="N",
        help="list queries whose last official green row is ≥N rounds old "
        "(reads CORRECTNESS_r*.json; no Spark session started)",
    )
    args = ap.parse_args()
    if args.stale is not None:
        return stale_report(args.stale)

    import __spark_entry__ as entrymod
    from seaexplorertools_spark.session import get_spark

    spark = get_spark("check_contract")
    if args.driverlike:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        spark.conf.set("spark.sql.shuffle.partitions", "200")
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        if name not in oracles:
            status = "ROWS" if len(sdf) >= 0 else "FAIL"
            print(f"{status}  {name}: rows={len(sdf)} (no oracle — rows-only check) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"FAIL  {name}: columns differ spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
            n_fail += 1
            failures.append(name)
            continue
        if len(sdf) != len(odf):
            print(f"FAIL  {name}: rowcount spark={len(sdf)} oracle={len(odf)}")
            n_fail += 1
            failures.append(name)
            continue
        a, b = canon_frame(sdf), canon_frame(odf)
        if a != b:
            ndiff = sum(1 for x, y in zip(a, b) if x != y)
            print(f"FAIL  {name}: {ndiff}/{len(a)} canonical rows differ")
            for x, y in list(zip(a, b))[:2000]:
                if x != y:
                    print(f"      spark:  {x}\n      oracle: {y}")
                    break
            n_fail += 1
            failures.append(name)
            continue
        print(f"PASS  {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")
        n_pass += 1

    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    if failures:
        print("failures:", ",".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
