#!/usr/bin/env python
"""Capture .explain("formatted") for contract queries into plans/<tag>/.

Usage: python scripts/capture_plans.py --tag r09 --suffix before \
           [--only name1,name2] [--sf DIR]

Writes plans/<tag>/<query>_<suffix>.txt for each query (headline + extra
bench set by default). Explain only — no job execution, so it is cheap
and safe to run alongside other work (plans show the AQE initial plan,
isFinalPlan=false; Exchange/join-strategy/PushedFilters shape is what the
round-9 optimization evidence needs).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seaexplorertools_spark import contract  # noqa: E402
from seaexplorertools_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--tag", default="r09")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    if args.only:
        names = [n.strip() for n in args.only.split(",") if n.strip()]
    else:
        import bench

        names = list(bench.HEADLINE) + [n for n in bench.EXTRA
                                        if n in contract.QUERIES]

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("capture_plans")
    for name in names:
        df = contract.QUERIES[name](spark, args.sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
