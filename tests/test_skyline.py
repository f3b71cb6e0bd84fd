"""skyline2d vs brute-force domination on random points — exactness of
the two-phase plan (prune on/off identical), duplicate frontier points
kept, partitioning invariance."""

import random

from seaexplorertools_spark.operators.skyline import skyline2d


def _brute(pts):
    out = []
    for i, (x, y) in enumerate(pts):
        dominated = any(
            (x2 >= x and y2 >= y and (x2 > x or y2 > y)) for x2, y2 in pts
        )
        if not dominated:
            out.append((x, y))
    return sorted(out)


def test_skyline_matches_bruteforce(spark):
    rng = random.Random(11)
    pts = [(rng.randrange(100), rng.randrange(100)) for _ in range(400)]
    pts += [(99, 99), (99, 99)]  # duplicate frontier point: keep both
    df = spark.createDataFrame(pts, ["x", "y"]).repartition(13)
    want = _brute(pts)
    got = sorted((r["x"], r["y"]) for r in skyline2d(df, "x", "y").collect())
    assert got == want
    assert got.count((99, 99)) == 2
    # prune-off path identical
    got_np = sorted(
        (r["x"], r["y"]) for r in skyline2d(df, "x", "y", prune=False).collect()
    )
    assert got_np == want
    # partitioning invariance of the pruned plan
    got1 = sorted(
        (r["x"], r["y"]) for r in skyline2d(df.repartition(1), "x", "y").collect()
    )
    assert got1 == want


def test_skyline_chain_all_on_frontier(spark):
    # strictly anti-correlated points: every point is on the frontier
    pts = [(i, 100 - i) for i in range(50)]
    df = spark.createDataFrame(pts, ["x", "y"]).repartition(7)
    assert len(skyline2d(df, "x", "y").collect()) == 50
