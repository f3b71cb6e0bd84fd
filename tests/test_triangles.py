"""triangle_counts vs hand-enumerated triangles, including a hub node,
duplicate/reversed edges, and self-loops."""

from itertools import combinations

from seaexplorertools_spark.operators.graph import triangle_counts


def _brute(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = {n for e in und for n in e}
    tri = {n: 0 for n in nodes}
    for a, b, c in combinations(sorted(nodes), 3):
        if {(a, b), (a, c), (b, c)} <= und:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    return {n: t for n, t in tri.items() if t}


def test_triangles_match_bruteforce_with_hub(spark):
    # K4 on {0,1,2,3}; hub 9 connected to everything (wheel); a dangling
    # path 4-5; noise: reversed duplicates and a self-loop
    edges = [(a, b) for a, b in combinations(range(4), 2)]
    edges += [(9, n) for n in range(4)] + [(4, 5), (5, 4), (2, 1), (7, 7)]
    df = spark.createDataFrame(edges, ["a", "b"]).repartition(5)
    got = {r["node"]: r["tri"] for r in triangle_counts(df, "a", "b").collect()}
    assert got == _brute(edges)
    # K4 alone has C(3,2)=3 triangles per member plus hub wedges: spot-check
    assert got[9] == 6  # hub closes a triangle with every K4 edge
