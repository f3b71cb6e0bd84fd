"""connected_components / dup_clusters: min-label propagation must produce
the exact transitive closure (chains, merged cliques, isolated pairs),
converge in ~diameter rounds, and fail loudly rather than mislabel when
the iteration cap is exceeded."""

from __future__ import annotations

import pytest

from seaexplorertools_spark.operators.graph import connected_components, dup_clusters


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df, **kw)
    return {r["node"]: r["component"] for r in out.collect()}


def test_two_components_and_chain(spark):
    # component {1,2,3,4} is a chain (diameter 3); {10,11} an isolated pair
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_clique_merge_via_bridge(spark):
    # two triangles bridged by one edge collapse to one component
    edges = [(1, 2), (2, 3), (1, 3), (7, 8), (8, 9), (7, 9), (3, 7)]
    got = _cc(spark, edges)
    assert set(got.values()) == {1}
    assert len(got) == 6


def test_long_path_converges(spark):
    # path 0-1-2-...-9: worst-case diameter for min propagation
    got = _cc(spark, [(i, i + 1) for i in range(9)])
    assert set(got.values()) == {0}
    assert len(got) == 10


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(9)], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2)


def test_dup_clusters_keep_flag(spark):
    pairs = spark.createDataFrame([(5, 3), (3, 9), (20, 21)], "doc1 long, doc2 long")
    out = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in dup_clusters(pairs).collect()}
    assert out == {
        3: (3, True), 5: (3, False), 9: (3, False),
        20: (20, True), 21: (20, False),
    }


def test_two_hop_counts_path_and_square(spark):
    from seaexplorertools_spark.operators.graph import two_hop_counts

    # path 1-2-3-4: strict 2-hop: 1->{3}, 2->{4}, 3->{1}, 4->{2}
    path = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["a", "b"])
    out = {r["node"]: (r["n_one_hop"], r["n_two_hop"]) for r in
           two_hop_counts(path, "a", "b").collect()}
    assert out == {1: (1, 1), 2: (2, 1), 3: (2, 1), 4: (1, 1)}

    # square 1-2-3-4-1: everyone's 2-hop neighbor is the opposite corner
    sq = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (4, 1)], ["a", "b"])
    out2 = {r["node"]: (r["n_one_hop"], r["n_two_hop"]) for r in
            two_hop_counts(sq, "a", "b").collect()}
    assert out2 == {1: (2, 1), 2: (2, 1), 3: (2, 1), 4: (2, 1)}

    # triangle: no strict 2-hop (everything reachable in 1)
    tri = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], ["a", "b"])
    out3 = {r["node"]: r["n_two_hop"] for r in two_hop_counts(tri, "a", "b").collect()}
    assert out3 == {1: 0, 2: 0, 3: 0}


def test_two_hop_hub_cap_drops_hub_wedges(spark):
    from seaexplorertools_spark.operators.graph import two_hop_counts

    # star center 0 with leaves 1..5, plus chain 1-6-7: leaves reach each
    # other only through the hub (degree 5)
    edges = [(0, i) for i in range(1, 6)] + [(1, 6), (6, 7)]
    df = spark.createDataFrame(edges, ["a", "b"])
    exact = {r["node"]: r["n_two_hop"] for r in two_hop_counts(df, "a", "b").collect()}
    assert exact[2] == 4  # leaves 1,3,4,5 via the hub
    capped = {r["node"]: r["n_two_hop"] for r in
              two_hop_counts(df, "a", "b", max_mid_degree=3).collect()}
    # with the hub (deg 5) capped out as a mid, leaf-to-leaf wedges vanish
    assert capped[2] == 0
    # wedges through low-degree mids survive: 0 still reaches 6 via 1 (deg 2)
    assert capped[0] == exact[0] == 1
    assert capped[7] == exact[7] == 1  # 7-6-1 chain unaffected


def test_label_propagation_two_cliques(spark):
    from seaexplorertools_spark.operators.graph import label_propagation

    # two 4-cliques joined by one bridge edge: LPA labels each clique by
    # its minimum id; the bridge doesn't flip anything (minority label)
    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = c1 + c2 + [(3, 10)]
    df = spark.createDataFrame(edges, ["a", "b"])
    out = {r["node"]: r["label"] for r in label_propagation(df, n_iter=3).collect()}
    assert all(out[n] == 0 for n in range(4))
    assert all(out[n] == 10 for n in range(10, 14))


def test_label_propagation_matches_python_replay(spark):
    from collections import Counter

    from seaexplorertools_spark.operators.graph import label_propagation

    import random

    rng = random.Random(5)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["a", "b"])
    got = {r["node"]: r["label"] for r in label_propagation(df, n_iter=3).collect()}

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {n: n for n in adj}
    for _ in range(3):
        new = {}
        for u, nbrs in adj.items():
            c = Counter(labels[v] for v in nbrs)
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            new[u] = best[0]
        labels = new
    assert got == labels
