"""Distributed connected components — the dedup-cluster endgame.

LSH/Jaccard stages emit duplicate *pairs*; turning pairs into keep/drop
decisions needs the transitive closure (a~b, b~c ⇒ one cluster {a,b,c},
keep one). This is a training-data-pipeline engine addition (not part of
the reference's surface).

Algorithm: iterative min-label propagation entirely in DataFrame ops —
every node starts labeled with its own id; each round every node takes the
min of its label and its neighbors' labels; converged when no label
changes. Rounds needed = graph diameter, and near-dup graphs are
band-collision cliques plus short chains (diameter ≤ ~3 in practice), so
the loop is short. Each round is one equi-join + one groupBy (two
shuffles) over |edges| + |nodes| rows; `localCheckpoint` truncates the
lineage so plans don't grow with iterations, and the symmetric edge list
is checkpointed once and reused.

At larger diameters (social graphs, web graphs) the alternating
large-star/small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond") converges in O(log² n) rounds and would slot into
the same driver loop; min-propagation is the right tool for the bounded
dedup topology.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import consistency_cache


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the minimum
    node id of its connected component.

    Returns (node, component) — one row per distinct node appearing in any
    edge. Raises ``RuntimeError`` if not converged within ``max_iter``
    rounds (diameter bound exceeded) rather than returning wrong labels.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)  # computed once, reused every round
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )

    # labels are monotone non-increasing, so the exact sum is unchanged IFF
    # no label changed — one 1-row aggregate per round instead of a
    # join+count change detector (decimal(38,0): exact, no int64 overflow)
    def _sig(lbl):
        return lbl.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    sig = _sig(labels)
    for _ in range(max_iter):
        nbr = sym.join(
            labels.select(F.col("node").alias("b"), F.col("component")), "b"
        ).select(F.col("a").alias("node"), "component")
        labels = (
            labels.union(nbr)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        new_sig = _sig(labels)
        if new_sig == sig:
            return labels
        sig = new_sig
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "the graph diameter exceeds the dedup-topology bound — raise "
        "max_iter or use a large-star/small-star variant"
    )


def dup_clusters(
    pairs: DataFrame,
    src: str = "doc1",
    dst: str = "doc2",
    max_iter: int = 25,
) -> DataFrame:
    """Duplicate-cluster assignment from verified duplicate pairs:
    (doc_id, cluster_id, keep) where cluster_id is the minimum doc id of
    the connected component and ``keep`` marks the one document per
    cluster that survives dedup (the canonical minimum)."""
    cc = connected_components(pairs, src=src, dst=dst, max_iter=max_iter)
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("keep"),
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Simplified PageRank (dangling mass dropped) over a directed edge
    list, each iteration pure dataflow: rank/outdeg scatter along edges →
    per-destination sum → damped update r' = (1-d)/N + d·Σ contrib. The
    corpus-curation use is link-graph centrality as a document-quality
    prior (crawl frontiers and CommonCrawl-style filtering both rank by
    it).

    Scale shape: the edge list is the big table; each round shuffles it
    once keyed by ``src`` (join with the node-sized rank table —
    broadcastable while ranks fit, else shuffled hash join co-located by
    pre-partitioning edges on src) and once by ``dst`` for the sum.
    ``localCheckpoint`` truncates lineage so the plan doesn't grow with
    iterations. N is one driver-side scalar (J5 pattern).

    Returns (node, rank) for every node appearing as src or dst; rounds
    are deterministic, so a fixed ``n_iter`` unrolls to the SQL oracle."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t")).distinct()
    e = e.localCheckpoint(eager=True)  # computed once, reused every round
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("t").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    outdeg = e.groupBy("s").agg(F.count("*").alias("deg"))
    base = F.lit((1.0 - damping) / n)

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(n_iter):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "s"), "s")
            .join(outdeg, "s")
            .groupBy(F.col("t").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (base + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def triangle_counts(edges: DataFrame, src: str = "a", dst: str = "b") -> DataFrame:
    """Per-node triangle counts of the undirected simple graph ``edges``
    (self-loops and duplicate/reversed pairs tolerated), via
    degree-ordered edge orientation — the classic trick that bounds the
    wedge join: every edge is oriented from its (degree, id)-smaller
    endpoint to the larger, so each triangle is enumerated EXACTLY once
    (as the wedge at its smallest vertex closed by the third edge) and
    each vertex's oriented out-degree is O(√m) on any graph — the
    wedge-join volume is Σ outdeg² ≤ m^{3/2}, not Σ deg² (which a hub
    node makes quadratic).

    Returns (node, tri) for every node in ≥ 1 triangle. One join builds
    wedges, one semi-join closes them, one explode+aggregate distributes
    each triangle to its 3 corners."""
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
        # NOT cached, deliberately: und feeds degree AND orientation, but
        # the upstream derivation is a broadcast self-join that recomputes
        # faster than a 1M-row cache materializes + reads back (measured
        # 4.7 s uncached vs 7.0 s cached at sf0.1)
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    # orient by (deg, id): a -> b iff (deg_a, a) < (deg_b, b)
    d = (
        und.join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("e")
        )
        .select("e.u", "e.v")
    )
    # close wedges by adjacency-array intersection instead of
    # materializing the wedge join: per oriented edge (u, v), the common
    # out-neighborhood N⁺(u) ∩ N⁺(v) is exactly the triangle closers
    # {w : u<v<w} — computed in-JVM per edge, so the shuffle volume stays
    # at |edges| + |adjacency| instead of |wedges| (measured 40M wedge
    # rows → 11.4 s at sf0.1 with the join formulation; 2.4 s this way).
    # Orientation bounds every adjacency array at O(√m) elements.
    adj = d.groupBy("u").agg(F.sort_array(F.collect_list("v")).alias("nbrs"))
    tris = (
        d.join(adj.select(F.col("u"), F.col("nbrs").alias("nu")), "u")
        .join(
            adj.select(F.col("u").alias("v"), F.col("nbrs").alias("nv")), "v"
        )
        .withColumn("w", F.explode(F.array_intersect("nu", "nv")))
        .select("u", "v", "w")
    )
    return (
        tris.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("tri"))
    )


def two_hop_counts(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_mid_degree: int | None = None,
) -> DataFrame:
    """Per-node graph-expansion profile: degree and the count of DISTINCT
    nodes at distance exactly 2 (friends-of-friends that aren't already
    friends) — the reach metric behind contamination-spread and
    recommendation-candidate sizing. Symmetrized adjacency, one
    mid-node-keyed self-join, direct edges and self removed, distinct,
    count. Everything is exact set arithmetic — no rounding.

    Scale budget: wedge volume is Σ deg(mid)² — QUADRATIC in hub degree
    (measured: 5.9 s at sf0.01 → 54 s at sf0.1 on local[32]; the only
    super-linear operator in the contract, and inherently so — exact
    2-hop must enumerate every wedge). The production mitigation is
    ``max_mid_degree``: drop wedges whose MIDDLE node is a hub above the
    cap (each hop through a k-hub contributes k² wedges but its
    neighbors are usually reachable through lower-degree mids too; the
    standard friend-of-friend recommender cap). Capped results are a
    documented lower bound, so the exact (None) form stays the contract
    default."""
    adj = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        # adj feeds FOUR consumers (degree, both wedge sides, the
        # anti-join) — without materialization the upstream edge
        # derivation re-executes per consumer (4× at any scale)
    )
    adj = consistency_cache(adj)
    deg = adj.groupBy("u").agg(F.count("*").alias("n_one_hop"))
    mid = adj
    if max_mid_degree is not None:
        # fresh select + rename guards against shared-lineage attribute
        # collapse (deg derives from adj)
        keep = deg.filter(F.col("n_one_hop") <= max_mid_degree).select(
            F.col("u").alias("v")
        )
        mid = adj.join(F.broadcast(keep), "v", "left_semi")
    x, y = mid.alias("x"), adj.alias("y")
    # wedges stay NON-distinct through the anti-join: a standalone
    # distinct would add a full (u, w) exchange only to be followed by
    # another — countDistinct's partial-aggregate does the dedup inside
    # the one shuffle the count needs anyway
    wedges = (
        x.join(y, F.col("x.v") == F.col("y.u"))
        .filter(F.col("x.u") != F.col("y.v"))
        .select(F.col("x.u").alias("u"), F.col("y.v").alias("w"))
    )
    # the exclusion side is the EDGE list (tiny next to the Σ deg² wedge
    # stream) — broadcast it so the anti-join never shuffles the wedges;
    # the only wedge-volume exchange left is the final count's
    strict2 = wedges.join(
        F.broadcast(adj.select(F.col("u"), F.col("v").alias("w"))),
        ["u", "w"],
        "left_anti",
    )
    two = strict2.groupBy("u").agg(F.countDistinct("w").alias("n_two_hop"))
    return deg.join(two, "u", "left").select(
        F.col("u").alias("node"),
        "n_one_hop",
        F.coalesce("n_two_hop", F.lit(0)).alias("n_two_hop"),
    )


def label_propagation(
    edges: DataFrame,
    n_iter: int = 3,
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """Synchronous label propagation (community detection): every node
    starts labeled with its own id; each round it adopts the most common
    label among its neighbors, ties broken by the SMALLEST label — the
    deterministic variant of Raghavan et al.'s LPA (async+random LPA
    doesn't converge reproducibly, which would make the operator
    untestable). Fixed ``n_iter`` rounds, so the whole run is exactly
    replayable (the oracle unrolls the same rounds in SQL).

    Per round: one |edges|-volume join + one (node, label) aggregate +
    one argmax — linear in edges, the standard distributed LPA shape.
    The adjacency is cached across rounds."""
    adj = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    adj = consistency_cache(adj)
    labels = adj.select(F.col("u").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(n_iter):
        msgs = adj.join(
            labels.select(F.col("node").alias("v"), "label"), "v"
        ).select("u", "label")
        counts = msgs.groupBy("u", "label").agg(F.count("*").alias("cnt"))
        # min over (−cnt, label): highest count, then smallest label —
        # deterministic for any orderable label type
        labels = counts.groupBy("u").agg(
            F.expr("min_by(label, struct(-cnt, label))").alias("label")
        ).select(F.col("u").alias("node"), "label")
    return labels
