"""Edit-distance (Levenshtein) similarity self-join — partition-based
candidate generation (PassJoin family, Li/Deng/Feng, PVLDB 2011 — public
algorithm), engine addition for typo-level near-dup detection where
set-based similarity (MinHash/SimHash over shingles, operators/dedup.py)
is the wrong granularity.

Why not all-pairs: levenshtein() is O(|s|·|t|) per pair; N² pairs is the
oracle's job, not the engine's. The pigeonhole partition scheme bounds
candidates instead: split every indexed string into k+1 contiguous
segments. If ed(s, t) ≤ k with |s| ≤ |t|, the optimal edit script spends
at most k errors across s's k+1 segments, so SOME segment is error-free —
it occurs in t verbatim, displaced from its home position by at most the
net insertions/deletions before it, i.e. by ≤ k. Probing every substring
of t whose (length-scheme, segment, position-window) could host such a
segment is therefore LOSSLESS: every true pair shares at least one
(L, i, substring) join key. Candidates are verified with Spark's banded
`levenshtein(…, threshold)` (early-exit DP), so false candidates cost
O(k·len), not O(len²).

Scale shape: per string, index emits k+1 keys and probe emits at most
(k+1)²·(2k+1) keys (225 at k=4) — constants in k, independent of N; join
keys are (length, segment, xxhash64(substring)) so shuffle width is ~20
bytes/key regardless of segment length (hash collisions only ADD
candidates; the exact verify removes them). The join itself is a hash
equi-join on fine-grained keys — no N² stage anywhere. Keep k small
(1-2) at 100 TB: probe fan-out grows as k³.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scheme(L: Column, i: int, k: int) -> tuple[Column, Column]:
    """(start0based, length) of segment ``i`` in the k+1-segment partition
    scheme of a string of length ``L``: the first (k+1 − L mod (k+1))
    segments take ⌊L/(k+1)⌋ chars, the rest one more — identical on both
    the index and probe side, which is all the pigeonhole needs."""
    n = k + 1
    b = F.floor(L / n).cast("int")
    short = F.lit(n) - (L % n).cast("int")  # count of short segments
    seg_len = b + F.when(F.lit(i) >= short, F.lit(1)).otherwise(F.lit(0))
    start = F.lit(i) * b + F.greatest(F.lit(0), F.lit(i) - short)
    return start, seg_len


def edit_distance_join(
    df: DataFrame, id_col: str, str_col: str, max_dist: int
) -> DataFrame:
    """All pairs (id_a < id_b) with levenshtein(s_a, s_b) ≤ ``max_dist``,
    exact, without an N² stage. Returns (id_a, id_b, dist)."""
    k = int(max_dist)
    ident = F.col(id_col)
    s = F.col(str_col)
    m = F.length(s)
    base = df.select(ident.alias("__id"), s.alias("__s")).filter(
        F.length("__s") > k
    )

    # index side: the k+1 segments of each string, keyed by its own length
    segs = []
    for i in range(k + 1):
        p, l = _scheme(F.col("__m"), i, k)
        segs.append(F.struct(F.lit(i).alias("i"), p.alias("p"), l.alias("ln")))
    idx = (
        base.withColumn("__m", F.length("__s"))
        .select(
            "__id",
            "__s",
            F.col("__m").alias("L"),
            F.explode(F.array(*segs)).alias("g"),
        )
        .select(
            F.col("__id").alias("id_a"),
            "L",
            F.col("g.i").alias("i"),
            F.xxhash64(
                F.col("__s").substr(F.col("g.p") + 1, F.col("g.ln"))
            ).alias("h"),
        )
    )

    # probe side: for every candidate indexed length L = |t| − d (the
    # indexed string is the shorter one) and every segment of scheme(L),
    # the substrings of t at the scheme position ± k
    probes = []
    for d in range(k + 1):
        Lc = F.col("__m") - d
        for i in range(k + 1):
            p, l = _scheme(Lc, i, k)
            for shift in range(-k, k + 1):
                probes.append(
                    F.struct(
                        Lc.alias("L"),
                        F.lit(i).alias("i"),
                        (p + shift).alias("p"),
                        l.alias("ln"),
                    )
                )
    prb = (
        base.withColumn("__m", F.length("__s"))
        .select("__id", "__s", "__m", F.explode(F.array(*probes)).alias("g"))
        .filter(
            (F.col("g.L") > k)
            & (F.col("g.p") >= 0)
            & (F.col("g.p") + F.col("g.ln") <= F.col("__m"))
        )
        .select(
            F.col("__id").alias("id_b"),
            F.col("g.L").alias("L"),
            F.col("g.i").alias("i"),
            F.xxhash64(
                F.col("__s").substr(F.col("g.p") + 1, F.col("g.ln"))
            ).alias("h"),
        )
    )

    cand = (
        idx.join(prb, ["L", "i", "h"])
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .distinct()
    )

    left = base.select(F.col("__id").alias("id_a"), F.col("__s").alias("__sa"))
    right = base.select(F.col("__id").alias("id_b"), F.col("__s").alias("__sb"))
    return (
        cand.join(left, "id_a")
        .join(right, "id_b")
        .withColumn("dist", F.levenshtein("__sa", "__sb", k))
        .filter(F.col("dist") >= 0)
        .select("id_a", "id_b", "dist")
    )
