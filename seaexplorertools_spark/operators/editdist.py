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


def _scheme(L: Column, i: Column, k: int) -> tuple[Column, Column]:
    """(start0based, length) of segment ``i`` in the k+1-segment partition
    scheme of a string of length ``L``: the first (k+1 − L mod (k+1))
    segments take ⌊L/(k+1)⌋ chars, the rest one more — identical on both
    the index and probe side, which is all the pigeonhole needs."""
    n = k + 1
    b = F.floor(L / n).cast("int")
    short = F.lit(n) - (L % n).cast("int")  # count of short segments
    seg_len = b + F.when(i >= short, F.lit(1)).otherwise(F.lit(0))
    start = i * b + F.greatest(F.lit(0), i - short)
    return start, seg_len


def _tiny_range(lo: int, hi: int) -> Column:
    """Literal int array [lo, hi] — exploded instead of materializing one
    giant per-combination struct array: a 225-element array constructor
    of nested arithmetic blows past whole-stage-codegen's method-size
    budget and drops the whole stage to interpreted eval (~6× slower
    measured); three chained explodes of tiny arrays with the arithmetic
    applied AFTER the explode keep every expression codegen-sized."""
    return F.array(*[F.lit(v) for v in range(lo, hi + 1)])


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
    ip, il = _scheme(F.col("__m"), F.col("i"), k)
    idx = (
        base.withColumn("__m", F.length("__s"))
        .withColumn("i", F.explode(_tiny_range(0, k)))
        .select(
            F.col("__id").alias("id_a"),
            F.col("__m").alias("L"),
            "i",
            F.xxhash64(F.col("__s").substr(ip + 1, il)).alias("h"),
        )
    )

    # probe side: for every candidate indexed length L = |t| − d (the
    # indexed string is the shorter one) and every segment of scheme(L),
    # the substrings of t at the scheme position ± k
    Lc = F.col("__m") - F.col("d")
    pp, pl = _scheme(Lc, F.col("i"), k)
    pos = pp + F.col("sh")
    prb = (
        base.withColumn("__m", F.length("__s"))
        .withColumn("d", F.explode(_tiny_range(0, k)))
        .filter(Lc > k)
        .withColumn("i", F.explode(_tiny_range(0, k)))
        .withColumn("sh", F.explode(_tiny_range(-k, k)))
        .filter((pos >= 0) & (pos + pl <= F.col("__m")))
        .select(
            F.col("__id").alias("id_b"),
            Lc.alias("L"),
            "i",
            F.xxhash64(F.col("__s").substr(pos + 1, pl)).alias("h"),
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
