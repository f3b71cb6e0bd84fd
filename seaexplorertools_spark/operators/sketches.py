"""Mergeable distinct-count sketches with engine-portable determinism.

Spark ships HLL sketches (``hll_sketch_agg`` — tested in
``tests/test_sketches.py``), but those binary sketches are
implementation-defined, so they can't be oracle-verified across engines.
The sketches here are fully deterministic given the hash function — md5
onto 48 bits, an idiom both Spark and DuckDB compute identically — so even
the APPROXIMATE estimators get exact cross-engine oracles: K-Minimum-Values
(``kmv_distinct``), Count-Min (``countmin_table``), and a from-scratch
HyperLogLog (``hll_registers``/``hll_estimate``/``hll_merge``).

KMV keeps the K smallest distinct hashes and estimates

    distinct ≈ (K - 1) / (h_K / 2^48)        (Beyer et al., PODS 2007)

falling back to the exact count when fewer than K distinct hashes exist.

Scale posture: the distinct-of-hashes is a map-side-combined aggregate and
the K smallest survive a distributed TakeOrdered (per-group: one window
pass over at most the distinct hashes); no value list ever concentrates on
the driver. KMV sketches of shards merge by unioning hash sets and
re-taking the K minimum — the shard-merge law is tested in
``tests/test_sketches.py``.

Reference parity: the reference counts distinct days driver-side with
``np.unique`` (process_adcp.py:1246-1252 — SURVEY A6); KMV is the
bounded-memory scale path for the same question at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

HASH_BITS = 48
HASH_SPACE = float(1 << HASH_BITS)


def uniform_hash48(col: Column) -> Column:
    """Deterministic uniform hash onto [0, 2^48): first 12 hex chars of
    md5(value::string). DuckDB twin: ``('0x' || substr(md5(x::VARCHAR), 1,
    12))::BIGINT`` — byte-identical, so oracle checks are exact."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 12), 16, 10).cast("bigint")


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct estimate: ``(group_cols..., n_kept, kth_hash,
    est_distinct)``.

    One shuffle on (group, hash) for the distinct, one window pass for the
    K smallest per group. ``est_distinct`` is the exact distinct count when
    a group has < K distinct values (n_kept < k), else the KMV estimator —
    both branches deterministic, so the whole result is oracle-exact.
    """
    gcols = group_cols or []
    hashes = (
        df.where(F.col(value_col).isNotNull())
        .select(*gcols, uniform_hash48(F.col(value_col)).alias("h"))
        .distinct()
    )
    w = Window.partitionBy(*[F.col(c) for c in gcols]).orderBy("h")
    kept = hashes.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    est = (
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise((F.lit(float(k - 1)) * F.lit(HASH_SPACE)) / F.col("kth_hash"))
    )
    return (
        kept.groupBy(*gcols)
        .agg(F.count("*").alias("n_kept"), F.max("h").alias("kth_hash"))
        .withColumn("est_distinct", F.round(est, 6))
    )


def countmin_table(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-Min sketch table: ``(r, c, cnt)`` counters, ``depth`` hash
    rows × ``width`` columns. Row r's column for a value is
    ``hash48(r || ':' || value) % width`` — the same md5 idiom as KMV, so
    a DuckDB oracle rebuilds the identical table. The sketch is
    ``depth × width`` counters regardless of stream size, and two
    sketches merge by adding counters (linear).

    Built VALUE-COUNTS-FIRST: one aggregate collapses the stream to
    (value, weight), then only |distinct values| × depth rows pass
    through md5 — 2× faster than hashing the raw stream ×depth at sf0.1
    (2.54 s → 1.13 s) and the counter table is bit-identical (a cell is
    the sum of its values' counts either way)."""
    counts = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("__v"))
        .agg(F.count("*").alias("__w"))
    )
    rows = F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("r")
    e = counts.select("__v", "__w", rows)
    c = F.pmod(
        uniform_hash48(F.concat(F.col("r").cast("string"), F.lit(":"), F.col("__v").cast("string"))),
        F.lit(width),
    )
    return e.select("r", c.alias("c"), "__w").groupBy("r", "c").agg(
        F.sum("__w").alias("cnt")
    )


def countmin_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-estimate counts for ``items`` from a CMS table: min over the
    depth rows of the addressed counters (the classic upward-biased
    estimate). The sketch side is depth×width rows — a broadcast — so
    estimation is a map-side join however many items are probed."""
    rows = F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("r")
    probes = items.select(F.col(item_col).alias("__item"), rows)
    c = F.pmod(
        uniform_hash48(
            F.concat(F.col("r").cast("string"), F.lit(":"), F.col("__item").cast("string"))
        ),
        F.lit(width),
    )
    return (
        probes.withColumn("c", c)
        .join(F.broadcast(sketch), ["r", "c"], "left")
        .groupBy(F.col("__item").alias(item_col))
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = 8,
) -> DataFrame:
    """HyperLogLog register table: ``(group_cols..., idx, m_rho)``.

    The 48-bit md5 hash splits into a ``p``-bit register index (top bits)
    and a ``48-p``-bit suffix ``w``; ``rho = (48-p) + 1 - bitlength(w)``
    (leading-zero count + 1, the Flajolet et al. 2007 observable) and each
    register keeps the max. Unlike Spark's built-in ``hll_sketch_agg``
    (implementation-defined binary sketches), every step here is an
    engine-portable expression — bitlength is ``length(conv(w, 10, 2))`` in
    Spark and ``length(bin(w))`` in DuckDB — so the register table and the
    estimate are EXACTLY reproducible by the SQL oracle.

    Scale posture: one map-side-combined max-aggregate; the sketch is at
    most ``2^p`` rows per group no matter the input size, and shard
    sketches merge by elementwise register max (``hll_merge``)."""
    gcols = group_cols or []
    wbits = HASH_BITS - p
    h = uniform_hash48(F.col(value_col))
    idx = F.shiftright(h, wbits)
    w = F.pmod(h, F.lit(1 << wbits))
    # rho = wbits+1 - bitlength(w); bitlength as a descending CASE over
    # integer thresholds instead of conv-to-binary-string + length (the
    # per-row string round-trip dominated at high row volume; the
    # integers are identical, so the DuckDB oracle's length(bin(w)) twin
    # is unchanged). The hash is STAGED into its own projection first —
    # CASE references the cheap column `__w` wbits times, never the
    # md5 chain (the txt_quality expression-duplication lesson).
    staged = df.where(F.col(value_col).isNotNull()).select(
        *gcols, idx.alias("idx"), w.alias("__w")
    )
    bitlen = F.lit(1)
    for k in range(2, wbits + 1):  # w >= 2^(k-1) => bitlength k; highest
        bitlen = F.when(F.col("__w") >= F.lit(1 << (k - 1)), F.lit(k)).otherwise(bitlen)
    # threshold wraps LAST, so it is checked first
    rho = F.when(F.col("__w") == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - bitlen
    )
    return (
        staged.select(*gcols, "idx", rho.alias("rho"))
        .groupBy(*gcols, "idx")
        .agg(F.max("rho").alias("m_rho"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str] | None = None,
    p: int = 8,
) -> DataFrame:
    """HLL estimate from a register table: ``(group_cols..., n_zero_regs,
    est_distinct)``.

    raw = alpha_m * m^2 / sum_j 2^(-M_j) with absent registers counting
    2^0 = 1; the small-range (linear counting) correction ``m*ln(m/V)``
    applies when raw <= 2.5m and V (zero registers) > 0 — the classic
    Flajolet regime split. Every 2^(-M_j) term is an exact power of two
    and the terms span < 52 bits, so the sum is EXACT in IEEE double and
    order-independent — safe under Spark's parallel aggregation and
    identical in DuckDB; rounding to 2 decimals absorbs any last-ulp
    ``ln`` divergence in the linear-counting branch."""
    gcols = group_cols or []
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    stats = registers.groupBy(*gcols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m_rho"))).alias("s_nz"),
        F.count("*").alias("nz"),
    )
    zeros = F.lit(m) - F.col("nz")
    raw = F.lit(alpha * m * m) / (F.col("s_nz") + zeros.cast("double"))
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return stats.select(
        *gcols,
        zeros.cast("bigint").alias("n_zero_regs"),
        F.round(est, 2).alias("est_distinct"),
    )


def hll_merge(
    shard_registers: DataFrame, group_cols: list[str] | None = None, p: int = 8
) -> DataFrame:
    """Merge per-shard HLL register tables into one per group — elementwise
    register max, the HLL merge law. Max is idempotent/commutative/
    associative, so sketch-of-union == merge-of-sketches exactly (tested in
    ``tests/test_sketches.py``); this is what makes HLL a partial aggregate
    that never moves raw values between shards at 100 TB."""
    gcols = group_cols or []
    return shard_registers.groupBy(*gcols, "idx").agg(F.max("m_rho").alias("m_rho"))


def kmv_merge(shard_sketches: DataFrame, group_cols: list[str], k: int = 64) -> DataFrame:
    """Merge per-shard KMV hash sets (rows of (group..., h)) into one sketch
    per group — union distinct then re-take the K minimum. Used by the
    shard-merge law test; the algebra is what makes KMV usable as a
    partial aggregate at 100 TB."""
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("h")
    kept = shard_sketches.distinct().withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    est = (
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise((F.lit(float(k - 1)) * F.lit(HASH_SPACE)) / F.col("kth_hash"))
    )
    return (
        kept.groupBy(*group_cols)
        .agg(F.count("*").alias("n_kept"), F.max("h").alias("kth_hash"))
        .withColumn("est_distinct", F.round(est, 6))
    )


def quantile_sketch(
    df: DataFrame,
    id_col: str,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 128,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Deterministic mergeable quantile sketch via bottom-k hashing: keep
    the k rows with the SMALLEST md5-derived hash of the row id (a
    uniform row sample that any two shards agree on), estimate quantiles
    by exact interpolation over the sample. Error is the usual sampling
    bound ~1/√k per quantile; k trades memory for accuracy.

    Why this sketch when Spark has approx_percentile: bottom-k is (1)
    DETERMINISTIC — the same rows win on any partitioning, so results are
    reproducible run-to-run and exactly oracle-checkable; (2) mergeable
    by construction — bottom-k of a union is the bottom-k of the
    concatenated per-shard bottom-k sets (the KMV law), so shard sketches
    combine without bias; (3) engine-portable — nothing in it is
    Spark-specific. At scale the per-group top-k should be pre-pruned
    with the threshold trick (see sampling.py::reservoir_per_group);
    the window here IS that formulation's exact baseline."""
    gs = list(group_cols or [])
    h = uniform_hash48(F.col(id_col))
    w = Window.partitionBy(*gs).orderBy("h", id_col)
    s = (
        df.select(*gs, id_col, value_col, h.alias("h"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
    aggs = [
        F.expr(f"percentile({value_col}, {q})").alias(f"q_{int(round(q * 100))}")
        for q in qs
    ]
    aggs.append(F.count("*").alias("sample_n"))
    return s.groupBy(*gs).agg(*aggs)
