"""Privacy audits for training-data release — k-anonymity over
quasi-identifier (QI) combinations (public Sweeney/Samarati model).
Engine addition: a 100 TB corpus release needs to know which metadata
combinations single users out, before export.

Shapes chosen for scale: group sizes live in aggregates whose
cardinality is the QI domain (small), never the row count, and flow back
to rows via broadcast joins — no row-level shuffle beyond the aggregate
itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def qi_risk_profile(df: DataFrame, qi_cols: list[str]) -> DataFrame:
    """Per-QI-combination equivalence-class size and risk flags: a class
    of size < k pins its members to a small crowd; size 1 is a unique
    re-identification. One aggregate, cardinality = |QI domain|."""
    return df.groupBy(*qi_cols).agg(
        F.count("*").alias("class_size"),
        (F.count("*") == 1).cast("int").alias("unique_row"),
    )


def k_anonymity_levels(
    df: DataFrame, ladder: list[list[str]], k: int
) -> DataFrame:
    """Assign every row the FIRST generalization level at which its
    equivalence class reaches size ≥ k. ``ladder`` lists QI column sets
    from most specific to most general (each a subset view of the same
    attributes, e.g. [[region, segment], [region], []]); the final
    implicit level (all rows, one class) always satisfies any k ≤ N, so
    ``anon_level`` = len(ladder) means "only safe fully generalized".

    Every level is one aggregate over its QI set joined back broadcast;
    class sizes are computed once, not per row."""
    out = df
    safe = F.lit(None).cast("int")
    for lvl, cols in enumerate(ladder):
        if cols:
            sizes = df.groupBy(*cols).agg(F.count("*").alias(f"__n{lvl}"))
            out = out.join(F.broadcast(sizes), cols)
            n = F.col(f"__n{lvl}")
        else:
            total = df.count()
            n = F.lit(int(total))
        safe = F.coalesce(
            safe, F.when(n >= k, F.lit(lvl))
        )
    out = out.withColumn("anon_level", F.coalesce(safe, F.lit(len(ladder))))
    return out.drop(*[c for c in out.columns if c.startswith("__n")])


def l_diversity_audit(
    df: DataFrame, qi_cols: list[str], sensitive_col: str
) -> DataFrame:
    """Per-equivalence-class l-diversity (Machanavajjhala et al., ICDE
    '06): a class that is k-anonymous can still leak the sensitive value
    if everyone in it SHARES that value. Reports, per QI class: size,
    distinct sensitive values (the l), the majority sensitive share, and
    the entropy of the sensitive mix (entropy l-diversity requires
    H ≥ ln l). One aggregate to the (QI × sensitive)-cardinality cell
    table; everything else is windows over it — never row volume."""
    from pyspark.sql.window import Window

    cells = df.groupBy(*qi_cols, sensitive_col).agg(F.count("*").alias("n"))
    wq = Window.partitionBy(*qi_cols)
    size = F.sum("n").over(wq)
    p = F.col("n").cast("double") / size.cast("double")
    per = cells.select(
        *qi_cols,
        size.alias("class_size"),
        F.count("*").over(wq).alias("l_distinct"),
        F.max(F.col("n")).over(wq).alias("max_n"),
        (-p * F.log(p)).alias("h_term"),
    )
    return per.groupBy(*qi_cols, "class_size", "l_distinct", "max_n").agg(
        F.sum("h_term").alias("sens_entropy")
    ).select(
        *qi_cols,
        "class_size",
        "l_distinct",
        (F.col("max_n").cast("double") / F.col("class_size").cast("double")).alias(
            "majority_share"
        ),
        "sens_entropy",
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    salt: str = "dp",
    clamp_nonneg: bool = True,
) -> DataFrame:
    """Laplace-mechanism noisy counts (sensitivity 1 per group) with the
    noise DERIVED DETERMINISTICALLY from a salted md5 of the group key:
    u ~ Uniform(−1/2, 1/2) from the hash, noise = −(1/ε)·sgn(u)·ln(1−2|u|)
    (the standard inverse-CDF Laplace transform). Deterministic noise
    makes the mechanism exactly oracle-checkable and reproducible across
    engines/runs — which is the right property for TESTING the release
    pipeline's plumbing (scale of noise vs ε, clamping, post-processing).
    A production release MUST swap the hash for a secure RNG: noise that
    an adversary can recompute provides NO differential privacy — this is
    the mechanism's shape, deterministically replayable, not a DP
    guarantee."""
    from .sketches import HASH_SPACE, uniform_hash48

    key = F.concat_ws("\x1f", F.lit(salt), *[F.col(c).cast("string") for c in group_cols])
    counts = df.groupBy(*group_cols).agg(F.count("*").alias("true_n"))
    # +0.5 centers the integer hash into (0, 2^48) so u never hits −1/2
    # exactly (ln(0) guard)
    u = (uniform_hash48(key).cast("double") + F.lit(0.5)) / F.lit(
        HASH_SPACE
    ) - F.lit(0.5)
    mag = -F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u)) / F.lit(float(epsilon))
    noise = F.signum(u) * mag
    noisy = F.col("true_n").cast("double") + noise
    if clamp_nonneg:
        noisy = F.greatest(noisy, F.lit(0.0))
    return counts.select(*group_cols, "true_n", noisy.alias("noisy_n"))
