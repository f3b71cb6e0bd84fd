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
