"""Declarative data-quality checks (the dbt-tests / Deequ shape): each
check compiles to a Column predicate or an aggregate, and ALL checks on a
table run in ONE pass — a single map-side-combined aggregate emitting one
row per check with its violation count.

Why one pass matters at 100 TB: N separate `df.filter(...).count()`
actions scan the table N times; compiling every check into conditional
sums makes the whole suite cost one scan. Referential checks are the
exception (they need the dim side) and run as broadcast anti-join counts.

The reference validates implicitly (QC masks, SURVEY P3-P7); this module
is the engine's explicit contract surface for pipeline inputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..caching import consistency_cache


def not_null(col: str) -> tuple[str, Column]:
    return (f"not_null:{col}", F.col(col).isNull())


def accepted_values(col: str, values: list) -> tuple[str, Column]:
    return (f"accepted_values:{col}", ~F.col(col).isin(values) | F.col(col).isNull())


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    return (f"in_range:{col}", ~F.col(col).between(lo, hi) | F.col(col).isNull())


def matches(col: str, pattern: str) -> tuple[str, Column]:
    return (f"matches:{col}", ~F.col(col).rlike(pattern) | F.col(col).isNull())


def run_checks(df: DataFrame, checks: list[tuple[str, Column]]) -> DataFrame:
    """One-pass check suite: returns (check, n_violations) — one aggregate,
    one row per check, conditional-sum partials combined map-side."""
    aggs = [
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(name)
        for name, pred in checks
    ]
    wide = df.agg(*aggs)
    names = [name for name, _ in checks]
    pairs = ", ".join(f"'{n}', `{n}`" for n in names)
    return wide.selectExpr(f"stack({len(names)}, {pairs}) as (`check`, n_violations)")


def unique_check(df: DataFrame, cols: list[str]) -> DataFrame:
    """(check, n_violations) where violations = rows beyond the first per
    duplicated key — groupBy + sum(cnt-1), one shuffle keyed by the
    candidate key."""
    name = "unique:" + ",".join(cols)
    dup = (
        df.groupBy(*cols)
        .agg(F.count("*").alias("__n"))
        .agg(F.sum(F.col("__n") - F.lit(1)).cast("long").alias("n_violations"))
    )
    return dup.select(F.lit(name).alias("check"), "n_violations")


def referential_check(
    fact: DataFrame, fk: str, dim: DataFrame, pk: str
) -> DataFrame:
    """(check, n_violations) where violations = fact rows whose fk has no
    dim match — broadcast left-anti join count (dims are the small side
    by construction)."""
    name = f"referential:{fk}->{pk}"
    n = (
        fact.where(F.col(fk).isNotNull())
        .join(F.broadcast(dim.select(pk)), fact[fk] == dim[pk], "left_anti")
        .agg(F.count("*").cast("long").alias("n_violations"))
    )
    return n.select(F.lit(name).alias("check"), "n_violations")


def observed_checks(df: DataFrame, checks: list[tuple[str, Column]], name: str = "dq"):
    """Attach the check suite as ``df.observe`` metrics: violation counts
    are accumulated DURING whatever job next materializes ``df`` — zero
    extra scans, zero extra shuffles (the at-scale way to monitor a
    production write: the sink job itself reports quality). Returns
    ``(df, observation)``; read ``observation.get`` after an action."""
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(cname)
        for cname, pred in checks
    ]
    return df.observe(obs, *metrics), obs


def benford_audit(df: DataFrame, col: str) -> DataFrame:
    """Benford's-law first-digit audit of a positive numeric column — the
    classic fabricated-data detector (natural multiplicative quantities
    follow P(d) = log10(1 + 1/d); uniform or hand-typed data doesn't).
    One conditional aggregate over the rows; expected probabilities are
    literals. Output per digit 1-9: observed count, observed share,
    Benford share, and the chi-squared contribution. The digit is taken
    from the string form of floor(x) — explicit floor because
    double→BIGINT CAST semantics differ across engines (truncate vs
    round-half-even); rows below 1 have no integer first digit and are
    excluded."""
    d = F.substring(F.floor(F.col(col)).cast("bigint").cast("string"), 1, 1).cast(
        "int"
    )
    obs = (
        df.filter(F.col(col) >= 1)
        .select(d.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("obs"))
    )
    obs = consistency_cache(obs)  # ≤ 9 rows: total aggregate + output
    tot = obs.agg(F.sum("obs").alias("__t")).withColumn("__k", F.lit(1))
    obs = obs.withColumn("__k", F.lit(1)).join(F.broadcast(tot), "__k")
    n = F.col("__t").cast("double")
    exp_p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    exp_n = exp_p * n
    return obs.select(
        "digit",
        "obs",
        (F.col("obs").cast("double") / n).alias("obs_p"),
        exp_p.alias("benford_p"),
        (
            (F.col("obs").cast("double") - exp_n)
            * (F.col("obs").cast("double") - exp_n)
            / exp_n
        ).alias("chi2_contrib"),
    )
