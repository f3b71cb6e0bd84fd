"""Distribution audits for corpus curation — chi-squared independence of
two categorical columns, and KL divergence of per-group distributions
from the corpus-wide distribution (drift detection). Textbook statistics,
engine additions a 100 TB pipeline runs before/after every filter to see
what the filter did to the data mix.

Scale shape: everything reduces to ONE category-cardinality aggregate;
margins and totals come from windows over that tiny cell table (no
second scan, no row-level re-shuffle)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def contingency_chi2(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Per-cell observed/expected counts and chi-squared contributions
    for the a×b contingency table. One aggregate over the rows; margins
    via windows on the |a|·|b|-row cell table."""
    cells = df.groupBy(a_col, b_col).agg(F.count("*").alias("obs"))
    wa = Window.partitionBy(a_col)
    wb = Window.partitionBy(b_col)
    wn = Window.partitionBy()
    # margins cast to double BEFORE multiplying: the product is then the
    # same IEEE value any engine computes (counts < 2^53 are exact), so
    # results are bit-identical cross-engine with no rounding step
    exp = (
        F.sum("obs").over(wa).cast("double")
        * F.sum("obs").over(wb).cast("double")
        / F.sum("obs").over(wn).cast("double")
    )
    return cells.select(
        a_col,
        b_col,
        "obs",
        exp.alias("expected"),
        ((F.col("obs") - exp) * (F.col("obs") - exp) / exp).alias("contrib"),
    )


def kl_from_global(df: DataFrame, group_col: str, cat_col: str) -> DataFrame:
    """KL(P_group ‖ P_global) over the categorical column, one row per
    group — how far each slice's category mix drifts from the corpus.
    Categories absent from a group contribute 0 (0·ln 0 limit); the
    global distribution has full support by construction, so the
    divergence is always finite."""
    cells = df.groupBy(group_col, cat_col).agg(F.count("*").alias("n"))
    n_grp = F.sum("n").over(Window.partitionBy(group_col))
    n_cat = F.sum("n").over(Window.partitionBy(cat_col))
    n_all = F.sum("n").over(Window.partitionBy())
    p = F.col("n") / n_grp
    q = n_cat / n_all
    return (
        cells.select(group_col, (p * F.log(p / q)).alias("term"))
        .groupBy(group_col)
        .agg(F.sum("term").alias("kl"))
    )
