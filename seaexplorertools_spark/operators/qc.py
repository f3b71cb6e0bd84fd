"""QC masking operators — reference P3/P5 (SURVEY §2.2).

Reference ``remove_outliers`` (process_adcp.py:478-566, core :517-538):
per-beam, null-out velocity cells where correlation < threshold, amplitude >
threshold, or |velocity| > threshold; the masks are multiplied into the
velocity arrays (NaN-propagating) and the % of cells removed is reported.

Spark-first: a mask is a ``when(cond, NULL).otherwise(col)`` chain — pure
codegen expressions, no UDF, fully pushdown-friendly. The "% removed"
report is ``avg(cond.cast(int))`` — a cheap global aggregate the caller can
collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mask_where(value: Column | str, bad: Column) -> Column:
    """NULL where ``bad``, else ``value`` — the NaN-multiply idiom
    (reference :538 ``C * A * V`` mask product) as one expression."""
    v = F.col(value) if isinstance(value, str) else value
    return F.when(bad, F.lit(None).cast("double")).otherwise(v)


def qc_velocity(
    df: DataFrame,
    beams: list[int],
    corr_min: float,
    amp_max: float,
    vel_max: float,
    vel_fmt: str = "velocity_beam{b}",
    corr_fmt: str = "correlation_beam{b}",
    amp_fmt: str = "amplitude_beam{b}",
) -> DataFrame:
    """P3 — threshold-mask each beam's velocity (reference :517-538).

    A cell is bad when correlation < corr_min OR amplitude > amp_max OR
    |velocity| > vel_max; NULL comparisons are not 'bad' (NaN compares
    False in numpy, so NaN thresholds never newly mask — but the velocity
    itself staying NULL is preserved by the otherwise() branch).
    """
    out = df
    for b in beams:
        v, c, a = vel_fmt.format(b=b), corr_fmt.format(b=b), amp_fmt.format(b=b)
        bad = (
            (F.col(c) < F.lit(corr_min))
            | (F.col(a) > F.lit(amp_max))
            | (F.abs(F.col(v)) > F.lit(vel_max))
        )
        out = out.withColumn(v, mask_where(v, F.coalesce(bad, F.lit(False))))
    return out


def removed_fraction(df: DataFrame, before: str, after: Column) -> Column:
    """% of previously-finite cells removed by a mask (reference :540-547
    prints this per beam). Usage: ``df.agg(removed_fraction(...))``."""
    was = F.col(before).isNotNull()
    now = after.isNotNull()
    return (
        F.sum(F.when(was & ~now, 1).otherwise(0)).cast("double")
        / F.nullif(F.sum(was.cast("int")).cast("double"), F.lit(0.0))
    )
