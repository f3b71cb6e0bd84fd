"""Arrow grouped-aggregate pandas UDFs (SURVEY §2.9 surface).

The one Python-UDF shape the engine had not yet exercised: a
``pandas_udf`` whose signature is ``Series -> scalar``, used directly in
``groupBy().agg()`` (Spark's GROUPED_AGG / "pandas UDAF"). The whole
group's column arrives as ONE Arrow-backed Series per group — so this is
the right boundary for order-statistics aggregates that have no
sufficient-statistic decomposition (trimmed mean, interquartile mean),
and the WRONG one for anything expressible as sums/counts (those belong
in JVM aggregates, which combine map-side; a grouped-agg UDF always
ships the group's full column).

Scale posture: shuffle volume is the value column keyed by group — same
as any exact order-statistic — and per-group memory is the group's
column; for groups too large for that, the approx_percentile-based
winsorized mean in ``operators/stats.py`` is the declared swap.

Determinism: trimming drops the k = floor(n·trim) smallest and largest
VALUES; duplicates are interchangeable under any tie order, so the kept
multiset — and hence the mean — is partition-order-independent. The
pandas sum and an engine's aggregate may associate differently at the
1e-16 level; consumers round (the contract query rounds to 6 dp).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def trimmed_mean_udf(trim: float = 0.1) -> Column:
    """GROUPED_AGG pandas UDF factory: mean after dropping the
    floor(n·trim) smallest and largest non-null values from each end.
    Groups that trim away entirely (n ≤ 2·k... impossible: k ≤ n·trim
    < n/2 for trim < 0.5) always keep ≥ 1 value; all-null groups return
    NaN → NULL."""
    if not 0.0 <= trim < 0.5:
        raise ValueError(f"trim must be in [0, 0.5), got {trim}")

    @F.pandas_udf("double")
    def _trimmed(v: pd.Series) -> float:
        s = v.dropna().sort_values(kind="mergesort")
        n = len(s)
        if n == 0:
            return float("nan")
        k = int(n * trim)
        return float(s.iloc[k : n - k].mean())

    return _trimmed


def group_trimmed_means(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    trim: float = 0.1,
    out_col: str = "trimmed_mean",
) -> DataFrame:
    """Per-group trimmed mean via the GROUPED_AGG Arrow boundary."""
    udf = trimmed_mean_udf(trim)
    return df.groupBy(*group_cols).agg(udf(F.col(value_col)).alias(out_col))
