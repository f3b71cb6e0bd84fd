"""Deterministic sampling for training-data pipelines (engine addition).

Hash-threshold sampling: u(key) = md5(key)[:8] as uint32 / 2³² gives every
row a stable uniform [0, 1) draw derived only from its key — so samples
are reproducible across runs, clusters, and engines (the DuckDB oracle
computes the identical value), composable (nested samples of increasing
fraction are supersets), and embarrassingly parallel (a map-side filter:
no shuffle, no RNG state, no seed coordination across executors — the
property that matters at 100 TB, where `df.sample()`'s per-partition RNG
is neither stable under repartitioning nor reproducible across engines).

Stratified variant: per-stratum fractions (e.g. rebalance languages in a
corpus) via one map-literal lookup — still a pure map-side filter.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_uniform(key: Column, salt: str = "") -> Column:
    """Stable uniform [0, 1) draw from a key: first 8 md5 hex chars as
    uint32 over 2³². Exact in double (uint32 < 2⁵³); portable to any engine
    with md5. ``salt`` decorrelates independent sampling decisions made
    from the same key (e.g. train/val/test splits)."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(4294967296.0)


def sample_fraction(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically by key."""
    return df.filter(hash_uniform(F.col(key_col), salt) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum hash-threshold sampling: stratum → fraction, unlisted
    strata get ``default``. One map-side filter, no shuffle."""
    frac_map = F.create_map(
        *chain.from_iterable(
            (F.lit(k), F.lit(float(v))) for k, v in sorted(fractions.items())
        )
    )
    thr = F.coalesce(frac_map.getItem(F.col(strata_col)), F.lit(float(default)))
    return df.filter(hash_uniform(F.col(key_col), salt) < thr)
