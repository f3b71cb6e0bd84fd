"""Skew-safe aggregation — salting for hot keys (engine scale utility).

At 100 TB a handful of hot keys (one glider mission, one user, one band
bucket) can stall a groupBy on a single reducer. AQE's skew handling covers
joins; for aggregations the classic fix is two-phase salted aggregation:

    phase 1: groupBy(key, salt = pmod(hash(row-id-ish), n))  — partial
    phase 2: groupBy(key)                                    — merge

Works for any algebraic aggregate (sum/count/min/max; avg = sum+count).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value: str | Column,
    n_salts: int = 32,
    salt_from: str | Column | None = None,
    sum_name: str = "sum_v",
    count_name: str = "n",
) -> DataFrame:
    """Two-phase salted sum/count per key. ``salt_from`` (any well-spread
    column, e.g. a row id) feeds the salt; default uses spark_partition_id
    + monotonically_increasing_id, which is deterministic per physical row
    but not across re-partitions — pass an explicit column for reproducible
    plans."""
    v = F.col(value) if isinstance(value, str) else value
    if salt_from is None:
        salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    else:
        s = F.col(salt_from) if isinstance(salt_from, str) else salt_from
        salt = F.pmod(F.hash(s), F.lit(n_salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(F.sum(v).alias("__s"), F.count(v).alias("__c"))
    )
    return partial.groupBy(*keys).agg(
        F.sum("__s").alias(sum_name), F.sum("__c").alias(count_name)
    )


def salted_join(
    big: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salts: int = 16,
    salt_from: str | Column = "",
) -> DataFrame:
    """Skew-safe replicate-fragment equi-join: the big (probe) side gets a
    deterministic salt from a well-spread column; the dim (build) side is
    replicated once per salt value; the join key becomes (key..., salt) so
    a hot key's rows spread across ``n_salts`` reducers instead of stalling
    one. Use when the dim side is too large to broadcast AND the key
    distribution is hot (few distinct values / power-law keys) — the
    replication cost is |dim| x n_salts, so keep n_salts modest. Result is
    identical to ``big.join(dim, on)`` (the oracle checks exactly that)."""
    s = F.col(salt_from) if isinstance(salt_from, str) else salt_from
    big2 = big.withColumn("__salt", F.pmod(F.hash(s), F.lit(n_salts)))
    dim2 = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big2.join(dim2, [*on, "__salt"]).drop("__salt")
