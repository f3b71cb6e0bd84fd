"""Explicit Bloom-filter semi-join reduction.

The single most important join optimization at 100 TB is not executing the
join at all for rows that cannot match: build a compact bitmap over the
small side's keys, broadcast it, and drop non-matching fact rows at the
scan — before the shuffle. Spark's AQE injects a runtime bloom filter in
some shapes (``spark.sql.optimizer.runtime.bloomFilter.enabled``); this
operator makes the reduction explicit, deterministic, and available to any
plan shape (including ones AQE won't rewrite, e.g. pre-aggregated or
unioned smalls).

Design:

- **Build** is one JVM aggregation: ``k`` hash positions per key via
  ``xxhash64(key, seed)``, reduced with ``bit_or`` into ``n_words`` 64-bit
  words. The shuffle is ``n_words`` rows regardless of build-side size.
- **The bitmap leaves the cluster once**: a bounded collect of ``n_words``
  longs (8 KiB per 65,536 bits) — a scalar-broadcast boundary exactly like
  J5, then re-enters every probe task as a literal array (no join, no
  broadcast exchange, pure codegen probe).
- **Probe** is ``k`` AND-ed bit tests per row — whole-stage-codegen
  expressions, evaluated at the scan, so Parquet row groups are dropped
  before any exchange.
- Bloom filters have false positives, so callers MUST compose with the
  exact join afterwards (``bloom_semi_join`` does); the prefilter changes
  cost, never results.

Sizing: false-positive rate ≈ (1 - e^(-k·n/m))^k for n keys, m bits.
The defaults (m = 64·4096 = 262,144 bits, k = 3) hold fpr < 1 % up to
~30k build keys; scale ``n_words`` linearly with build cardinality —
even 10^9 keys fit a 1.4 GiB-bit → in practice you shard by key-range
first or raise fpr; the arithmetic is transparent here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.litarrays import bigint_array

__all__ = ["build_bloom", "bloom_might_contain", "bloom_semi_join"]


def build_bloom(
    keys: DataFrame, key_col: str, n_words: int = 4096, n_hashes: int = 3
) -> list[int]:
    """Aggregate the build side into a ``n_words``-long bitmap (driver-side
    list of int64 words). One wide-to-narrow aggregation; output size is
    independent of input size."""
    m_bits = n_words * 64
    pos = [
        F.pmod(F.xxhash64(F.col(key_col), F.lit(s)), F.lit(m_bits)).alias(f"p{s}")
        for s in range(n_hashes)
    ]
    exploded = keys.select(F.explode(F.array(*pos)).alias("pos"))
    words = (
        exploded.select(
            (F.col("pos") / 64).cast("long").alias("w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            ).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    bitmap = [0] * n_words
    for r in words:
        bitmap[r["w"]] = r["bits"]
    return bitmap


def bloom_might_contain(
    bitmap: list[int], key: Column, n_hashes: int = 3
) -> Column:
    """Codegen probe predicate: every one of the ``n_hashes`` bit positions
    for ``key`` is set in the literal bitmap."""
    m_bits = len(bitmap) * 64
    # array<bigint> unconditionally: the per-element F.lit path coerced to
    # array<int> when every word happened to fit int32, and a 32-bit word
    # silently wraps the >=32 shift counts this probe generates
    arr = bigint_array(bitmap)
    tests = []
    for s in range(n_hashes):
        pos = F.pmod(F.xxhash64(key, F.lit(s)), F.lit(m_bits))
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        bit = F.call_function("shiftright", word, (pos % 64).cast("int")).bitwiseAND(
            F.lit(1).cast("long")
        )
        tests.append(bit == 1)
    out = tests[0]
    for t in tests[1:]:
        out = out & t
    return out


def bloom_semi_join(
    fact: DataFrame,
    build: DataFrame,
    fact_key: str,
    build_key: str,
    n_words: int = 4096,
    n_hashes: int = 3,
) -> DataFrame:
    """Exact ``fact LEFT SEMI JOIN build`` with a bloom prefilter: probe
    drops the overwhelming majority of non-matching fact rows at the scan,
    the exact semi join then removes the bloom's false positives. Result
    is identical to the plain semi join; the fact-side shuffle shrinks to
    matching-rows + fpr."""
    bitmap = build_bloom(build.select(build_key), build_key, n_words, n_hashes)
    pre = fact.filter(bloom_might_contain(bitmap, F.col(fact_key), n_hashes))
    # Exact semi join left to the planner: when the build side fits it
    # broadcasts; when it doesn't (the case the bloom exists for) both
    # sides shuffle — but the fact side is already down to matches + fpr.
    return pre.join(
        build.select(build_key).distinct(),
        pre[fact_key] == F.col(build_key),
        "left_semi",
    )
