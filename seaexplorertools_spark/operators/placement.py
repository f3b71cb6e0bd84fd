"""Data-placement operators — rendezvous (highest-random-weight) hashing
for consistent shard assignment (Thaler/Ravishankar, public algorithm).

Why not ``hash(key) % n``: growing a corpus from n to n+1 shards remaps
~n/(n+1) of ALL keys (full reshuffle of 100 TB). Rendezvous hashing
assigns each key to argmax_s h(key, s); adding a shard only steals the
keys whose new hash wins — exactly 1/(n+1) of them in expectation — and
never moves a key between two surviving shards (the old argmax still
beats every old rival). Pure map-side expressions: no shuffle, no state,
engine-portable md5 so any system (or the DuckDB oracle) computes the
same placement.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _score(key: Column, shard: str) -> Column:
    h = F.md5(F.concat(key.cast("string"), F.lit("|"), F.lit(shard)))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")


def rendezvous_shard(key: Column, shards: list[str]) -> Column:
    """The shard (by name) winning the highest-random-weight election for
    ``key``; ties (2⁻⁶⁰) broken by shard name for determinism."""
    pairs = [
        F.struct(_score(key, s).alias("score"), F.lit(s).alias("shard"))
        for s in sorted(shards)
    ]
    best = F.greatest(*pairs) if len(pairs) > 1 else pairs[0]
    return best.getField("shard")


def rendezvous_shard_sql(key_expr: str, shards: list[str]) -> str:
    """The identical election as engine-portable SQL (DuckDB oracle):
    struct comparison is lexicographic on (score, shard) in both
    engines."""
    pairs = ", ".join(
        f"{{'score': ('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || '|' || '{s}'), 1, 15))::BIGINT,"
        f" 'shard': '{s}'}}"
        for s in sorted(shards)
    )
    return f"(list_max([{pairs}])).shard"
