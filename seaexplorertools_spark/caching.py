"""Lifecycle management for operator-internal consistency caches.

Several operators pin an intermediate with ``.persist()`` for
CORRECTNESS, not speed: ``global_rank``/``global_cumsum``/
``global_running_max`` (operators/rank.py) and ``overlap_islands``
(operators/intervals.py) cache their ``repartitionByRange`` output so
two plan branches see ONE boundary sample (AQE may otherwise give the
branches different sampled boundaries — see the rank.py comment), and
the stats/dedup/grid operators cache small intermediates consumed by
2+ downstream aggregates.

Those persists used to be fire-and-forget: each invocation added an
InMemoryRelation that lived until session end, so a long-lived session
(a notebook, a streaming driver, a query service) invoking the
operators repeatedly accumulated unbounded cached lineage and eviction
churn. Correctness survives block eviction (recompute reuses the
pinned shuffle output), but memory pressure was unbounded.

This module gives every such internal persist a handle:

- operators route their persist through :func:`consistency_cache`,
  which registers the DataFrame in a session-global ledger;
- callers bound memory with :func:`release_consistency_caches`
  (unpersist-all between actions) or the
  :func:`consistency_cache_scope` context manager (unpersist everything
  an enclosed block created — the "caller-owned caching" shape that
  ``jaccard_on_pairs`` pioneered with its ``token_df`` parameter).

Scope ownership is per-thread: each scope carries a token, entries are
tagged with the innermost token of the REGISTERING thread, and a scope
exit unpersists only its own entries. Under a multi-threaded driver a
scope exiting in one thread therefore never unpersists a consistency
cache another thread's still-executing query registered concurrently
(which would re-expose the AQE range-boundary branch divergence the
cache exists to prevent).

Call release points BETWEEN actions only: unpersisting while a query
that depends on a consistency cache is still executing re-exposes the
branch-divergence the cache exists to prevent.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame

# (owning scope token | None, df) — token identity is the removal key
_LEDGER: list[tuple[object, DataFrame]] = []
_LOCK = threading.Lock()  # drivers commonly run queries from thread pools
_SCOPES = threading.local()  # per-thread stack of active scope tokens


def _current_token() -> object | None:
    stack = getattr(_SCOPES, "stack", None)
    return stack[-1] if stack else None


def consistency_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` + register in the session ledger so the caller can
    reclaim the memory later. Returns ``df`` (same object, cached). The
    entry is owned by the registering thread's innermost active
    :func:`consistency_cache_scope`, if any."""
    df = df.cache()
    with _LOCK:
        _LEDGER.append((_current_token(), df))
    return df


def release_consistency_caches(blocking: bool = False) -> int:
    """Unpersist every ledgered internal cache; returns how many were
    released. Safe to call between actions; do NOT call while a query
    built on one of these operators is mid-execution (in ANY thread)."""
    with _LOCK:
        drained = [df for _, df in _LEDGER]
        _LEDGER.clear()
    for df in drained:
        try:
            df.unpersist(blocking=blocking)
        except Exception:  # session already stopped — nothing to free
            pass
    return len(drained)


def ledger_size() -> int:
    """Number of currently-ledgered internal caches (observability)."""
    return len(_LEDGER)


@contextmanager
def consistency_cache_scope(blocking: bool = False) -> Iterator[None]:
    """Unpersist, on exit, every internal cache created inside the
    block BY THIS THREAD — scoped caller-owned caching for one logical
    query::

        with consistency_cache_scope():
            out = global_rank(df, ["quality", "doc_id"]).collect()
        # rank's range-partition pin is released here

    Ownership is token-based, not position-based: concurrent threads'
    registrations interleaved into the ledger are left untouched, and
    nested scopes release exactly their own entries.
    """
    token = object()
    stack = getattr(_SCOPES, "stack", None)
    if stack is None:
        stack = _SCOPES.stack = []
    stack.append(token)
    try:
        yield
    finally:
        stack.pop()
        with _LOCK:
            mine = [df for tok, df in _LEDGER if tok is token]
            _LEDGER[:] = [e for e in _LEDGER if e[0] is not token]
        for df in mine:
            try:
                df.unpersist(blocking=blocking)
            except Exception:
                pass
