"""Lifecycle of operator-internal consistency caches (caching.py).

The rank/intervals/stats/dedup operators persist intermediates for
branch-consistency or multi-consumer reuse; a long-lived session must be
able to reclaim that memory between actions without touching operator
internals.
"""

from pyspark.sql import functions as F

from seaexplorertools_spark.caching import (
    consistency_cache_scope,
    ledger_size,
    release_consistency_caches,
)
from seaexplorertools_spark.operators.rank import global_rank


def _ranked(spark):
    df = spark.range(1000).withColumn("v", F.col("id") % 7)
    return global_rank(df, ["v", "id"], num_partitions=4)


def test_release_unpersists_ledgered_caches(spark):
    release_consistency_caches(blocking=True)  # clean slate from other tests
    out = _ranked(spark)
    assert out.count() == 1000
    assert ledger_size() >= 1  # global_rank pinned its range partition
    # assert on the ledgered frames' OWN storage levels, not the global
    # persistent-RDD count: other suites' non-blocking unpersists drain
    # asynchronously, so any count captured here can shrink mid-test
    # (observed full-suite order flake)
    from seaexplorertools_spark import caching

    pinned = [df for _, df in caching._LEDGER]
    assert any(df.storageLevel.useMemory for df in pinned)
    n = release_consistency_caches(blocking=True)
    assert n >= 1 and ledger_size() == 0
    assert all(not df.storageLevel.useMemory for df in pinned)


def test_scope_releases_only_inner_caches(spark):
    release_consistency_caches()
    outer = _ranked(spark)
    assert outer.count() == 1000
    before = ledger_size()
    assert before >= 1
    with consistency_cache_scope(blocking=True):
        inner = _ranked(spark)
        assert inner.count() == 1000
        assert ledger_size() > before
    # scope exit released the inner pins, left the outer ones ledgered
    assert ledger_size() == before
    release_consistency_caches(blocking=True)


def test_repeated_invocations_do_not_accumulate_with_scope(spark):
    release_consistency_caches(blocking=True)
    sc = spark.sparkContext
    base = sc._jsc.sc().getPersistentRDDs().size()  # foreign caches allowed
    for _ in range(3):
        with consistency_cache_scope(blocking=True):
            assert _ranked(spark).count() == 1000
    assert ledger_size() == 0
    # <= not ==: foreign caches counted in `base` may belong to OTHER
    # suites' non-blocking unpersists and can vanish asynchronously
    # between the base capture and this line (observed as a full-suite
    # order flake). The guarded bug — scope leak / accumulation — is
    # strictly GREATER than base, which this still catches.
    assert sc._jsc.sc().getPersistentRDDs().size() <= base


def test_scope_exit_spares_concurrent_thread_registrations(spark):
    """Token ownership, not ledger position: a scope exiting in one thread
    must not unpersist a cache that ANOTHER thread registered while the
    scope was open (the multi-threaded-driver hazard — positional
    mark/rollback would unpersist it mid-query)."""
    import threading

    from seaexplorertools_spark.caching import consistency_cache

    release_consistency_caches()
    in_scope = threading.Event()
    other_done = threading.Event()
    other = {}

    def other_thread():
        if in_scope.wait(30):
            other["df"] = consistency_cache(spark.range(100))
            other_done.set()

    t = threading.Thread(target=other_thread)
    t.start()
    with consistency_cache_scope(blocking=True):
        mine = consistency_cache(spark.range(50))
        assert mine.count() == 50
        in_scope.set()
        assert other_done.wait(30)  # other thread registered AFTER my mark
    t.join()
    assert not mine.storageLevel.useMemory  # my scope's entry released
    assert other["df"].storageLevel.useMemory  # theirs survived
    assert ledger_size() == 1
    release_consistency_caches(blocking=True)
