"""concurrency_profile vs a sequential sweep on hand-built intervals —
half-open semantics (touching intervals never concurrent), partition-count
invariance, and plan shape (no global window over the data)."""

from seaexplorertools_spark.operators.intervals import concurrency_profile


def _seq(intervals):
    deltas = {}
    for s, e in intervals:
        deltas[s] = deltas.get(s, 0) + 1
        deltas[e] = deltas.get(e, 0) - 1
    out, run = [], 0
    for t in sorted(deltas):
        run += deltas[t]
        out.append((t, run))
    return out


def test_profile_matches_sequential_sweep(spark):
    iv = [(0, 10), (5, 15), (10, 20), (10, 12), (30, 40), (30, 40)]
    df = spark.createDataFrame(iv, ["s", "e"]).repartition(5)
    for nparts in (1, 3, 17):
        got = sorted(
            (r["t"], r["concurrency"])
            for r in concurrency_profile(df, "s", "e", num_partitions=nparts).collect()
        )
        assert got == _seq(iv)
    # half-open: at t=10 the first interval has closed, two open -> peak 3 at t=10
    prof = dict(_seq(iv))
    assert prof[10] == 3 and prof[5] == 2 and prof[30] == 2 and prof[40] == 0
