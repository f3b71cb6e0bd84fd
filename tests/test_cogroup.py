"""interp_join_cogrouped == JVM interp_join on a fixture exercising NULL
samples, outside-hull probes, exact-time matches — including both sides
branching from the SAME DataFrame (the shared-lineage case the per-side
alias guard exists for)."""

import math

from pyspark.sql import functions as F

from seaexplorertools_spark.operators.cogroup import interp_join_cogrouped
from seaexplorertools_spark.operators.joins import interp_join


def _fixture(spark):
    rows = []
    for k in ("a", "b"):
        off = 0.0 if k == "a" else 1000.0
        for i in range(20):
            # side 0 = samples with a NULL value every 5th point
            v = None if i % 5 == 3 else off + i * 2.0
            rows.append((k, 0, float(i * 10), v))
        for t in (-5.0, 0.0, 7.0, 95.0, 190.0, 500.0):
            rows.append((k, 1, t + (0.5 if k == "b" else 0.0), None))
    return spark.createDataFrame(rows, "k string, side int, t double, v double")


def test_cogrouped_matches_jvm_incl_shared_lineage(spark):
    df = _fixture(spark)
    samples = df.filter("side = 0").select("k", "t", "v")
    probes = df.filter("side = 1").select("k", F.col("t").alias("t"))
    want = {
        (r["k"], r["t"]): r["v_i"]
        for r in interp_join(
            samples, probes, on="t", values=["v"], partition_by=["k"], suffix="_i"
        ).collect()
    }
    got = {
        (r["k"], r["t"]): r["v_i"]
        for r in interp_join_cogrouped(
            samples, probes, on="t", values=["v"], partition_by=["k"], suffix="_i"
        ).collect()
    }
    assert set(got) == set(want)
    for key, w in want.items():
        g = got[key]
        assert (g is None) == (w is None), key
        if w is not None:
            assert math.isclose(g, w, rel_tol=0, abs_tol=1e-9), key
    # sanity: the fixture actually exercises hull-NULLs and interpolation
    assert any(v is None for v in want.values())
    assert any(v is not None for v in want.values())
