"""LTTB-mean downsampler: spike preservation + determinism."""

from __future__ import annotations

from seaexplorertools_spark.operators.downsample import lttb_mean


def test_lttb_keeps_the_spike(spark):
    # flat series with one huge spike mid-bucket: the spike MUST survive
    rows = []
    for t in range(300):
        v = 100.0 if t == 157 else 1.0 + (t % 3) * 0.01
        rows.append(("g", t * 1000, v, t))
    df = spark.createDataFrame(rows, ["g", "ts", "val", "id"])
    out = lttb_mean(df, "ts", "val", bucket_us=100 * 1000, id_col="id",
                    group_cols=["g"])
    got = {r["bucket"]: r["val"] for r in out.collect()}
    assert len(got) == 3  # one pick per bucket
    assert got[100 * 1000] == 100.0  # the spike's bucket picked the spike


def test_lttb_deterministic_on_flat_series(spark):
    # perfectly flat: every area is 0 -> tiebreak keeps each bucket's
    # earliest point, on any partitioning
    rows = [("g", t * 1000, 5.0, t) for t in range(200)]
    df = spark.createDataFrame(rows, ["g", "ts", "val", "id"])
    a = sorted((r["bucket"], r["ts"]) for r in
               lttb_mean(df, "ts", "val", 50 * 1000, "id", ["g"]).collect())
    b = sorted((r["bucket"], r["ts"]) for r in
               lttb_mean(df.repartition(7), "ts", "val", 50 * 1000, "id", ["g"]).collect())
    assert a == b
    assert all(ts == bucket for bucket, ts in a)  # earliest point per bucket
