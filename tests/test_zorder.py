"""Z-order key properties: Morton interleave round-trip, and the
data-skipping guarantee — every leading-bit bucket bounds EVERY
participating dimension (the thing a single-column sort cannot do)."""

from pyspark.sql import functions as F

from seaexplorertools_spark.operators.zorder import (
    quantize,
    spread16,
    zorder_key2,
)


def _morton2(x: int, y: int) -> int:
    out = 0
    for b in range(16):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out


def test_spread_and_interleave_match_bitwise_reference(spark):
    pts = [(x, y) for x in (0, 1, 5, 255, 256, 65535) for y in (0, 3, 1024, 65535)]
    df = spark.createDataFrame(pts, ["x", "y"]).select(
        "x",
        "y",
        spread16(F.col("x")).alias("sx"),
        zorder_key2(F.col("x"), F.col("y")).alias("z"),
    )
    for r in df.collect():
        assert r["sx"] == _morton2(r["x"], 0)
        assert r["z"] == _morton2(r["x"], r["y"])


def test_buckets_bound_both_dimensions(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    lo_hi = li.agg(
        F.min("l_partkey"), F.max("l_partkey"), F.min("l_suppkey"), F.max("l_suppkey")
    ).collect()[0]
    plo, phi, slo, shi = (int(v) for v in lo_hi)
    z = zorder_key2(quantize("l_partkey", plo, phi), quantize("l_suppkey", slo, shi))
    spans = (
        li.select(F.shiftright(z, 24).alias("b"), "l_partkey", "l_suppkey")
        .groupBy("b")
        .agg(
            (F.max("l_partkey") - F.min("l_partkey")).alias("ps"),
            (F.max("l_suppkey") - F.min("l_suppkey")).alias("ss"),
        )
        .collect()
    )
    assert len(spans) > 1
    # top 8 Morton bits = 4 leading bits per dim -> each bucket covers
    # exactly 1/16 of each quantized domain (+1 for quantization edges)
    p_allow = (phi - plo + 1) / 16 + 1
    s_allow = (shi - slo + 1) / 16 + 1
    for r in spans:
        assert r["ps"] <= p_allow and r["ss"] <= s_allow

    # contrast: sorting by l_partkey alone leaves l_suppkey unbounded —
    # partkey-range buckets span (nearly) the whole suppkey domain
    pk_bucket = F.shiftright(quantize("l_partkey", plo, phi), 12)  # 16 ranges
    wide = (
        li.select(pk_bucket.alias("b"), "l_suppkey")
        .groupBy("b")
        .agg((F.max("l_suppkey") - F.min("l_suppkey")).alias("ss"))
        .agg(F.max("ss"))
        .collect()[0][0]
    )
    assert wide > (shi - slo + 1) / 2
