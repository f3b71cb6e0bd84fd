"""q_group_ols's sufficient-statistics slope/intercept vs numpy lstsq on
a known line with noise."""

import numpy as np
from pyspark.sql import functions as F


def test_sufficient_stats_match_numpy(spark):
    rng = np.random.default_rng(5)
    x = rng.uniform(0, 30, size=500)
    y = 2.5 * x - 7.0 + rng.normal(0, 0.01, size=500)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )
    s = df.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    ).collect()[0]
    slope = (s["n"] * s["sxy"] - s["sx"] * s["sy"]) / (
        s["n"] * s["sxx"] - s["sx"] * s["sx"]
    )
    intercept = (s["sy"] - slope * s["sx"]) / s["n"]
    ref_slope, ref_inter = np.polyfit(x, y, 1)
    assert abs(slope - ref_slope) < 1e-8
    assert abs(intercept - ref_inter) < 1e-8
