"""Visual downsampling — LTTB-style triangle selection, distributed.

The reference spends ~30% of its code plotting (SURVEY scoped the figure
rendering out); what an ENGINE owes that workflow is the downsample that
makes plotting 100M points feasible: pick ~one representative point per
time bucket such that the drawn line preserves shape (spikes survive,
flat runs collapse).

Classic LTTB (Steinarsson 2013) is greedy-sequential: each bucket's pick
maximizes triangle area with the PREVIOUS PICK and the next bucket's
mean. The pick-chain makes it unparallelizable, so this implements the
standard parallel variant ("LTTB-mean"): anchors are the neighboring
buckets' MEANS on both sides — per-bucket argmax becomes embarrassingly
parallel, quality is near-identical on real series, and the result is
deterministic (area rounded to 6 dp, then (ts, id) tiebreak) hence
exactly oracle-checkable.

Shape: one bucket aggregate (|buckets| rows), lag/lead windows over that
tiny table, broadcast back, one per-bucket argmax — the data rows shuffle
once, on the bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def lttb_mean(
    df: DataFrame,
    ts_col: str,
    val_col: str,
    bucket_us: int,
    id_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """One representative row per (group, time bucket): the point with
    the largest triangle area against the neighboring buckets' mean
    points. Endpoint buckets (no prev/next) anchor on themselves — area
    degenerates to 0 and the deterministic tiebreak keeps their earliest
    point. Returns (group_cols…, bucket, ts, val)."""
    gs = list(group_cols or [])
    b = (F.col(ts_col) - F.col(ts_col) % F.lit(bucket_us)).alias("bucket")
    # x is normalized to BUCKET-WIDTH units before any area arithmetic: a
    # pure x-rescale multiplies every area by the same factor (argmax
    # invariant), and it keeps the µ-unit-quantized area inside BIGINT —
    # raw epoch-µs x would overflow it (ts·Δy·1e6 ≈ 1e19)
    xn = (F.col(ts_col).cast("double") / F.lit(float(bucket_us))).alias("xn")
    pts = df.select(*gs, b, F.col(ts_col).alias("ts"), xn,
                    F.col(val_col).alias("val"), F.col(id_col).alias("pid"))
    means = pts.groupBy(*gs, "bucket").agg(
        F.avg("xn").alias("mx"),
        F.avg("val").alias("my"),
    )
    w = Window.partitionBy(*gs).orderBy("bucket")
    anchors = means.select(
        *gs,
        "bucket",
        F.coalesce(F.lag("mx").over(w), F.col("mx")).alias("px"),
        F.coalesce(F.lag("my").over(w), F.col("my")).alias("py"),
        F.coalesce(F.lead("mx").over(w), F.col("mx")).alias("nx"),
        F.coalesce(F.lead("my").over(w), F.col("my")).alias("ny"),
    )
    joined = pts.join(F.broadcast(anchors), gs + ["bucket"])
    x = F.col("xn")
    area = F.abs(
        (F.col("px") - F.col("nx")) * (F.col("val") - F.col("py"))
        - (F.col("px") - x) * (F.col("ny") - F.col("py"))
    )
    scored = joined.withColumn(
        "__a", F.floor(area * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    )
    rw = Window.partitionBy(*gs, "bucket").orderBy(
        F.col("__a").desc(), F.col("ts"), F.col("pid")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(rw))
        .filter(F.col("__rn") == 1)
        .select(*gs, "bucket", "ts", "val")
    )
