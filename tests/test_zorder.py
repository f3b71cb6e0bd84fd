"""Z-order layout: every output file covers a tight range in BOTH
dimensions (the property parquet min/max pruning needs), where a linear
sort leaves the trailing dimension unpruned; key interleaving is exact."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from seaexplorertools_spark.sources.compact import (
    compact_parquet,
    compact_parquet_zorder,
    zorder_key,
)


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "x long, y long")
    # bit j of x -> position 2j; bit j of y -> 2j+1:
    # x=101, y=011 -> z = 1·1 + 2·1 + 4·0 + 8·1 + 16·1 + 32·0 = 27
    [row] = df.select(
        zorder_key([F.col("x"), F.col("y")], bits=3).alias("z")
    ).collect()
    assert row["z"] == 0b011011


def _per_file_extents(spark, path, col):
    exts = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        row = spark.read.parquet(f).agg(
            F.min(col).alias("lo"), F.max(col).alias("hi")
        ).collect()[0]
        exts.append(row["hi"] - row["lo"])
    return exts


def test_zorder_files_bound_both_dims(spark, tmp_path):
    # 64x64 grid of (x, y) points
    pts = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    src = str(tmp_path / "src")
    pts.write.mode("overwrite").parquet(src)

    lin, zed = str(tmp_path / "linear"), str(tmp_path / "zorder")
    compact_parquet(spark, src, lin, sort_cols=["x", "y"], target_files=16)
    compact_parquet_zorder(spark, src, zed, zorder_cols=["x", "y"], target_files=16)

    # data is preserved
    assert spark.read.parquet(zed).exceptAll(pts).count() == 0
    assert spark.read.parquet(zed).count() == 64 * 64

    # linear sort on (x, y): each file spans (almost) the full y range;
    # z-order: each file is a ~16x16-ish block, tight in BOTH dims
    lin_y = _per_file_extents(spark, lin, "y")
    zed_y = _per_file_extents(spark, zed, "y")
    zed_x = _per_file_extents(spark, zed, "x")
    assert sum(lin_y) / len(lin_y) > 40  # trailing dim unbounded under sort
    assert sum(zed_y) / len(zed_y) < 20  # bounded under z-order
    assert sum(zed_x) / len(zed_x) < 20  # ...in both dimensions
