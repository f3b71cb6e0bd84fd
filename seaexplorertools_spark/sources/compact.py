"""Small-file compaction — the table-maintenance pass every long-running
100 TB ingest needs. Streaming/incremental writers produce many small
parquet files; scans then pay per-file open/footer costs and lose row-group
statistics locality. Compaction rewrites a table into ~uniform, large files.

Spark shape: `repartitionByRange` on the sort keys (range partitioning →
each output file covers a tight key range, so min/max row-group stats prune
well on those keys) + `maxRecordsPerFile` as the size governor. One shuffle,
no driver materialization.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    sort_cols: list[str],
    target_files: int,
    max_records_per_file: int | None = None,
) -> None:
    """Rewrite the parquet table at ``src`` into ``target_files``
    range-partitioned files at ``dst``, sorted within files by
    ``sort_cols`` so parquet min/max statistics make later filters on those
    columns prune whole files/row-groups."""
    df = spark.read.parquet(src)
    out = df.repartitionByRange(target_files, *sort_cols).sortWithinPartitions(
        *sort_cols
    )
    w = out.write.mode("overwrite")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(dst)


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of each
    column, bit j of column c landing at position j·N + c. Pure integer
    bit expressions — whole-stage codegen, no UDF. Inputs must already be
    non-negative ints in [0, 2^bits); normalize with ``_scale_to_bits``.

    Range-partitioning + sorting by this key gives every output file a
    tight hyper-rectangle in ALL ``cols`` dimensions, so parquet file- and
    row-group-level min/max statistics prune scans filtered on ANY of the
    participating columns — a linear sort only ever prunes its leading
    column. This is the layout trick behind Delta/Iceberg OPTIMIZE ZORDER,
    built from plain Spark expressions."""
    n = len(cols)
    terms = [
        F.shiftleft(F.shiftright(c, j).bitwiseAND(F.lit(1)), j * n + i)
        for i, c in enumerate(cols)
        for j in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def _scale_to_bits(c: Column, lo: float, hi: float, bits: int) -> Column:
    """Min-max scale a numeric column to integers in [0, 2^bits)."""
    span = (hi - lo) or 1.0
    scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(float(span))
    top = (1 << bits) - 1
    return F.least(
        F.greatest(F.floor(scaled * F.lit(float(1 << bits))), F.lit(0)),
        F.lit(top),
    ).cast("long")


def compact_parquet_zorder(
    spark: SparkSession,
    src: str,
    dst: str,
    zorder_cols: list[str],
    target_files: int,
    bits: int = 16,
    max_records_per_file: int | None = None,
) -> None:
    """Rewrite the table clustered on a Z-order key over ``zorder_cols``.

    Column ranges come from one tiny min/max aggregate (2·N scalars to the
    driver — the J5 scalar-broadcast pattern); the rewrite itself is the
    same single repartitionByRange shuffle as ``compact_parquet``, just
    keyed on the interleaved-bits column."""
    df = spark.read.parquet(src)
    bounds = df.agg(
        *[F.min(c).alias(f"{c}__lo") for c in zorder_cols],
        *[F.max(c).alias(f"{c}__hi") for c in zorder_cols],
    ).collect()[0]
    scaled = [
        _scale_to_bits(F.col(c), bounds[f"{c}__lo"], bounds[f"{c}__hi"], bits)
        for c in zorder_cols
    ]
    keyed = df.withColumn("__zkey", zorder_key(scaled, bits))
    out = (
        keyed.repartitionByRange(target_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
    w = out.write.mode("overwrite")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(dst)


def file_stats(df: DataFrame, key_col: str, value_col: str | None = None) -> DataFrame:
    """Per-physical-file statistics rollup (``input_file_name()``): row
    count and key extents per parquet file — the observability primitive
    behind compaction planning (small-file detection), data-skipping
    validation (are file extents disjoint after Z-order/linear sort?) and
    scan-skew diagnosis. File-local aggregation ⇒ only |files| partial
    states shuffle, never fact rows."""
    aggs = [
        F.count("*").alias("n_rows"),
        F.min(key_col).alias("min_key"),
        F.max(key_col).alias("max_key"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("total_value"))
    return df.groupBy(
        F.regexp_extract(F.input_file_name(), r"([^/]+)$", 1).alias("file")
    ).agg(*aggs)
