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

from pyspark.sql import DataFrame, SparkSession


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
