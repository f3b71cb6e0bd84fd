"""S1 — glider Parquet source (reference ``load``, process_adcp.py:80-114).

The reference reads Parquet with a hard-coded projection, normalizes the
timestamp unit to ns, derives a float-time shadow column, computes
soundspeed and renames columns. Spark-first: the projection is a select
(Catalyst prunes the Parquet scan to exactly these columns), the timestamp
normalization is a cast chain, and soundspeed is a column expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import gsw as GSW

# reference sel_cols (:83-92) → engine names (:110-111 renames)
GLIDER_COLUMNS = {
    "Timestamp": "time",
    "Temperature": "temperature",
    "Salinity": "salinity",
    "Latitude": "latitude",
    "Longitude": "longitude",
    "profileNum": "profile_number",
    "Declination": "declination",
    "LEGATO_PRESSURE": "pressure",
}
EXTRA_COLUMNS = ["speed_vert", "speed_horz", "DeadReckoning", "NAV_RESOURCE", "diveNum"]


def load_glider(
    spark: SparkSession, path: str, column_map: dict[str, str] | None = None
) -> DataFrame:
    """Load a glider mission table.

    Unlike the reference, ALL needed columns are projected at first read —
    the reference re-reads the file and grafts 5 columns positionally
    (J3, :2068-2074); a single projection avoids the positional join
    entirely (SURVEY §7 risk 8).

    Timestamps of any parquet unit surface as ``time_us`` BIGINT µs (the
    reference normalizes to ns and keeps a float shadow column :93-105; µs
    longs are exact in doubles).
    """
    column_map = column_map or GLIDER_COLUMNS
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    present = {src: dst for src, dst in column_map.items() if src in df.columns}
    cols = [F.col(s).alias(d) for s, d in present.items()]
    cols += [F.col(c) for c in EXTRA_COLUMNS if c in df.columns]
    out = df.select(*cols)
    tcol = "time" if "time" in out.columns else None
    if tcol:
        dt = dict(out.dtypes)[tcol]
        if dt == "bigint":  # nanos-as-long
            out = out.withColumn("time_us", F.expr(f"{tcol} div 1000"))
        else:
            out = out.withColumn("time_us", F.unix_micros(F.col(tcol).cast("timestamp")))
    if {"temperature", "salinity", "pressure", "latitude"} <= set(out.columns):
        depth = GSW.depth_from_pressure(F.col("pressure"), F.col("latitude"))
        out = out.withColumn(
            "soundspeed", GSW.soundspeed(F.col("temperature"), F.col("salinity"), depth)
        )
    return out


def write_gridded(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """S6 — gridded-output sink. Partitioned parquet; at 100 TB partition by
    mission/profile range so downstream reads prune."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
