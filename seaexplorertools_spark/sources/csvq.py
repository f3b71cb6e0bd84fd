"""CSV source with explicit schema + malformed-row quarantine — the
flat-file twin of the JSONL source (sources/jsonl.py), for the mundane
reality that half of all ingested data arrives as CSV.

Same scale posture: EXPLICIT schema (inference is a full extra pass at
100 TB), PERMISSIVE mode so malformed lines land in a corrupt-record
column instead of silently vanishing, and the good/quarantine split is a
single narrow filter — no second read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as sqlt

EVENTS_CSV_SCHEMA = sqlt.StructType(
    [
        sqlt.StructField("event_id", sqlt.LongType()),
        sqlt.StructField("user_id", sqlt.LongType()),
        sqlt.StructField("event_type", sqlt.StringType()),
        sqlt.StructField("value", sqlt.DoubleType()),
        sqlt.StructField("_corrupt_record", sqlt.StringType()),
    ]
)


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: sqlt.StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Read CSV with an explicit schema; rows that fail to parse (wrong
    arity, bad types) surface with data columns NULL and the raw line in
    ``_corrupt_record``. The schema MUST include the corrupt-record
    string column (Spark requirement for PERMISSIVE capture)."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )


def good_corrupt_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean rows without the capture column, quarantined raw lines).
    Cached first — Spark refuses a scan referencing ONLY the corrupt
    column (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and quarantining ingests
    read the split twice anyway (same staging as sources/jsonl.py)."""
    df = df.cache()
    good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select(
        "_corrupt_record"
    )
    return good, bad
