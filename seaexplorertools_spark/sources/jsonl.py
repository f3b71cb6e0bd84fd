"""JSONL document source/sink — the interchange format LLM corpora actually
ship in (one JSON object per line; Spark's json reader/writer is exactly
line-delimited JSON).

Scale posture: the reader takes an EXPLICIT schema — never schema inference,
which at 100 TB is a full extra pass over the data before the first real
job. Malformed lines are kept, not dropped: PERMISSIVE mode routes them to
a corrupt-record column so the pipeline can count/quarantine them (silent
row loss in ingestion is unrecoverable downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as sqlt

# the documents-table contract (TESTDATA.md) + corrupt-record capture
DOCUMENTS_SCHEMA = sqlt.StructType(
    [
        sqlt.StructField("doc_id", sqlt.LongType()),
        sqlt.StructField("text", sqlt.StringType()),
        sqlt.StructField("lang", sqlt.StringType()),
        sqlt.StructField("source", sqlt.StringType()),
        sqlt.StructField("n_chars", sqlt.LongType()),
        sqlt.StructField("_corrupt_record", sqlt.StringType()),
    ]
)


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: sqlt.StructType = DOCUMENTS_SCHEMA,
) -> DataFrame:
    """Read line-delimited JSON documents with an explicit schema.
    Malformed lines surface with every data column NULL and the raw line in
    ``_corrupt_record``; well-formed rows have ``_corrupt_record`` NULL.
    Split ingestion with ``good_corrupt_split``."""
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def good_corrupt_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean rows without the capture column, quarantined raw lines).

    The parsed batch is cached first: Spark refuses a query whose scan
    references ONLY the corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_
    COLUMN), and ingestion reads the split twice anyway (write clean /
    count+quarantine bad) — at scale this cache is the staging
    materialization every quarantining ingest does before the fan-out."""
    df = df.cache()
    good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select("_corrupt_record")
    return good, bad


def write_jsonl(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """Write as line-delimited JSON. ``n_files`` coalesces for export
    (JSONL is an interchange sink — readers elsewhere want few files);
    leave None to keep the job's parallelism."""
    out = df.coalesce(n_files) if n_files else df
    out.write.mode("overwrite").json(path)
