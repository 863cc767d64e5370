"""Multi-format sources/sinks beyond parquet: JSONL, ORC, and
date-partitioned layouts.

JSONL is the de-facto interchange format for LLM corpora (one document
per line); ORC is the other columnar format Spark ships natively.  The
rules that matter at 100 TB:

- NEVER infer a JSON schema at scale — inference is a full extra scan of
  every byte before the real job starts.  ``read_jsonl`` requires an
  explicit schema and keeps Spark's PERMISSIVE mode wired to a
  ``_corrupt_record`` column so malformed lines are quarantined as data
  instead of killing the job (corpus files in the wild always have a few).
- Hive-style date partitioning (``write_date_partitioned``) is the
  coarse pruning layer: a reader filtering on the partition column never
  LISTS the other directories, let alone reads them — complementary to
  parquet row-group stats (within a file) and bucket pruning (by key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"  # keep microseconds — the
# default JSON format is millisecond-granular and silently truncates.


def write_jsonl(df: DataFrame, path: str) -> None:
    """One JSON object per line (gzip-able, splittable when uncompressed)."""
    df.write.mode("overwrite").option("timestampFormat", TS_FORMAT).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Schema-explicit JSONL read; malformed lines land in
    ``_corrupt_record`` (PERMISSIVE) rather than failing the scan."""
    # Build a COPY — StructType.add mutates in place, and df.schema is
    # cached on the DataFrame, so mutating the caller's object would
    # silently grow a _corrupt_record field on their source frame.
    full = (
        StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])
        if CORRUPT_COL not in schema.names
        else schema
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("timestampFormat", TS_FORMAT)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_date_partitioned(
    df: DataFrame, path: str, ts_col: str = "ts", part_col: str = "event_date"
) -> None:
    """Hive-layout daily partitions derived from an event-time column."""
    (
        df.withColumn(part_col, F.to_date(F.col(ts_col)))
        .write.mode("overwrite")
        .partitionBy(part_col)
        .parquet(path)
    )


def read_date_partition(
    spark: SparkSession, path: str, day: str, part_col: str = "event_date"
) -> DataFrame:
    """Read ONE day; the equality filter on the partition column prunes
    at directory-listing time (PartitionFilters in the scan, zero I/O on
    other days)."""
    return spark.read.parquet(path).filter(F.col(part_col) == F.lit(day))
