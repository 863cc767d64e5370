"""Shared I/O helpers for the epoch-partitioned streaming sinks.

Output directory OWNERSHIP contract (applies to every foreachBatch sink
using the epoch=N dynamic-partition-overwrite pattern): one directory
belongs to ONE stream lineage (its checkpoint).  Replays WITHIN a
lineage are idempotent — a retried micro-batch overwrites its own
epoch partition.  Reusing the directory for an INDEPENDENT run (new or
cleared checkpoint) restarts epoch numbering at 0 and only overwrites
the epochs the new run reaches: stale higher-numbered partitions from
the previous run would survive and silently union into reads.  Use a
fresh directory per run (the pattern every caller in this repo
follows), or clear it first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.utils import AnalysisException


def read_epoch_partitioned(spark, out_path: str, schema: str) -> DataFrame:
    """Read an epoch-partitioned foreachBatch output directory: drops
    the bookkeeping ``epoch`` column; returns an empty frame of
    ``schema`` when the stream never produced a batch (missing path).
    Any OTHER read failure — corrupt files, permissions, schema
    conflicts — propagates: converting those into an empty result
    would silently report "no output" for a real I/O error."""
    try:
        return spark.read.parquet(out_path).drop("epoch")
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return spark.createDataFrame([], schema)
        raise
