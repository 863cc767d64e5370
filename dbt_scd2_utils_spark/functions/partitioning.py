"""Partitioning helpers shared by operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def parallelize_narrow(df: DataFrame) -> DataFrame:
    """Round-robin repartition ONLY when the input has far fewer partitions
    than the session has slots — the single-small-parquet-file local case,
    where a CPU-heavy projection (interpreted higher-order functions,
    shingling, signatures) would otherwise run on one core while the rest
    of the machine idles.

    At scale the input is already well-partitioned and this is a no-op — no
    unconditional shuffle of a 100-TB corpus.  The partition probe
    (``df.rdd`` forces a driver-side plan-to-RDD conversion) only runs on
    local masters — the exact case it exists for — so a cluster deployment
    never pays the conversion at all."""
    try:
        if not df.sparkSession.conf.get("spark.master", "").startswith("local"):
            return df
        target = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() * 2 < target:
            return df.repartition(target)
    except Exception:
        pass
    return df
