"""SparkSession helpers.

The engine's temporal semantics assume a fixed UTC session timezone (the
reference's ``timestamp_tz`` → Spark ``TimestampType`` mapping, SURVEY.md
§1.2): always route session creation/preparation through here.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "dbt_scd2_utils_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # The S5 single-eval barriers persist() delta-sized intermediates;
        # by default AQE refuses to re-plan inside cached plans
        # (canChangeCachedPlanOutputPartitioning=false), so a persisted
        # merge source keeps the full shuffle-partition fan-out even when
        # its actual size is tiny — observed as 64-96-task stages over
        # ~60-row SCD2 state in the sequence replay.  Allowing it lets
        # AQE coalesce cached subtrees like any other; downstream joins
        # that needed the cache's partitioning re-shuffle a delta-sized
        # input at worst.
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    return spark


def prepare(spark: SparkSession) -> SparkSession:
    """Make an externally-provided session safe for the engine: UTC session
    timezone (instant-comparison parity with the reference's timestamp_tz),
    AQE on, and a local-scale shuffle partition count (the external default
    of 200 just adds scheduling overhead at test scale — on a real cluster
    the caller sizes this to data volume)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"
        )
        if int(spark.conf.get("spark.sql.shuffle.partitions", "200")) > 64:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
    except Exception:
        pass
    return spark
