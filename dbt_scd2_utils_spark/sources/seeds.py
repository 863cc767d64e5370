"""Seed CSV loading — the engine's ``dbt seed`` (SURVEY.md §2.1 S1).

The reference's fixtures are typed CSVs: agate-inferred types overridden
per column by ``schema.yml``'s ``column_types``
(``integration_tests/seeds/scd2_materialization/schema.yml:4-17``,
``dbt_project.yml(int):30-32``).  The Spark mapping is a header CSV scan
with inferSchema for the unlisted columns and explicit casts for the
listed ones — empty strings load as NULL (dbt/agate behavior, and Spark
CSV's default ``nullValue``).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_seed(
    spark: SparkSession,
    path: str,
    column_types: Mapping[str, str] | None = None,
    delimiter: str = ",",
) -> DataFrame:
    """Load one seed CSV (or a directory of them) as a typed DataFrame.

    ``column_types`` maps column name → Spark SQL type string (the
    ``schema.yml`` override); columns not listed keep their inferred type.
    Unknown column names in ``column_types`` raise, matching dbt's
    compile-time complaint rather than silently ignoring a typo.
    """
    df = (
        spark.read.option("header", True)
        .option("inferSchema", True)
        .option("delimiter", delimiter)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(path)
    )
    if not column_types:
        return df
    have = {c.lower(): c for c in df.columns}
    missing = [c for c in column_types if c.lower() not in have]
    if missing:
        raise ValueError(
            f"column_types references columns not in the seed: {missing} "
            f"(seed columns: {df.columns})"
        )
    casts = {have[c.lower()]: t for c, t in column_types.items()}
    return df.select(
        *[
            F.col(c).cast(casts[c]).alias(c) if c in casts else F.col(c)
            for c in df.columns
        ]
    )
