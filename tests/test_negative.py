"""Negative (expected-compile-error) tests — 1:1 port of
integration_tests/test_scd_negative.sh: each misconfiguration must raise with
the script's exact grep substring."""

from __future__ import annotations

import pytest

from dbt_scd2_utils_spark import ScdConfig, ScdConfigError, resolve_config

# The CASES array from test_scd_negative.sh:22-26 — the asserted substrings.
CASES = [
    (
        # customers_scd1_deleted_at_invalid
        dict(unique_key=("customer_id",), scd_type=1, deleted_at_column="deleted_at"),
        "deletion tracking is not supported for SCD types 0 and 1",
    ),
    (
        # customers_scd_invalid_type
        dict(unique_key=("customer_id",), scd_type=3),
        "scd_type must be 0, 1 or 2",
    ),
]


@pytest.mark.parametrize("cfg_kwargs,expected", CASES)
def test_negative_cases(cfg_kwargs, expected):
    with pytest.raises(ScdConfigError) as e:
        ScdConfig(**cfg_kwargs).validate()
    assert expected in str(e.value)


def test_missing_unique_key_message():
    with pytest.raises(ScdConfigError, match="must provide a unique_key"):
        resolve_config(config={"scd_type": 2})


def test_scalar_unique_key_message():
    with pytest.raises(ScdConfigError, match="must be an array of column names"):
        ScdConfig(unique_key="customer_id").validate()


def test_configured_column_not_in_model(spark):
    from dbt_scd2_utils_spark import scd2_initial_load

    df = spark.createDataFrame(
        [(1, "x")], "customer_id int, status string"
    ).withColumn("_updated_at", __import__("pyspark.sql.functions", fromlist=["lit"]).lit("2024-01-01").cast("timestamp"))
    cfg = ScdConfig(unique_key=("customer_id",), created_at_column="nope")
    with pytest.raises(ScdConfigError, match="is configured but is not a column produced by"):
        scd2_initial_load(df, cfg)


def test_date_typed_updated_at_warns(spark):
    """scd_plan.sql:224-238: a DATE-typed updated_at column must emit the
    reference's warning (the negative-test script greps for it)."""
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        F.col("id").alias("customer_id"),
        F.lit("x").alias("status"),
        F.current_date().alias("_updated_at"),
    )
    cfg = ScdConfig(unique_key=("customer_id",))
    with pytest.warns(UserWarning, match="which is a DATE type"):
        cfg.validate_against_schema(df.schema)


def test_timestamp_updated_at_does_not_warn(spark):
    import warnings as w
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        F.col("id").alias("customer_id"),
        F.current_timestamp().alias("_updated_at"),
    )
    cfg = ScdConfig(unique_key=("customer_id",))
    with w.catch_warnings():
        w.simplefilter("error")
        cfg.validate_against_schema(df.schema)
