"""Build orchestration (ScdTable / scd_build): initial vs incremental
decisions, full refresh, atomic parquet swap."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_scd2_utils_spark import ScdConfig
from dbt_scd2_utils_spark.operators.invariants import assert_invariants
from dbt_scd2_utils_spark.plans.build import ScdTable, scd_build
from tests.fixtures.seeds import CUSTOMERS_RAW, CUSTOMERS_SCHEMA

CFG = ScdConfig(unique_key=("customer_id",), deleted_at_column="deleted_at")


def test_build_sequence_and_full_refresh(spark, tmp_path):
    path = str(tmp_path / "customers_scd2")
    table = ScdTable(spark, path, CFG)
    assert not table.exists()

    b1 = spark.createDataFrame(CUSTOMERS_RAW[1], CUSTOMERS_SCHEMA)
    out1 = table.build(b1)
    assert table.exists()
    n1 = out1.count()
    assert n1 > 0
    assert_invariants(out1, CFG)

    b2 = spark.createDataFrame(CUSTOMERS_RAW[2], CUSTOMERS_SCHEMA)
    out2 = table.build(b2)  # incremental (target exists)
    assert out2.count() > n1
    assert_invariants(out2, CFG)

    # Full refresh discards history and rebuilds from the given batch only.
    out3 = table.build(b1, full_refresh=True)
    assert out3.count() == n1


def test_scd_build_functional(spark, tmp_path):
    path = str(tmp_path / "scd1_table")
    b1 = spark.createDataFrame(CUSTOMERS_RAW[1], CUSTOMERS_SCHEMA).drop("deleted_at")
    out = scd_build(
        spark, b1, path, config={"unique_key": ["customer_id"], "scd_type": 1}
    )
    n1 = out.count()
    assert n1 == out.select("customer_id").distinct().count()
    # incremental second run via the same path (out's file handle is stale
    # after the atomic swap — capture counts before rebuilding)
    b2 = spark.createDataFrame(CUSTOMERS_RAW[2], CUSTOMERS_SCHEMA).drop("deleted_at")
    out2 = scd_build(
        spark, b2, path, config={"unique_key": ["customer_id"], "scd_type": 1}
    )
    assert out2.count() >= n1
    assert out2.filter(~F.col("_is_current")).count() == 0
