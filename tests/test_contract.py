"""Schema contract enforcement (customers_scd2_contract regression) +
store_failures (S9)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from dbt_scd2_utils_spark import ScdConfig, scd2_initial_load
from dbt_scd2_utils_spark.operators.invariants import (
    one_current_per_key,
    scd2_invariant_suite,
    store_failures,
)
from dbt_scd2_utils_spark.plans.contract import ContractError, enforce_contract
from tests.fixtures.seeds import CUSTOMERS_RAW, CUSTOMERS_SCHEMA

# The contract from schema.yml:159-192 (minus the sysdate column).
CONTRACT = {
    "customer_id": "number",
    "customer_name": "varchar",
    "email": "varchar",
    "status": "varchar",
    "deleted_at": "timestamp_tz",
    "_updated_at": "timestamp_tz",
    "_created_at": "timestamp_tz",
    "_is_current": "boolean",
    "_valid_from": "timestamp_tz",
    "_valid_to": "timestamp_tz",
    "_change_type": "varchar",
}

CFG = ScdConfig(
    unique_key=("customer_id",),
    deleted_at_column="deleted_at",
    created_at_column="_created_at",
)


def built(spark):
    df = spark.createDataFrame(CUSTOMERS_RAW[1], CUSTOMERS_SCHEMA).withColumn(
        "_created_at", F.col("_updated_at")
    )
    return scd2_initial_load(df, CFG)


def test_contract_passes_on_final_relation(spark):
    out = enforce_contract(built(spark), CONTRACT)
    assert out.count() > 0


def test_contract_catches_missing_and_unexpected(spark):
    bad = dict(CONTRACT)
    bad["ghost_column"] = "varchar"
    del bad["email"]
    with pytest.raises(ContractError) as e:
        enforce_contract(built(spark), bad)
    msg = str(e.value)
    assert "missing column: ghost_column" in msg
    assert "unexpected column: email" in msg


def test_contract_catches_type_mismatch(spark):
    bad = dict(CONTRACT)
    bad["customer_id"] = "boolean"
    with pytest.raises(ContractError, match="type mismatch: customer_id"):
        enforce_contract(built(spark), bad)


def test_store_failures(spark, tmp_path):
    table = built(spark)
    # healthy table → no failure directories
    counts = store_failures(
        {"one_current_per_key": one_current_per_key(table, ["customer_id"])},
        str(tmp_path / "f1"),
    )
    assert counts == {"one_current_per_key": 0}
    assert not (tmp_path / "f1" / "one_current_per_key").exists()

    # corrupt the table (duplicate current rows) → failures persisted
    broken = table.unionByName(table.filter(F.col("_is_current")))
    counts = store_failures(
        {"one_current_per_key": one_current_per_key(broken, ["customer_id"])},
        str(tmp_path / "f2"),
    )
    assert counts["one_current_per_key"] > 0
    stored = spark.read.parquet(str(tmp_path / "f2" / "one_current_per_key"))
    assert stored.count() == counts["one_current_per_key"]


def test_full_suite_runs(spark):
    suite = scd2_invariant_suite(built(spark), CFG)
    assert set(suite) >= {
        "one_current_per_key", "no_validity_overlaps",
        "continuous_validity_windows", "no_records_after_deletion",
    }
