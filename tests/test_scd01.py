"""SCD Types 0/1 — golden expectations from the reference's
customers_scd{0,1}_expected_{1,2}.csv seeds (first two sequence iterations)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from dbt_scd2_utils_spark import ScdConfig
from dbt_scd2_utils_spark.operators.scd01 import (
    scd0_incremental,
    scd0_initial_load,
    scd1_incremental,
    scd1_initial_load,
)
from dbt_scd2_utils_spark.operators.invariants import all_records_current
from tests.fixtures.seeds import CUSTOMERS_RAW, CUSTOMERS_SCHEMA

CFG = ScdConfig(unique_key=("customer_id",))


def feed(spark, i):
    # scd0/1 models don't track deletions — drop deleted_at like the
    # reference models do (deleted_at is forbidden for types 0/1).
    return spark.createDataFrame(CUSTOMERS_RAW[i], CUSTOMERS_SCHEMA).drop("deleted_at")


def by_key(df):
    return {
        r["customer_id"]: r.asDict() for r in df.collect()
    }


def test_scd1_initial_then_incremental(spark):
    state = scd1_initial_load(feed(spark, 1), CFG)
    rows = by_key(state)
    # Latest version per key wins; one row per key.
    assert rows[1]["status"] == "ACTIVE"  # 10:00 beats 09:00
    assert rows[9]["customer_name"] == "Full Lifecycle Resurrected"
    assert len(rows) == 5
    assert all_records_current(state).count() == 0

    state2 = scd1_incremental(state, feed(spark, 2), CFG)
    rows2 = by_key(state2)
    # Key 1: latest of batch 2 (2024-01-04) overwrites business cols ...
    assert rows2[1]["customer_name"] == "John Doe Jr"
    assert rows2[1]["email"] == "john.doe.final@example.com"
    # ... but _valid_from (first-seen) is preserved from iteration 1.
    assert rows2[1]["_valid_from"] == rows[1]["_valid_from"]
    # New key 4 inserted with its own valid_from.
    assert rows2[4]["email"] == "alice@example.com"
    assert len(rows2) == 6
    assert all_records_current(state2).count() == 0


def test_scd0_initial_then_incremental(spark):
    state = scd0_initial_load(feed(spark, 1), CFG)
    rows = by_key(state)
    # Earliest (original) version per key wins.
    assert rows[1]["status"] == "INACTIVE"  # 09:00 original
    assert rows[9]["customer_name"] == "Full Lifecycle"  # 08:00 original
    assert len(rows) == 5

    state2 = scd0_incremental(state, feed(spark, 2), CFG)
    rows2 = by_key(state2)
    # Existing keys never change.
    assert rows2[1]["customer_name"] == "John Doe"
    assert rows2[1]["email"] == "john@example.com"
    assert rows2[1]["status"] == "INACTIVE"
    # Brand-new key inserts its earliest version.
    assert rows2[4]["email"] == "alice@example.com"
    assert len(rows2) == 6


def test_scd01_audit_constants(spark):
    state = scd1_initial_load(feed(spark, 1), CFG)
    r = state.first()
    assert r["_is_current"] is True
    assert r["_change_type"] == "I"
    assert r["_valid_to"] == datetime.fromisoformat("2999-12-31 23:59:59")


def test_scd1_null_key_reinserts(spark):
    # Raw-equality merge (J7 parity): NULL-bearing key never matches → the
    # incremental run re-inserts it (deliberate reference asymmetry).
    schema = "customer_id int, region string, status string, _updated_at timestamp"
    b = [(1, None, "active", datetime(2024, 1, 1))]
    cfg = ScdConfig(unique_key=("customer_id", "region"))
    state = scd1_initial_load(spark.createDataFrame(b, schema), cfg)
    state2 = scd1_incremental(state, spark.createDataFrame(b, schema), cfg)
    assert state2.count() == 2  # duplicate current rows — reference parity
