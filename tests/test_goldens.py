"""Golden expected-output tests: the reference's
customers_scd{0,1}_expected_{1,2}.csv seeds, compared via symmetric set
difference on [customer_id, customer_name, email, status, _valid_from]
(test_matches_expected_seed.sql semantics, model configs from
models/scd_materialization/customers_scd{0,1}.sql: _created_at=_updated_at)."""

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
from tests.fixtures.seeds import CUSTOMERS_RAW, CUSTOMERS_SCHEMA

CFG = ScdConfig(unique_key=("customer_id",), created_at_column="_created_at")
COMPARE = ["customer_id", "customer_name", "email", "status", "_valid_from"]
T = lambda s: datetime.fromisoformat(s)  # noqa: E731

GOLDEN = {
    ("scd0", 1): [
        (1, "John Doe", "john@example.com", "INACTIVE", T("2024-01-01 09:00:00")),
        (2, "Jane Smith", "jane@example.com", "ACTIVE", T("2024-01-01 10:00:00")),
        (3, "Bob Wilson", "bob@example.com", "INACTIVE", T("2024-01-01 10:00:00")),
        (9, "Full Lifecycle", "lifecycle@example.com", "ACTIVE", T("2024-01-01 08:00:00")),
        (10, "Multi Delete", "multidelete@example.com", "ACTIVE", T("2024-01-01 10:00:00")),
    ],
    ("scd0", 2): [
        (1, "John Doe", "john@example.com", "INACTIVE", T("2024-01-01 09:00:00")),
        (2, "Jane Smith", "jane@example.com", "ACTIVE", T("2024-01-01 10:00:00")),
        (3, "Bob Wilson", "bob@example.com", "INACTIVE", T("2024-01-01 10:00:00")),
        (4, "Alice Brown", "alice@example.com", "ACTIVE", T("2024-01-02 10:00:00")),
        (9, "Full Lifecycle", "lifecycle@example.com", "ACTIVE", T("2024-01-01 08:00:00")),
        (10, "Multi Delete", "multidelete@example.com", "ACTIVE", T("2024-01-01 10:00:00")),
    ],
    ("scd1", 1): [
        (1, "John Doe", "john@example.com", "ACTIVE", T("2024-01-01 10:00:00")),
        (2, "Jane Smith", "jane@example.com", "ACTIVE", T("2024-01-01 10:00:00")),
        (3, "Bob Wilson", "bob@example.com", "INACTIVE", T("2024-01-01 10:00:00")),
        (9, "Full Lifecycle Resurrected", "lifecycle@example.com", "ACTIVE", T("2024-01-01 09:30:00")),
        (10, "Multi Delete", "multidelete@example.com", "ACTIVE", T("2024-01-01 10:00:00")),
    ],
    ("scd1", 2): [
        (1, "John Doe Jr", "john.doe.final@example.com", "INACTIVE", T("2024-01-01 10:00:00")),
        (2, "Jane Smith", "jane@example.com", "INACTIVE", T("2024-01-01 10:00:00")),
        (3, "Bob Wilson", "bob@example.com", "ACTIVE", T("2024-01-01 10:00:00")),
        (4, "Alice Brown", "alice@example.com", "ACTIVE", T("2024-01-02 10:00:00")),
        (9, "Full Lifecycle Resurrected", "lifecycle@example.com", "ACTIVE", T("2024-01-01 09:30:00")),
        (10, "Multi Delete", "multidelete@example.com", "ACTIVE", T("2024-01-01 10:00:00")),
    ],
}

GOLDEN_SCHEMA = (
    "customer_id int, customer_name string, email string, status string, "
    "_valid_from timestamp"
)


def model(spark, i):
    # customers_scd{0,1}.sql: business cols + _updated_at + _created_at
    return (
        spark.createDataFrame(CUSTOMERS_RAW[i], CUSTOMERS_SCHEMA)
        .drop("deleted_at")
        .withColumn("_created_at", F.col("_updated_at"))
    )


def assert_matches(spark, actual, key):
    expected = spark.createDataFrame(GOLDEN[key], GOLDEN_SCHEMA)
    a = actual.select(*COMPARE)
    e = expected.select(*COMPARE)
    unexpected = a.exceptAll(e).collect()
    missing = e.exceptAll(a).collect()
    assert not unexpected and not missing, (
        f"{key}: unexpected={unexpected} missing={missing}"
    )


def test_scd0_matches_reference_goldens(spark):
    state = scd0_initial_load(model(spark, 1), CFG)
    assert_matches(spark, state, ("scd0", 1))
    state = scd0_incremental(state, model(spark, 2), CFG)
    assert_matches(spark, state, ("scd0", 2))


def test_scd1_matches_reference_goldens(spark):
    state = scd1_initial_load(model(spark, 1), CFG)
    assert_matches(spark, state, ("scd1", 1))
    state = scd1_incremental(state, model(spark, 2), CFG)
    assert_matches(spark, state, ("scd1", 2))
