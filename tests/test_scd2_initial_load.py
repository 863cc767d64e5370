"""SCD2 initial load: behavior ported from the reference's integration tests
(batch 1 of the customers_raw sequence + born-deleted fixtures)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from dbt_scd2_utils_spark import ScdConfig, scd2_initial_load
from tests.fixtures.seeds import (
    BORN_DELETED_RAW,
    BORN_DELETED_SCHEMA,
    CUSTOMERS_RAW,
    CUSTOMERS_SCHEMA,
    TS,
)

CFG = ScdConfig(unique_key=("customer_id",), deleted_at_column="deleted_at")


def rows_by_key(df, *order):
    return [r.asDict() for r in df.orderBy(*order).collect()]


def test_initial_load_batch1(spark):
    df = spark.createDataFrame(CUSTOMERS_RAW[1], CUSTOMERS_SCHEMA)
    out = scd2_initial_load(df, CFG).cache()

    rows = rows_by_key(out, "customer_id", "_valid_from")

    # 17 exact duplicates of key 2 collapse to one row.
    key2 = [r for r in rows if r["customer_id"] == 2]
    assert len(key2) == 1
    assert key2[0]["_is_current"] is True
    assert key2[0]["_change_type"] == "I"
    assert key2[0]["_valid_to"] == datetime.fromisoformat("2999-12-31 23:59:59")

    # Key 1: two versions (INACTIVE 09:00 -> ACTIVE 10:00).
    key1 = [r for r in rows if r["customer_id"] == 1]
    assert [r["_change_type"] for r in key1] == ["I", "U"]
    assert key1[0]["_valid_to"] == key1[1]["_valid_from"]
    assert [r["_is_current"] for r in key1] == [False, True]

    # Key 9 full lifecycle in one batch: I -> U -> D -> I (resurrection).
    key9 = [r for r in rows if r["customer_id"] == 9]
    assert [r["_change_type"] for r in key9] == ["I", "U", "D", "I"]
    assert key9[3]["_is_current"] is True
    # Windows are continuous: each valid_to = next valid_from.
    for a, b in zip(key9, key9[1:]):
        assert a["_valid_to"] == b["_valid_from"]


def test_initial_load_born_deleted(spark):
    cfg = ScdConfig(
        unique_key=("customer_id",),
        created_at_column="_created_at",
        deleted_at_column="deleted_at",
    )
    df = spark.createDataFrame(BORN_DELETED_RAW[1], BORN_DELETED_SCHEMA)
    out = scd2_initial_load(df, cfg)
    rows = rows_by_key(out, "customer_id", "_valid_from")

    # Born-deleted: first-ever version arrives already deleted →
    # change_type 'D', valid_from = deleted_at (not created/updated).
    k100 = [r for r in rows if r["customer_id"] == 100]
    assert len(k100) == 1
    assert k100[0]["_change_type"] == "D"
    assert k100[0]["_valid_from"] == datetime.fromisoformat("2024-02-01 00:00:00")
    assert k100[0]["_is_current"] is True

    # Resurrected later: D then I; the D spans until the resurrection.
    k102 = [r for r in rows if r["customer_id"] == 102]
    assert [r["_change_type"] for r in k102] == ["D", "I"]
    assert k102[0]["_valid_to"] == k102[1]["_valid_from"]


def test_initial_load_unchanged_rows_collapse(spark):
    # Consecutive identical content (different updated_at) must collapse:
    # only hash-changing versions survive (changes_only filter).
    data = [
        (1, "A", "a@x.com", "ACTIVE", None, datetime(2024, 1, 1, 9)),
        (1, "A", "a@x.com", "ACTIVE", None, datetime(2024, 1, 1, 10)),
        (1, "B", "a@x.com", "ACTIVE", None, datetime(2024, 1, 1, 11)),
    ]
    df = spark.createDataFrame(data, CUSTOMERS_SCHEMA)
    out = scd2_initial_load(df, CFG)
    rows = rows_by_key(out, "_valid_from")
    assert len(rows) == 2
    assert [r["customer_name"] for r in rows] == ["A", "B"]


def test_change_columns_exclude(spark):
    # Excluded columns don't trigger new versions.
    cfg = ScdConfig(
        unique_key=("customer_id",),
        deleted_at_column="deleted_at",
        change_columns_exclude=("email",),
    )
    data = [
        (1, "A", "a@x.com", "ACTIVE", None, datetime(2024, 1, 1, 9)),
        (1, "A", "changed@x.com", "ACTIVE", None, datetime(2024, 1, 1, 10)),
    ]
    df = spark.createDataFrame(data, CUSTOMERS_SCHEMA)
    out = scd2_initial_load(df, cfg)
    assert out.count() == 1


def test_audit_schema(spark):
    df = spark.createDataFrame(CUSTOMERS_RAW[1], CUSTOMERS_SCHEMA)
    out = scd2_initial_load(df, CFG)
    assert out.columns == [
        "customer_id", "customer_name", "email", "status", "deleted_at",
        "_updated_at", "_is_current", "_valid_from", "_valid_to", "_change_type",
    ]
    dtypes = dict(out.dtypes)
    assert dtypes["_is_current"] == "boolean"
    assert dtypes["_valid_from"] == "timestamp"
    assert dtypes["_valid_to"] == "timestamp"
    assert dtypes["_change_type"] == "string"


def test_initial_load_all_null_updated_at_keeps_one_row(spark):
    """A key whose updated_at values are ALL NULL must survive the dedup with
    exactly one row (the reference's row_number()=1 per _scd2_key keeps one;
    a lag-only dup test silently dropped the whole key — ADVICE r1)."""
    rows = [
        (50, "Null Nora", "nora@x.com", "ACTIVE", None, None),
        (50, "Null Nora", "nora@alt.com", "ACTIVE", None, None),
        (1, "Alice", "alice@x.com", "ACTIVE", None, TS("2024-01-01 09:00:00")),
    ]
    df = spark.createDataFrame(rows, CUSTOMERS_SCHEMA)
    out = scd2_initial_load(df, CFG)
    got = rows_by_key(out, "customer_id")
    assert [r["customer_id"] for r in got] == [1, 50]
    key50 = [r for r in got if r["customer_id"] == 50]
    assert len(key50) == 1
    # deterministic tiebreak: smallest business values survive
    assert key50[0]["email"] == "nora@alt.com"
