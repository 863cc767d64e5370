"""Seed CSV loading (sources/seeds.py — SURVEY §2.1 S1): typed CSV with
column_types overrides, empty-string → NULL, and SCD round-trip from a
seed fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_scd2_utils_spark import ScdConfig, scd2_initial_load
from dbt_scd2_utils_spark.sources.seeds import load_seed

CSV = """customer_id,name,status,deleted_at,_updated_at
1,alice,active,,2020-01-01 00:00:00
1,alice,inactive,,2020-06-01 00:00:00
2,bob,active,,2020-02-01 00:00:00
3,carol,active,2020-03-01 00:00:00,2020-03-01 00:00:00
"""

TYPES = {
    "customer_id": "bigint",
    "deleted_at": "timestamp",
    "_updated_at": "timestamp",
}


@pytest.fixture()
def seed_path(tmp_path):
    p = tmp_path / "customers_seed.csv"
    p.write_text(CSV)
    return str(p)


def test_types_and_nulls(spark, seed_path):
    df = load_seed(spark, seed_path, TYPES)
    types = dict(df.dtypes)
    assert types["customer_id"] == "bigint"
    assert types["deleted_at"] == "timestamp"
    assert types["_updated_at"] == "timestamp"
    assert types["name"] == "string"
    # empty CSV cell → NULL (agate/dbt seed behavior)
    assert df.filter(F.col("deleted_at").isNull()).count() == 3


def test_unknown_column_override_raises(spark, seed_path):
    with pytest.raises(ValueError, match="not in the seed"):
        load_seed(spark, seed_path, {"no_such_col": "int"})


def test_seed_feeds_scd2(spark, seed_path):
    cfg = ScdConfig(
        unique_key=("customer_id",),
        deleted_at_column="deleted_at",
        default_valid_to="2200-01-01 00:00:00",
    )
    out = scd2_initial_load(load_seed(spark, seed_path, TYPES), cfg)
    # customer 1: two versions; customer 3 born-deleted ('D')
    assert out.filter(F.col("customer_id") == 1).count() == 2
    assert (
        out.filter(F.col("customer_id") == 3).select("_change_type").first()[0]
        == "D"
    )
