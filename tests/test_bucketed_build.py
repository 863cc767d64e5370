"""Bucketed ScdTable: incremental rewrites touch only affected bucket
partitions and the result equals the unbucketed build."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dbt_scd2_utils_spark import ScdConfig
from dbt_scd2_utils_spark.plans.build import BUCKET_COL, ScdTable
from tests.fixtures.seeds import CUSTOMERS_RAW, CUSTOMERS_SCHEMA

CFG = ScdConfig(unique_key=("customer_id",), deleted_at_column="deleted_at")


def _mtimes(path):
    out = {}
    for b in os.listdir(path):
        if b.startswith(f"{BUCKET_COL}="):
            d = os.path.join(path, b)
            out[b] = max(
                os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)
            )
    return out


def test_bucketed_equals_plain_and_prunes_writes(spark, tmp_path):
    plain_path = str(tmp_path / "plain")
    buck_path = str(tmp_path / "bucketed")
    plain = ScdTable(spark, plain_path, CFG)
    bucketed = ScdTable(spark, buck_path, CFG, partition_buckets=8)

    b1 = spark.createDataFrame(CUSTOMERS_RAW[1], CUSTOMERS_SCHEMA)
    plain.build(b1)
    bucketed.build(b1)

    before = _mtimes(buck_path)
    assert len(before) > 1  # keys spread over several buckets

    # Batch 2 touches a subset of keys → only their buckets may be rewritten.
    b2 = spark.createDataFrame(CUSTOMERS_RAW[2], CUSTOMERS_SCHEMA)
    out_plain = plain.build(b2)
    out_buck = bucketed.build(b2)

    # Identical results (modulo row order).
    assert (
        out_plain.exceptAll(out_buck).count() == 0
        and out_buck.exceptAll(out_plain).count() == 0
    )

    after = _mtimes(buck_path)
    untouched = [b for b in before if before[b] == after.get(b)]
    rewritten = [b for b in before if before[b] != after.get(b)]
    assert rewritten, "some buckets must be rewritten"
    assert untouched, "unaffected buckets must NOT be rewritten"


def test_bucketed_read_roundtrip(spark, tmp_path):
    path = str(tmp_path / "rt")
    t = ScdTable(spark, path, CFG, partition_buckets=4)
    b1 = spark.createDataFrame(CUSTOMERS_RAW[1], CUSTOMERS_SCHEMA)
    out = t.build(b1)
    assert BUCKET_COL not in out.columns  # internal column hidden from readers
    assert out.count() > 0
