"""Watermark predicate pushdown through the nanos-timestamp rebuild
(sources/tables.py::load_table newer_than)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from dbt_scd2_utils_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
CUT = datetime(2024, 1, 16)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_post_rebuild_filter_does_not_push(spark):
    events = load_table(spark, SF, "events")
    plan = _plan(events.filter(F.col("ts") > F.lit(CUT)))
    # The rebuilt-column filter stays above the scan: only IsNotNull pushes.
    assert "PushedFilters: [IsNotNull(ts)]" in plan


def test_newer_than_pushes_to_scan(spark):
    pushed = load_table(spark, SF, "events", newer_than=("ts", CUT))
    plan = _plan(pushed)
    assert "GreaterThanOrEqual(ts," in plan.split("PushedFilters:")[1]


def test_newer_than_equals_post_filter(spark):
    events = load_table(spark, SF, "events")
    want = events.filter(F.col("ts") > F.lit(CUT))
    got = load_table(spark, SF, "events", newer_than=("ts", CUT))
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_newer_than_non_nanos_column(spark):
    # lineitem l_shipdate is a regular date/timestamp column: the predicate
    # applies directly (and pushes as a plain comparison).
    import duckdb

    base = load_table(spark, SF, "lineitem")
    dtype = dict(base.dtypes)["l_shipdate"]
    if dtype == "date":
        cut = datetime(1995, 1, 1).date()
    else:
        cut = datetime(1995, 1, 1)
    got = load_table(spark, SF, "lineitem", newer_than=("l_shipdate", cut))
    want = base.filter(F.col("l_shipdate") > F.lit(cut))
    assert got.count() == want.count() > 0
