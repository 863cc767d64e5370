"""Bucketed-catalog deployment: same-bucketed SCD2 tables temporal-join
without exchanging the table sides (sources/tables.py::write_bucketed_table).

Broadcast is disabled for the comparison: at deployment scale both SCD2
tables are far beyond any broadcast budget, so the relevant plan is the
sort-merge join — where bucketing replaces both table-side shuffles with
co-located scans."""

from __future__ import annotations

import datetime as dt
import shutil

import pytest
from pyspark.sql import functions as F

from dbt_scd2_utils_spark import ScdConfig, scd2_initial_load, scd2_join
from dbt_scd2_utils_spark.sources.tables import write_bucketed_table

CFG = ScdConfig(
    unique_key=("k",),
    default_valid_to="2200-01-01 00:00:00",
)


def _scd(spark, versions):
    rows = [
        (k, f"v{i}", dt.datetime(2020, 1 + i, 1))
        for k in range(1, 40)
        for i in range(versions)
    ]
    feed = spark.createDataFrame(rows, "k int, payload string, _updated_at timestamp")
    return scd2_initial_load(feed, CFG)


def _n_exchanges(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count("Exchange")


def _drop(spark, name):
    loc = None
    try:
        if spark.catalog.tableExists(name):
            loc = spark.sql(f"describe formatted {name}").filter(
                F.col("col_name") == "Location"
            ).first()
    except Exception:
        pass
    spark.sql(f"drop table if exists {name}")
    if loc is not None:
        shutil.rmtree(loc["data_type"].removeprefix("file:"), ignore_errors=True)


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_drops_table_side_exchanges(spark, no_broadcast):
    a, b = _scd(spark, 3), _scd(spark, 2)
    for t in ("scd_a", "scd_b"):
        _drop(spark, t)
    try:
        # Bucket count matches spark.sql.shuffle.partitions: the bucketed
        # scans' distribution satisfies the join requirement directly.
        # (Mismatched counts re-shuffle — same as a real cluster, where
        # the bucket count is a deployment decision.)
        n = int(spark.conf.get("spark.sql.shuffle.partitions"))
        write_bucketed_table(a, "scd_a", ("k",), buckets=n)
        write_bucketed_table(b, "scd_b", ("k",), buckets=n)
        ta, tb = spark.table("scd_a"), spark.table("scd_b")

        plain = scd2_join([a, b], ["k"], default_valid_to=CFG.default_valid_to)
        bucketed = scd2_join([ta, tb], ["k"], default_valid_to=CFG.default_valid_to)

        # Same result...
        assert bucketed.count() == plain.count() > 0
        assert bucketed.exceptAll(plain.select(*bucketed.columns)).count() == 0
        # ...with the two table-side shuffles gone (only the derived
        # spine's exchanges remain).
        assert _n_exchanges(bucketed) <= _n_exchanges(plain) - 2
    finally:
        for t in ("scd_a", "scd_b"):
            _drop(spark, t)
