"""Watermark predicate pushdown through load_table's timestamp
normalization (sources/tables.py::load_table newer_than).

The driver testdata's temporal encoding has changed between rounds
(timestamp[ns] → tz-naive timestamp[us]), so each path is pinned with a
SYNTHETIC parquet fixture of the exact physical type rather than assuming
what /root/testdata currently holds; the driver-dir tests only assert
properties that hold for every encoding (normalized dtype, filter parity,
a pushed watermark comparison).
"""

from __future__ import annotations

from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from dbt_scd2_utils_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
CUT = datetime(2024, 1, 16)

ROWS = [datetime(2024, 1, d, 12, 0, 0) for d in range(1, 32)]


def _write_events(tmp_path, unit: str) -> str:
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(ROWS)), pa.int64()),
            "ts": pa.array(ROWS, pa.timestamp(unit)),
        }
    )
    sf_dir = str(tmp_path / unit)
    (tmp_path / unit).mkdir()
    pq.write_table(tbl, f"{sf_dir}/events.parquet")
    return sf_dir


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _pushed(df) -> str:
    plan = _plan(df)
    assert "PushedFilters:" in plan
    return plan.split("PushedFilters:")[1].split("]")[0]


# -- nanos path (ns ints rebuilt via timestamp_micros(x div 1000)) -------


def test_nanos_rebuild_and_pushdown(spark, tmp_path):
    sf_dir = _write_events(tmp_path, "ns")
    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    # Post-rebuild filter cannot reach the scan: the rebuild expression is
    # not invertible for Catalyst, so only IsNotNull pushes.
    assert "GreaterThan" not in _pushed(ev.filter(F.col("ts") > F.lit(CUT)))
    # newer_than rewrites the cutoff onto the raw long, which pushes.
    pushed = load_table(spark, sf_dir, "events", newer_than=("ts", CUT))
    assert "GreaterThanOrEqual(ts," in _pushed(pushed)
    want = ev.filter(F.col("ts") > F.lit(CUT))
    assert pushed.count() == want.count() > 0
    assert pushed.exceptAll(want).count() == 0


# -- tz-naive micros path (TIMESTAMP_NTZ cast to session-local) ----------


def test_ntz_normalized_and_pushdown(spark, tmp_path):
    sf_dir = _write_events(tmp_path, "us")
    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    pushed = load_table(spark, sf_dir, "events", newer_than=("ts", CUT))
    assert "GreaterThan(ts," in _pushed(pushed)
    want = ev.filter(F.col("ts") > F.lit(CUT))
    assert pushed.count() == want.count() > 0
    assert pushed.exceptAll(want).count() == 0


def test_ns_and_us_read_identically(spark, tmp_path):
    a = load_table(spark, _write_events(tmp_path, "ns"), "events")
    b = load_table(spark, _write_events(tmp_path, "us"), "events")
    assert a.schema == b.schema
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


# -- driver testdata (whatever encoding the current generation uses) -----


def test_driver_events_normalized(spark):
    ev = load_table(spark, SF, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    pushed = load_table(spark, SF, "events", newer_than=("ts", CUT))
    assert "GreaterThan" in _pushed(pushed)  # Than or ThanOrEqual
    want = ev.filter(F.col("ts") > F.lit(CUT))
    assert pushed.count() == want.count() > 0
    assert pushed.exceptAll(want).count() == 0


def test_newer_than_non_watermark_column(spark):
    # lineitem l_shipdate: the predicate applies directly.
    base = load_table(spark, SF, "lineitem")
    dtype = dict(base.dtypes)["l_shipdate"]
    if dtype == "date":
        cut = datetime(1995, 1, 1).date()
    else:
        cut = datetime(1995, 1, 1)
    got = load_table(spark, SF, "lineitem", newer_than=("l_shipdate", cut))
    want = base.filter(F.col("l_shipdate") > F.lit(cut))
    assert got.count() == want.count() > 0


def test_nanos_watermark_correct_under_non_utc_session(spark, tmp_path):
    """The ns-cutoff resolves a naive datetime through the SESSION
    timezone (sources/tables.py::_epoch_micros) — under a non-UTC tz the
    pushed-down raw-long filter must still select exactly the rows a
    post-rebuild timestamp comparison would."""
    sf_dir = _write_events(tmp_path, "ns")
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ev = load_table(spark, sf_dir, "events")
        want = ev.filter(F.col("ts") > F.lit(CUT))
        got = load_table(spark, sf_dir, "events", newer_than=("ts", CUT))
        assert got.count() == want.count() > 0
        assert got.exceptAll(want).count() == 0
        # fixed-offset spelling resolves too
        spark.conf.set("spark.sql.session.timeZone", "+05:30")
        got2 = load_table(spark, sf_dir, "events", newer_than=("ts", CUT))
        want2 = load_table(spark, sf_dir, "events").filter(F.col("ts") > F.lit(CUT))
        assert got2.count() == want2.count() > 0
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
