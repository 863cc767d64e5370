"""asof_join vs DuckDB's native ASOF JOIN (operators/asof.py)."""

from __future__ import annotations

from datetime import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

from dbt_scd2_utils_spark.operators.asof import asof_join


def _left(spark):
    rows = [
        (1, 100, datetime(2024, 1, 5)),
        (2, 100, datetime(2024, 1, 1)),
        (3, 100, datetime(2024, 1, 10)),
        (4, 200, datetime(2024, 1, 2)),
        (5, 300, datetime(2024, 1, 2)),
    ]
    return spark.createDataFrame(rows, "event_id long, k long, ts timestamp")


def _right(spark):
    rows = [
        (100, datetime(2024, 1, 2), "a", 1.0),
        (100, datetime(2024, 1, 5), "b", 2.0),
        (100, datetime(2024, 1, 7), "c", 3.0),
        (200, datetime(2024, 1, 3), "d", 4.0),  # after the only left row
    ]
    return spark.createDataFrame(rows, "k long, vts timestamp, v string, x double")


def test_matches_duckdb_asof(spark):
    got = (
        asof_join(_left(spark), _right(spark), on="k", left_ts="ts", right_ts="vts")
        .orderBy("event_id")
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        "create table l(event_id bigint, k bigint, ts timestamp);"
        "create table r(k bigint, vts timestamp, v varchar, x double)"
    )
    con.executemany("insert into l values (?,?,?)", [list(x) for x in _left(spark).collect()])
    con.executemany("insert into r values (?,?,?,?)", [list(x) for x in _right(spark).collect()])
    want = con.execute(
        "select l.event_id, l.k, l.ts, r.v, r.x from l "
        "asof left join r on l.k = r.k and l.ts >= r.vts order by l.event_id"
    ).fetchall()
    assert [tuple(row) for row in got] == [tuple(w) for w in want]


def test_inclusive_at_equal_instant(spark):
    got = {
        r["event_id"]: r["v"]
        for r in asof_join(
            _left(spark), _right(spark), on="k", left_ts="ts", right_ts="vts"
        ).collect()
    }
    assert got[1] == "b"  # exact-timestamp version matches
    assert got[2] is None  # before any version
    assert got[3] == "c"
    assert got[4] is None  # right row is later than the left row
    assert got[5] is None  # key absent from right


def test_tolerance_nulls_stale_matches(spark):
    got = {
        r["event_id"]: r["v"]
        for r in asof_join(
            _left(spark),
            _right(spark),
            on="k",
            left_ts="ts",
            right_ts="vts",
            tolerance_seconds=24 * 3600,
        ).collect()
    }
    assert got[1] == "b"  # same-day match survives
    assert got[3] is None  # 3 days stale > 1 day tolerance


def test_right_order_tiebreak(spark):
    left = spark.createDataFrame(
        [(1, 9, datetime(2024, 1, 5))], "event_id long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (9, datetime(2024, 1, 5), "low", 1.0),
            (9, datetime(2024, 1, 5), "high", 2.0),
        ],
        "k long, vts timestamp, v string, x double",
    )
    got = asof_join(
        left, right, on="k", left_ts="ts", right_ts="vts", right_order=("x",)
    ).collect()
    assert got[0]["v"] == "high"  # last in ascending x order wins


def test_null_keys_never_match(spark):
    # DuckDB ASOF JOIN equality semantics: NULL = NULL is NOT a match.
    # A NULL-key left row must come through as no-match even when
    # NULL-key right rows exist at-or-before its timestamp.
    left = spark.createDataFrame(
        [(1, None, datetime(2024, 1, 5)), (2, 100, datetime(2024, 1, 5))],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (None, datetime(2024, 1, 1), "nullmatch", 0.0),
            (100, datetime(2024, 1, 2), "a", 1.0),
        ],
        "k long, vts timestamp, v string, x double",
    )
    got = {
        r["event_id"]: r["v"]
        for r in asof_join(left, right, on="k", left_ts="ts", right_ts="vts").collect()
    }
    assert got[1] is None  # NULL key: preserved, but never matched
    assert got[2] == "a"

    con = duckdb.connect()
    con.execute(
        "create table l(event_id bigint, k bigint, ts timestamp);"
        "create table r(k bigint, vts timestamp, v varchar, x double)"
    )
    con.executemany("insert into l values (?,?,?)", [list(x) for x in left.collect()])
    con.executemany("insert into r values (?,?,?,?)", [list(x) for x in right.collect()])
    want = {
        row[0]: row[1]
        for row in con.execute(
            "select l.event_id, r.v from l asof left join r "
            "on l.k = r.k and l.ts >= r.vts"
        ).fetchall()
    }
    assert got == want


def test_payload_collision_raises(spark):
    with pytest.raises(ValueError, match="collides"):
        asof_join(
            _left(spark).withColumn("v", F.lit("z")),
            _right(spark),
            on="k",
            left_ts="ts",
            right_ts="vts",
        )


def test_plan_has_single_shuffle_no_join(spark):
    df = asof_join(_left(spark), _right(spark), on="k", left_ts="ts", right_ts="vts")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union+window, not a join operator
    assert plan.count("Exchange hashpartitioning") == 1
