"""Gap-boundary semantics of operators/sessions.py."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dbt_scd2_utils_spark.operators.sessions import session_stats, sessionize

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, offsets_secs, user_id=1):
    rows = [
        (i, user_id, T0 + dt.timedelta(seconds=s), float(i))
        for i, s in enumerate(offsets_secs)
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


def test_gap_exactly_at_threshold_does_not_split(spark):
    # gaps: 1800s (== threshold, same session), 1801s (> threshold, new)
    df = _events(spark, [0, 1800, 3601])
    out = sessionize(df, gap_seconds=1800).orderBy("event_id").collect()
    assert [r.session_idx for r in out] == [1, 1, 2]


def test_first_event_starts_session_one(spark):
    out = sessionize(_events(spark, [0])).collect()
    assert out[0].session_idx == 1


def test_sessions_are_per_user(spark):
    a = _events(spark, [0, 10], user_id=1)
    b = _events(spark, [5], user_id=2)
    out = sessionize(a.unionByName(b)).orderBy("user_id", "event_id").collect()
    assert [(r.user_id, r.session_idx) for r in out] == [(1, 1), (1, 1), (2, 1)]


def test_tiebreak_on_event_id_at_equal_ts(spark):
    # two events at the identical timestamp: ordering must be total
    # (event_id asc), and they belong to one session.
    df = _events(spark, [0, 0, 4000])
    out = sessionize(df).orderBy("event_id").collect()
    assert [r.session_idx for r in out] == [1, 1, 2]


def test_session_stats_rollup(spark):
    df = _events(spark, [0, 60, 4000, 4030])
    out = {
        r.session_idx: r
        for r in session_stats(df).filter(F.col("user_id") == 1).collect()
    }
    assert out[1].n_events == 2 and out[2].n_events == 2
    assert out[1].duration_us == 60_000_000
    assert out[2].duration_us == 30_000_000
    assert out[1].session_start == T0
    assert out[2].session_end == T0 + dt.timedelta(seconds=4030)
    assert out[1].sum_value == 1.0  # 0.0 + 1.0
