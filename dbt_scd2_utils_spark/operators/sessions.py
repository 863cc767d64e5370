"""Gap-based event sessionization and per-session rollups.

Beyond-reference surface (BASELINE.json north-star): the standard
interaction-log preprocessing step for behavioural training data — group a
user's event stream into sessions separated by an inactivity gap, then
roll each session up to one row of features.

Semantics: events are ordered per user by (event time, event id); a new
session starts at the first event or whenever the gap to the previous
event exceeds ``gap_seconds``.  ``session_idx`` is the 1-based session
counter within the user (a running sum of session-start flags — the same
lag + cumulative-sum shape as the reference's ``conditional_change_event``
emulation, functions/audit.py).

Determinism / oracle design: all time arithmetic is on microsecond
integers (`unix_micros` ⟷ DuckDB `epoch_us`), so gap comparisons and
durations are exact int64 in both engines; the event-id tiebreak makes
the ordering total.  Aggregates are count/min/max/decimal-sum — no
float accumulation order dependence (sum follows events_daily_rollup's
decimal(18,2)→double pattern).

Scale shape: ONE shuffle on ``user_col`` for the session window; the
rollup's groupBy(user, session_idx) is a sub-grouping of that partitioning,
so its exchange moves only map-side-combined partials — one row per
(user, session), not per event.  Per-user work is linear; a single
pathological user hot-partitions the window exactly like the SCD2
window chain (see operators/scd2.py skew note — same mitigation ladder).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_us(ts_col: str) -> Column:
    """Microseconds since epoch; accepts TIMESTAMP and TIMESTAMP_NTZ.

    ``unix_micros`` rejects NTZ input, and parquet µs-naive columns load as
    NTZ.  The cast is a no-op for TIMESTAMP and interprets NTZ wall-clock
    in the session timezone (pinned UTC by session.get_spark), which is
    exactly DuckDB's ``epoch_us`` of the same naive value."""
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Input events + ``session_idx`` (1-based per-user session counter)."""
    gap_us = int(gap_seconds) * 1_000_000
    t = _epoch_us(ts_col)
    w = Window.partitionBy(user_col).orderBy(t.asc(), F.col(id_col).asc())
    prev = F.lag(t).over(w)
    is_new = prev.isNull() | ((t - prev) > gap_us)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn(
        "session_idx", F.sum(is_new.cast("long")).over(run)
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    gap_seconds: int = 1800,
) -> DataFrame:
    """One row per (user, session): bounds, duration, size, value sum."""
    s = sessionize(events, user_col, ts_col, id_col, gap_seconds)
    t = _epoch_us(ts_col)
    return (
        s.groupBy(user_col, "session_idx")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            (F.max(t) - F.min(t)).alias("duration_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


def sessionize_sql(
    source_sql: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> str:
    gap_us = int(gap_seconds) * 1_000_000
    return f"""
select *,
  cast(sum(is_new) over (
    partition by {user_col} order by t_us asc, {id_col} asc
    rows between unbounded preceding and current row
  ) as bigint) as session_idx
from (
  select *,
    cast(prev_us is null or t_us - prev_us > {gap_us} as bigint) as is_new
  from (
    select *, epoch_us({ts_col}) as t_us,
      lag(epoch_us({ts_col})) over (
        partition by {user_col} order by epoch_us({ts_col}) asc, {id_col} asc
      ) as prev_us
    from ({source_sql})
  )
)
"""


def session_stats_sql(
    source_sql: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    gap_seconds: int = 1800,
) -> str:
    inner = sessionize_sql(source_sql, user_col, ts_col, id_col, gap_seconds)
    return f"""
select {user_col}, session_idx,
  min({ts_col}) as session_start,
  max({ts_col}) as session_end,
  max(t_us) - min(t_us) as duration_us,
  count(*) as n_events,
  cast(sum(cast({value_col} as decimal(18,2))) as double) as sum_value
from ({inner})
group by {user_col}, session_idx
"""
