"""Streaming sessionization with Spark's native session windows.

The streaming twin of ``operators/sessions.py``: where the batch operator
derives gap islands with lag + running sum (a shape streaming cannot run —
no windows over unbounded input), the stream uses ``F.session_window``,
Spark's built-in merging session window: state per (key, open session),
sessions merged when event windows overlap, state evicted and the final
row emitted once the event-time watermark passes the session's end.  This
is the idiomatic Structured Streaming form — all JVM-side, no UDFs, no
custom state store code (contrast streaming/scd2_state.py, where custom
state IS required).

Boundary semantics match the batch operator: Spark merges session
windows that MEET as well as overlap, so two events exactly ``gap``
apart share a session (``diff > gap`` splits — the same rule batch
``sessionize`` uses; pinned empirically by
tests/test_streaming_sessions.py::test_touching_windows_merge).  The
emitted ``window_end`` is ``last event ts + gap`` (the instant the
session *expired*), not the last event timestamp.

Works on batch DataFrames too (watermark skipped, identical grouping), so
one definition serves backfill and live paths — same pattern as
``streaming/rollup.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_window_rollup(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap: str = "30 minutes",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """One row per (user, merged session window): bounds + count + sum.

    Streaming: append mode emits a session only once the watermark
    reaches its end (last event + gap, inclusive), i.e. once it can no
    longer merge with late events.
    """
    src = stream
    if stream.isStreaming:
        src = stream.withWatermark(ts_col, watermark_delay)
    return (
        src.groupBy(
            F.session_window(F.col(ts_col), gap).alias("win"),
            F.col(user_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col(user_col),
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )


def session_window_rollup_sql(
    source_sql: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    gap_seconds: int = 1800,
    emitted_before_sql: str | None = None,
) -> str:
    """DuckDB oracle: gap islands under Spark's session_window rule
    (touching windows merge — only a gap STRICTLY greater than
    ``gap_seconds`` splits, same as the batch operator), with
    ``window_end = last ts + gap``.  ``emitted_before_sql`` (a scalar
    subquery) restricts to watermark-closed sessions for the streaming
    append-mode drain."""
    gap_us = int(gap_seconds) * 1_000_000
    # Emission is inclusive — a session whose end equals the final
    # watermark IS emitted (pinned by tests/test_streaming_sessions.py's
    # boundary case; Spark's state eviction predicate is end <= watermark).
    having = (
        f"having max(t_us) + {gap_us} <= ({emitted_before_sql})"
        if emitted_before_sql
        else ""
    )
    return f"""
select {user_col},
  min({ts_col}) as session_start,
  cast(make_timestamp(max(t_us) + {gap_us}) as timestamp) as window_end,
  count(*) as n_events,
  cast(sum(cast({value_col} as decimal(18,2))) as double) as sum_value
from (
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
)
group by {user_col}, session_idx
{having}
"""
