"""Streaming windowed aggregation with event-time watermarks.

The streaming twin of the batch ``events_daily_rollup`` query: tumbling
event-time windows with a watermark bounding late data, so state is evicted
once a window can no longer change.  This is the standard Structured
Streaming shape for rollups over an event stream (readStream → withWatermark
→ window agg → writeStream) — all JVM-side, no UDFs.

The decimal cast on the value sum matches the batch query's rationale:
decimal accumulation is order-independent, so a streaming rollup and the
batch rollup of the same data agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_rollup(
    stream: DataFrame,
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    window_duration: str = "1 day",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Tumbling-window counts/sums per group with a late-data watermark.

    Works on both streaming and batch DataFrames (batch ignores the
    watermark), so the same plan serves `foreachBatch` backfills and the
    live stream.
    """
    src = stream
    if stream.isStreaming:
        src = stream.withWatermark(ts_col, watermark_delay)
    return (
        src.groupBy(
            F.window(F.col(ts_col), window_duration).alias("win"),
            *[F.col(c) for c in group_cols],
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *[F.col(c) for c in group_cols],
            "n_events",
            "sum_value",
            "min_value",
            "max_value",
        )
    )
