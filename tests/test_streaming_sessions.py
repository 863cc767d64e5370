"""Native session_window streaming rollup (streaming/sessions.py)."""

from __future__ import annotations

import tempfile
from datetime import datetime

import duckdb
from pyspark.sql import functions as F

from dbt_scd2_utils_spark.sources.tables import load_table
from dbt_scd2_utils_spark.streaming.sessions import (
    session_window_rollup,
    session_window_rollup_sql,
)

SF = "/root/testdata/sf0.001"


def _norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return sorted(tuple(str(v) for v in r) for r in df.itertuples(index=False))


def _drain(spark, df, **kwargs):
    base = tempfile.mkdtemp(prefix="sess_stream_t_")
    src, out, ckpt = f"{base}/src", f"{base}/out", f"{base}/ckpt"
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        session_window_rollup(stream, **kwargs)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not drain in time"
    return spark.read.parquet(out)


def test_batch_matches_strict_gap_oracle(spark):
    got = session_window_rollup(load_table(spark, SF, "events")).toPandas()
    con = duckdb.connect()
    con.sql(f"create view events as select * from '{SF}/events.parquet'")
    want = con.sql(session_window_rollup_sql("select * from events")).df()
    assert _norm(got) == _norm(want)


def test_touching_windows_merge(spark):
    # Two events exactly gap apart MERGE (Spark merges windows that meet,
    # not just strictly overlap — same `diff > gap` split rule as batch
    # sessionize); a gap of gap+1s splits.
    def sessions(gap_offset_s):
        rows = [
            (1, 1, datetime(2024, 1, 1, 0, 0, 0), 1.0),
            (2, 1, datetime(2024, 1, 1, 0, 30, gap_offset_s), 1.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, value double"
        )
        return session_window_rollup(df).count()

    assert sessions(0) == 1
    assert sessions(1) == 2


def test_streaming_emits_watermark_closed_sessions(spark):
    ev = load_table(spark, SF, "events")
    got = _drain(spark, ev).toPandas()
    con = duckdb.connect()
    con.sql(f"create view events as select * from '{SF}/events.parquet'")
    want = con.sql(
        session_window_rollup_sql(
            "select * from events",
            emitted_before_sql="select epoch_us(max(ts) - interval 1 hour) from events",
        )
    ).df()
    assert len(want) > 0
    assert _norm(got) == _norm(want)


def test_emission_inclusive_at_watermark(spark):
    # Session end == final watermark exactly → emitted (pins the <=).
    rows = [
        (1, 1, datetime(2024, 1, 1, 0, 0, 0), 1.0),
        (2, 2, datetime(2024, 1, 1, 1, 30, 0), 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = _drain(spark, df)
    assert [r["user_id"] for r in got.collect()] == [1]
