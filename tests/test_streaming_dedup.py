"""Streaming deduplication (streaming/dedup_stream.py): complete-mode
content-hash aggregation vs the batch operator, and bounded-state
dropDuplicatesWithinWatermark semantics (drop within delay, re-admit after
state eviction)."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from dbt_scd2_utils_spark.operators.dedup import exact_dedup
from dbt_scd2_utils_spark.streaming.dedup_stream import (
    streaming_dedup_within_watermark,
    streaming_exact_dedup,
)

SCHEMA = "doc_id long, text string, ts timestamp"


def test_streaming_exact_dedup_equals_batch(spark, tmp_path):
    import datetime as dt

    t = dt.datetime(2024, 1, 1, 10, 0)
    rows = [
        (1, "alpha beta", t),
        (2, "alpha beta", t),  # dup of 1
        (3, "gamma", t),
        (4, "gamma", t),       # dup of 3
        (5, "delta", t),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, SCHEMA).repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName("sde_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not drain in time"
    got = spark.table("sde_test")
    want = exact_dedup(spark.createDataFrame(rows, SCHEMA))
    assert got.exceptAll(want).count() + want.exceptAll(got).count() == 0
    assert got.count() == 3


def test_dedup_within_watermark_drops_then_readmits(spark, tmp_path):
    import datetime as dt

    src = str(tmp_path / "wsrc")
    os.makedirs(src)
    T = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731

    files = [
        [(1, "dup text", T(10)), (2, "other", T(10))],
        [(3, "dup text", T(10, 30))],   # within 1h of first copy → dropped
        [(4, "fresh", T(13))],          # advances the watermark to 12:00 ...
        [(6, "advance", T(13, 10))],    # ... which becomes ACTIVE this batch
        #   (the watermark lags one batch: eviction uses the watermark
        #   computed from batches *before* the current one)
        [(5, "dup text", T(13, 30))],   # state evicted → re-admitted as new
    ]
    for i, rows in enumerate(files):
        sub = os.path.join(src, f"f{i}.parquet")
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(sub)
        # flatten: move the part file up with an ordered name + mtime
        part = next(f for f in os.listdir(sub) if f.endswith(".parquet"))
        dst = os.path.join(src, f"{i:03d}.parquet")
        os.rename(os.path.join(sub, part), dst)
        import shutil

        shutil.rmtree(sub)
        ts = time.time() - 1000 + i
        os.utime(dst, (ts, ts))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_dedup_within_watermark(stream, ts_col="ts", delay="1 hour")
        .writeStream.format("memory")
        .queryName("wde_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not drain in time"
    ids = sorted(r["doc_id"] for r in spark.table("wde_test").collect())
    # 3 dropped (dup within watermark); 5 re-admitted (state evicted once
    # the 12:00 watermark became active)
    assert ids == [1, 2, 4, 5, 6], ids


def test_batch_fallback_plain_dedup(spark):
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, "x", t), (2, "x", t), (3, "y", t)], SCHEMA
    )
    out = streaming_dedup_within_watermark(df)
    assert out.count() == 2
    assert set(r["text"] for r in out.collect()) == {"x", "y"}
