"""Watermarked streaming rollup: stream result == batch result on the same
data (append mode emits only watermark-closed windows; availableNow drains
everything, so all windows close)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_scd2_utils_spark.sources.tables import load_table
from dbt_scd2_utils_spark.streaming.rollup import windowed_rollup

SF = "/root/testdata/sf0.001"


def test_stream_rollup_equals_batch(spark, tmp_path):
    events = load_table(spark, SF, "events")
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    events.coalesce(2).write.parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = (
        windowed_rollup(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain in time"
    got = spark.read.parquet(out)

    # Append mode emits only watermark-closed windows: the final watermark
    # rests at max(ts) - delay, so windows ending after it are (correctly)
    # withheld.  Compare against exactly that closed subset.
    batch = spark.read.parquet(src)
    cutoff = batch.agg(
        (F.max("ts") - F.expr("interval 1 hour")).alias("c")
    ).first()["c"]
    want = windowed_rollup(batch).filter(F.col("window_end") <= F.lit(cutoff))
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_rollup_batch_shape(spark):
    events = load_table(spark, SF, "events")
    out = windowed_rollup(events)
    row = out.orderBy("window_start", "event_type").first()
    assert row["n_events"] > 0
    assert row["window_end"] > row["window_start"]
    # 30 days x 5 event types upper bound
    assert out.count() <= 31 * 5
