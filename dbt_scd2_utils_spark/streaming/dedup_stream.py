"""Streaming deduplication for ingest pipelines.

Two shapes, chosen by the state-size/semantics tradeoff:

* :func:`streaming_exact_dedup` — stateful streaming aggregation keyed on
  the content hash (min id + duplicate count).  Survivor selection is
  ``min(id)`` — ORDER-INDEPENDENT, so the complete-mode result equals the
  batch :func:`operators.dedup.exact_dedup` exactly regardless of arrival
  order or partitioning (the property that makes it oracle-checkable; a
  ``dropDuplicates``-style first-seen survivor is racy across partitions).
  State is one entry per distinct content — unbounded over an infinite
  stream; deployments bound it by restarting per epoch/day or by the
  watermarked variant below.

* :func:`streaming_dedup_within_watermark` — bounded-state first-seen
  dedup via ``dropDuplicatesWithinWatermark``: duplicates arriving within
  the event-time watermark of the first copy are dropped, state is evicted
  once the watermark passes, and a copy arriving later than the delay is
  treated as new.  This is the 100-TB ingest shape: state ∝ the watermark
  window, not the corpus.  Operational note (pinned by the tests): the
  watermark lags one micro-batch — eviction in batch N uses the watermark
  computed from batches < N, so a duplicate arriving in the same batch
  that advances the watermark past its state's expiry is still dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Content-hash dedup as a streaming aggregation (complete/update
    mode): one row per distinct content with the min-id survivor and the
    running duplicate count.  Works identically on a batch DataFrame —
    same plan as the batch operator."""
    return (
        stream.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(F.col(id_col)).alias(id_col),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select(id_col, "content_hash", "dup_count")
    )


def streaming_dedup_within_watermark(
    stream: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    delay: str = "1 hour",
) -> DataFrame:
    """Bounded-state streaming dedup: drop rows whose content hash was
    already seen within the event-time watermark; state for a hash is
    evicted once the watermark passes its first arrival + ``delay``."""
    hashed = stream.withColumn("content_hash", F.md5(F.col(text_col)))
    if not stream.isStreaming:
        # batch fallback: plain dedup on the hash (watermark is a
        # streaming-only concept)
        return hashed.dropDuplicates(["content_hash"])
    return hashed.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )
