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


def streaming_minhash_novelty(
    stream: DataFrame,
    corpus_df: DataFrame,
    out_path: str,
    corpus_index: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    k: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
):
    """Streaming ingest novelty check: every micro-batch of NEW documents
    probes the STATIC corpus's banded MinHash index and appends one
    ``(id, n_dup_matches, is_novel)`` row per document to ``out_path``.

    ``foreachBatch`` is deliberate — it reuses the batch
    :func:`operators.dedup.minhash_novelty` verbatim per micro-batch (the
    standard Structured-Streaming pattern for batch-operator reuse), and
    because each document's novelty depends ONLY on the static index,
    the union of per-batch outputs is IDENTICAL to running the batch
    operator on the whole feed — arrival order and batch boundaries
    can't change it, which is what makes the stream oracle-checkable
    against the batch SQL twin.

    Exactly-once output (round-5 ADVICE fix): each micro-batch writes its
    own ``epoch=N`` partition with DYNAMIC partition overwrite, so a
    RETRIED micro-batch (foreachBatch is at-least-once) replaces its own
    prior partial output instead of double-appending — the
    union-of-batches ≡ batch-operator equivalence holds across failure
    recovery WITHIN one stream lineage.  ``out_path`` is owned by that
    lineage: an independent run (new checkpoint) must use a fresh
    directory — see streaming/io_utils.py for the contract.  Read the
    result back with :func:`read_novelty_output` (drops the bookkeeping
    ``epoch`` column and returns an empty, correctly-typed frame when no
    batch ever wrote).

    At deployment ``corpus_index`` is :func:`operators.dedup.load_minhash_index`
    read from its persisted parquet (band-partitioned); pass ``corpus_df``
    persisted so the exact-verification side doesn't recompute shingles
    per batch.  Returns the started StreamingQuery; await it, then read
    ``out_path``."""
    from ..operators.dedup import minhash_novelty

    def _probe(batch_df: DataFrame, epoch: int) -> None:
        out = minhash_novelty(
            batch_df,
            corpus_df,
            id_col=id_col,
            text_col=text_col,
            shingle_n=shingle_n,
            k=k,
            bands=bands,
            threshold=threshold,
            corpus_index=corpus_index,
        )
        (
            out.withColumn("epoch", F.lit(int(epoch)).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(out_path)
        )

    return (
        stream.writeStream.foreachBatch(_probe)
        .trigger(availableNow=True)
        .start()
    )


def read_novelty_output(
    spark, out_path: str, id_col: str = "doc_id", id_type: str = "long"
) -> DataFrame:
    """Read :func:`streaming_minhash_novelty`'s output directory:
    drops the per-epoch bookkeeping partition column; empty-safe when
    the stream never produced a batch; real read failures propagate
    (streaming/io_utils.py — which also documents the
    one-lineage-per-directory ownership contract)."""
    from .io_utils import read_epoch_partitioned

    return read_epoch_partitioned(
        spark,
        out_path,
        f"{id_col} {id_type}, n_dup_matches long, is_novel boolean",
    )
