"""Streaming ANN for embedding-ingest pipelines.

The vector twin of :mod:`streaming.dedup_stream`: every micro-batch of
NEWLY INGESTED vectors probes the PERSISTED banded-LSH signature index
of the static corpus (operators/similarity.save_lsh_index) and appends
its top-k nearest corpus neighbors — the shape of "attach retrieval
context / near-duplicate evidence at ingest time".

Because each new vector's neighbors depend ONLY on the static index,
the union of per-batch outputs is IDENTICAL to running the batch
operator over the whole feed — batch boundaries and arrival order
cannot change it, which is what makes the stream oracle-checkable
against the batch SQL twin.  Output is epoch-idempotent (dynamic
partition overwrite per micro-batch), so an at-least-once foreachBatch
retry replaces its own prior output instead of double-appending.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_lsh_probe(
    stream: DataFrame,
    corpus_index: DataFrame,
    out_path: str,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 8,
    rows_per_band: int = 8,
    dims: int = 64,
):
    """Probe the static LSH index with each micro-batch of new vectors;
    append (query_id, rank, neighbor_id, cosine_sim) per new vector.
    ``corpus_index`` is :func:`operators.similarity.load_lsh_index`
    (band geometry must match ``bands × rows_per_band``).  Returns the
    started StreamingQuery; await it, then read the result back with
    :func:`read_probe_output`."""
    from ..operators.similarity import lsh_ann_topk

    def _probe(batch_df: DataFrame, epoch: int) -> None:
        out = lsh_ann_topk(
            batch_df,  # unused for the corpus side: index supplies it
            queries=batch_df,
            k=k,
            id_col=id_col,
            vec_col=vec_col,
            bands=bands,
            rows_per_band=rows_per_band,
            dims=dims,
            index=corpus_index,
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


def read_probe_output(spark, out_path: str) -> DataFrame:
    """Read :func:`streaming_lsh_probe`'s output: drops the per-epoch
    bookkeeping column; empty-safe when no batch ever wrote; real read
    failures propagate (streaming/io_utils.py — which also documents
    the one-lineage-per-directory ownership contract)."""
    from .io_utils import read_epoch_partitioned

    return read_epoch_partitioned(
        spark,
        out_path,
        "query_id long, rank long, neighbor_id long, cosine_sim double",
    )


def streaming_ivf_pq_probe(
    stream: DataFrame,
    encoded: DataFrame,
    coarse: DataFrame,
    codebooks: DataFrame,
    out_path: str,
    dim: int,
    k: int = 5,
    nprobe: int = 2,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """The quantized-index twin of :func:`streaming_lsh_probe`: each
    micro-batch of newly ingested vectors probes the PERSISTED IVF-PQ
    index (operators/similarity.save_ivf_pq_index + the coarse/codebook
    artifacts it was built with) for its top-k corpus neighbors via
    ADC scoring restricted to ``nprobe`` cells — the sublinear probe
    path, which is the index actually deployed at billion-vector scale.

    Same oracle-checkability argument as the LSH probe: per-vector
    results depend only on the static artifacts, so the drained union
    equals the batch ``ivf_pq_topk(encoded=...)`` over the whole feed;
    batch boundaries and arrival order cannot change it.  Output
    (query_id, rank, neighbor_id, score_micro) is epoch-idempotent
    (dynamic partition overwrite per micro-batch)."""
    from ..operators.similarity import ivf_pq_topk

    def _probe(batch_df: DataFrame, epoch: int) -> None:
        out = ivf_pq_topk(
            batch_df,  # unused for the corpus side: encoded supplies it
            queries=batch_df,
            dim=dim,
            k=k,
            nprobe=nprobe,
            m=m,
            id_col=id_col,
            vec_col=vec_col,
            coarse=coarse,
            codebooks=codebooks,
            encoded=encoded,
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


def read_ivf_pq_probe_output(spark, out_path: str) -> DataFrame:
    """Read :func:`streaming_ivf_pq_probe`'s output (drops the epoch
    bookkeeping column; empty-safe)."""
    from .io_utils import read_epoch_partitioned

    return read_epoch_partitioned(
        spark,
        out_path,
        "query_id long, rank long, neighbor_id long, score_micro long",
    )
