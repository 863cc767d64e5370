"""Streaming novelty ≡ batch novelty regardless of batch boundaries
(streaming/dedup_stream.py::streaming_minhash_novelty)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from dbt_scd2_utils_spark.operators.dedup import (
    banded_minhash_index,
    load_minhash_index,
    minhash_novelty,
    save_minhash_index,
)
from dbt_scd2_utils_spark.sources.tables import load_table
from dbt_scd2_utils_spark.streaming.dedup_stream import (
    read_novelty_output,
    streaming_minhash_novelty,
)

SF = "/root/testdata/sf0.001"


def test_stream_equals_batch_across_batch_splits(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 10 != 7).persist()
    newb = docs.filter(F.col("doc_id") % 10 == 7).unionByName(
        corpus.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 900000).alias("doc_id"), "text"
        )
    )
    base = tempfile.mkdtemp(prefix="t_stream_novelty_")
    save_minhash_index(banded_minhash_index(corpus), f"{base}/idx")
    # 6 files → 6 micro-batches at maxFilesPerTrigger=1
    newb.repartition(6).write.parquet(f"{base}/src")
    stream = (
        spark.readStream.schema(newb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/src")
    )
    q = streaming_minhash_novelty(
        stream,
        corpus,
        f"{base}/out",
        corpus_index=load_minhash_index(spark, f"{base}/idx"),
        threshold=0.5,
    )
    assert q.awaitTermination(600), "stream did not drain in time"
    streamed = read_novelty_output(spark, f"{base}/out")
    batch = minhash_novelty(newb, corpus, threshold=0.5)
    assert streamed.count() == newb.count()
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
    # exact copies of corpus docs must be flagged, held-out docs novel
    flagged = {r.id for r in streamed.filter(~F.col("is_novel")).collect()}
    assert any(i >= 900000 for i in flagged)
    corpus.unpersist()


def test_novelty_output_is_epoch_idempotent(spark):
    """A replayed epoch overwrites its own partition instead of
    double-appending (foreachBatch is at-least-once); an output
    directory no batch ever wrote reads back empty, typed."""
    import tempfile

    from dbt_scd2_utils_spark.operators.dedup import minhash_novelty

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 10 != 7)
    newb = docs.filter(F.col("doc_id") % 10 == 7)
    base = tempfile.mkdtemp(prefix="t_novelty_idem_")
    out = f"{base}/out"
    res = minhash_novelty(newb, corpus, threshold=0.5)
    w = lambda: (
        res.withColumn("epoch", F.lit(0).cast("long"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch")
        .parquet(out)
    )
    w()
    n1 = read_novelty_output(spark, out).count()
    w()  # simulated retry of the same epoch
    n2 = read_novelty_output(spark, out).count()
    assert n1 == n2 == newb.count()

    empty = read_novelty_output(spark, f"{base}/never_written")
    assert empty.count() == 0
    assert empty.columns == ["doc_id", "n_dup_matches", "is_novel"]


def test_streaming_curation_gate_equals_batch(spark):
    import tempfile

    from dbt_scd2_utils_spark import entry as em
    from dbt_scd2_utils_spark.operators.text import (
        quality_classifier,
        scrub_pii,
    )

    corpus = em._planted(load_table(spark, SF, "documents"))
    streamed = em.q_streaming_curation_gate(spark, SF)
    scrub = scrub_pii(corpus)
    batch = (
        scrub.select("doc_id", "n_urls", "n_emails", "n_phones")
        .join(
            quality_classifier(
                scrub.select("doc_id", F.col("scrubbed_text").alias("text"))
            ).filter(F.col("keep")),
            "doc_id",
        )
        .select("doc_id", "n_urls", "n_emails", "n_phones", "p_micro")
    )
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
