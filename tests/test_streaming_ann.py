"""Streaming ANN probe ≡ batch ANN regardless of batch boundaries
(streaming/ann_stream.py::streaming_lsh_probe)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from dbt_scd2_utils_spark.operators.similarity import (
    load_lsh_index,
    lsh_ann_topk,
    lsh_index,
    save_lsh_index,
)
from dbt_scd2_utils_spark.sources.tables import load_table
from dbt_scd2_utils_spark.streaming.ann_stream import (
    read_probe_output,
    streaming_lsh_probe,
)

SF = "/root/testdata/sf0.001"


def test_stream_probe_equals_batch_across_splits(spark):
    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    base = tempfile.mkdtemp(prefix="t_stream_ann_")
    save_lsh_index(lsh_index(corpus), f"{base}/idx")
    # 5 files → 5 micro-batches
    new.repartition(5).write.parquet(f"{base}/src")
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/src")
    )
    q = streaming_lsh_probe(
        stream, load_lsh_index(spark, f"{base}/idx"), f"{base}/out", k=5
    )
    assert q.awaitTermination(600), "stream did not drain in time"
    streamed = read_probe_output(spark, f"{base}/out")
    batch = lsh_ann_topk(corpus, queries=new, k=5)
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
    # neighbors come from the indexed corpus only
    assert streamed.filter(F.col("neighbor_id") % 5 == 0).count() == 0

    # empty-output reader is typed and empty
    empty = read_probe_output(spark, f"{base}/never")
    assert empty.count() == 0 and "cosine_sim" in empty.columns
