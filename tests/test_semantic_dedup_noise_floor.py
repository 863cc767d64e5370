"""semantic_dedup_pq consumer parity at the quantization noise floor
(r8 VERDICT #7): the planted-twin gate corpus passes at cosine >= 0.9
with recall 1.00 because the twins sit far above the PQ noise floor.
This test builds a corpus whose near-neighbor cosines STRADDLE the 0.9
threshold by less than the SDC quantization error, and pins

1. SDC-only thresholding DIVERGES from the exact graph's cluster
   structure (the regime BASELINE §round-7d says rerank exists for), and
2. knn_graph_pq(rerank=20) recovers EXACT cluster parity with the
   knn_graph path — the consumer composition q_semantic_dedup_pq ships.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from dbt_scd2_utils_spark.operators.clustering import dedup_clusters
from dbt_scd2_utils_spark.operators.similarity import knn_graph, knn_graph_pq

DIMS = 16
KW = dict(k=5, dims=DIMS, bands=8, rows_per_band=4)  # shared blocking
PQ = dict(m=4, ksub=8)  # coarse codebook: large quantization error
THRESH = 0.9


def _noise_floor_corpus():
    """150 vectors: 50 Gaussian bases; bases 0..39 get a twin (id+1000)
    perturbed so the TRUE cosine lands in [0.86, 0.94] — within the
    coarse m=4/ksub=8 codebook's estimation error of the 0.9 gate —
    plus 60 unrelated fillers."""
    rng = random.Random(23)
    rows = []
    for i in range(50):
        rows.append((i, [rng.gauss(0, 1) for _ in range(DIMS)]))
    for i in range(40):
        base = rows[i][1]
        # eps tuned per pair: spread true cosines across the threshold
        # (cos ~ 1/sqrt(1 + 16*eps^2/|u|^2); eps 0.36-0.60 puts them
        # in ~[0.86, 0.94] around the 0.9 gate)
        eps = 0.36 + 0.03 * (i % 9)
        rows.append(
            (1000 + i, [x + rng.gauss(0, eps) for x in base])
        )
    for j in range(60):
        rows.append((2000 + j, [rng.gauss(0, 1) for _ in range(DIMS)]))
    return rows


def _clusters(spark, corpus_df, edges_df):
    got = dedup_clusters(
        corpus_df.select("vec_id"), edges_df, id_col="vec_id"
    )
    return {
        (r.vec_id, r.cluster_rep, r.is_canonical) for r in got.collect()
    }


def _edge_consumer(graph, score_col, cutoff):
    return (
        graph.filter(F.col(score_col) >= cutoff)
        .filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
        .distinct()
    )


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.createDataFrame(
        _noise_floor_corpus(), "vec_id long, embedding array<double>"
    ).persist()
    df.count()
    yield df
    df.unpersist()


def test_corpus_straddles_threshold(spark, corpus):
    """Sanity: the construction must put true twin cosines on BOTH sides
    of 0.9 (otherwise the test degenerates to the easy planted-twin
    regime the existing gates already cover)."""
    exact = knn_graph(corpus, **KW)
    twin_cos = {
        r.src: r.cosine_sim
        for r in exact.filter(
            (F.col("src") >= 1000) & (F.col("src") < 2000)
            & (F.col("dst") == F.col("src") - 1000)
        ).collect()
    }
    above = sum(1 for c in twin_cos.values() if c >= THRESH)
    below = sum(1 for c in twin_cos.values() if c < THRESH)
    assert above >= 8, f"need twins above 0.9, got {above}"
    assert below >= 8, f"need twins below 0.9, got {below}"
    # and some sit CLOSE to the gate — the noise-floor regime
    near = sum(1 for c in twin_cos.values() if abs(c - THRESH) < 0.03)
    assert near >= 5, f"need near-threshold twins, got {near}"


def test_sdc_only_diverges_and_rerank_recovers_parity(spark, corpus):
    exact_clusters = _clusters(
        spark,
        corpus,
        _edge_consumer(
            knn_graph(corpus, **KW), "cosine_sim", THRESH
        ),
    )

    # SDC-only: threshold the micro-quantized ESTIMATE (x1e6).  At the
    # noise floor the estimate crosses 0.9 the wrong way for some pairs,
    # so the cluster structure must differ — this is the documented
    # divergence rerank exists to fix, pinned so it stays visible.
    sdc_clusters = _clusters(
        spark,
        corpus,
        _edge_consumer(
            knn_graph_pq(corpus, **KW, **PQ),
            "sdc_cos_micro",
            int(THRESH * 1_000_000),
        ),
    )
    assert sdc_clusters != exact_clusters, (
        "SDC-only thresholding matched the exact clusters on a "
        "noise-floor corpus — the corpus no longer exercises the "
        "quantization margin this test exists for"
    )

    # rerank=20 (IVFADC+R): exact cosines on the SDC top-20, same 0.9
    # gate — cluster parity with the exact graph path (the consumer
    # guarantee q_semantic_dedup_pq / q_cluster_balanced_sample rely on).
    rr_clusters = _clusters(
        spark,
        corpus,
        _edge_consumer(
            knn_graph_pq(corpus, rerank=20, **KW, **PQ), "cosine_sim", THRESH
        ),
    )
    assert rr_clusters == exact_clusters


def test_rerank_vectorized_encode_same_clusters(spark, corpus):
    """The r9 consumer composition (shared codebooks semantics +
    vectorized encode) must not move the noise-floor clusters either:
    encode path is pinned bit-equal, so the cluster sets are identical."""
    kw = dict(KW)
    a = _clusters(
        spark,
        corpus,
        _edge_consumer(
            knn_graph_pq(corpus, rerank=20, **kw, **PQ), "cosine_sim", THRESH
        ),
    )
    b = _clusters(
        spark,
        corpus,
        _edge_consumer(
            knn_graph_pq(corpus, rerank=20, vectorized_encode=True, **kw, **PQ),
            "cosine_sim",
            THRESH,
        ),
    )
    assert a == b
