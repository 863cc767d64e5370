#!/usr/bin/env python
"""Recall drift of an APPENDED IVF-PQ index vs a RETRAINED one
(operators/similarity.py::ivf_pq_index_append).

The fold-in's documented trade: under fixed coarse/codebook artifacts,
appended vectors are encoded with quantizers trained BEFORE the append,
so recall decays as the appended distribution shifts — the index never
breaks, it just gets gradually less sharp until a retrain
(ann_pq_refresh).  This script measures that decay on the sf0.1
embeddings at two shift levels:

  - no-shift append: the held-out 20% comes from the same distribution;
  - shifted append: the same vectors with a constant offset added to 8
    of 64 dims (a crude topic-drift stand-in).

For each case, recall@10 against the brute-force ground truth over the
post-append corpus, probed by 50 queries drawn FROM THE APPENDED SET
(the vectors whose encoding is stale — base-region queries barely move,
measured in an earlier revision), for (a) the appended index (artifacts
trained on the 80% base) and (b) a fully retrained index (artifacts
trained on the post-append corpus).  The corpus is the planted-twin
emb_corpus so genuine near neighbors exist and recall is meaningful.

Usage: python scripts/append_drift_recall.py
Prints one JSON line per (case, index) and a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _artifacts(emb, train_df, m, ksub, n_cells):
    from pyspark.sql import functions as F

    from dbt_scd2_utils_spark.operators.similarity import (
        _barrier,
        _l2_normalize,
        as_double,
        kmeans_centroids,
        pq_codebooks,
    )

    coarse = _barrier(
        kmeans_centroids(
            train_df.select(
                F.col("vec_id").alias("pid"),
                _l2_normalize(as_double("embedding")).alias("nv"),
            ),
            k=n_cells,
            iters=2,
            id_col="pid",
            vec_col="nv",
        )
    )
    books = _barrier(pq_codebooks(train_df, dim=64, m=m, ksub=ksub))
    return coarse, books


def _recall(topk_rows, truth, k):
    got: dict[int, set] = {}
    for r in topk_rows:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = total = 0
    for qid, true_ids in truth.items():
        hits += len(got.get(qid, set()) & true_ids)
        total += len(true_ids)
    return round(hits / max(total, 1), 3)


def main() -> None:
    from pyspark.sql import functions as F

    from dbt_scd2_utils_spark.operators.similarity import (
        brute_force_topk,
        ivf_pq_encode,
        ivf_pq_index_append,
        ivf_pq_topk,
    )
    from dbt_scd2_utils_spark.session import get_spark
    from dbt_scd2_utils_spark.sources.tables import load_table

    K, M, KSUB, NCELLS, NPROBE = 10, 8, 16, 32, 8
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    spark = get_spark("append-drift", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from dbt_scd2_utils_spark import entry as em

    emb = em.emb_corpus(
        spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ).select("vec_id", F.col("v").alias("embedding")).persist()
    base = emb.filter(F.col("vec_id") % 5 != 0)
    held = emb.filter(F.col("vec_id") % 5 == 0)

    # shifted variant: constant offset on the first 8 dims
    shifted = held.select(
        "vec_id",
        F.expr(
            "transform(embedding, (x, i) -> case when i < 8 "
            "then x + 0.8 else x end)"
        ).alias("embedding"),
    )

    results = []
    for case, appended_vecs in (("no_shift", held), ("shifted", shifted)):
        corpus = base.unionByName(appended_vecs).persist()
        corpus.count()
        # queries come from the APPENDED set — the stalely-encoded region
        queries = appended_vecs.filter(
            F.col("vec_id") % 50 == 0
        ).limit(50).persist()
        # truth = the TRUE nearest neighbor (the planted twin when one
        # exists); the reported number is "true top-1 found in the
        # index's top-10" — recall@10-of-all-10 dilutes the signal with
        # 9 noise neighbors PQ legitimately cannot rank.
        truth_rows = brute_force_topk(corpus, queries, k=1).collect()
        truth: dict[int, set] = {}
        for r in truth_rows:
            truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

        # (a) appended index: artifacts trained on the pre-append base
        t0 = time.perf_counter()
        coarse_b, books_b = _artifacts(emb, base, M, KSUB, NCELLS)
        enc_b = ivf_pq_encode(base, 64, coarse_b, books_b, M).persist()
        enc_app = ivf_pq_index_append(
            enc_b, appended_vecs, 64, coarse_b, books_b, M
        )
        rec_app = _recall(
            ivf_pq_topk(
                corpus, queries, dim=64, k=K, nprobe=NPROBE, m=M,
                coarse=coarse_b, codebooks=books_b, encoded=enc_app,
            ).collect(),
            truth, K,
        )
        t_app = round(time.perf_counter() - t0, 1)

        # (b) retrained index: artifacts trained on the post-append corpus
        t0 = time.perf_counter()
        coarse_f, books_f = _artifacts(emb, corpus, M, KSUB, NCELLS)
        enc_f = ivf_pq_encode(corpus, 64, coarse_f, books_f, M)
        rec_ret = _recall(
            ivf_pq_topk(
                corpus, queries, dim=64, k=K, nprobe=NPROBE, m=M,
                coarse=coarse_f, codebooks=books_f, encoded=enc_f,
            ).collect(),
            truth, K,
        )
        t_ret = round(time.perf_counter() - t0, 1)

        row = {
            "case": case,
            "recall_at_10_appended": rec_app,
            "recall_at_10_retrained": rec_ret,
            "drift": round(rec_ret - rec_app, 3),
            "sec_appended_path": t_app,
            "sec_retrain_path": t_ret,
        }
        results.append(row)
        print(json.dumps(row), flush=True)
        corpus.unpersist()
        queries.unpersist()
        enc_b.unpersist()

    print(json.dumps({"metric": "ivf_pq_append_drift", "rows": results}))


if __name__ == "__main__":
    main()
