#!/usr/bin/env python
"""Recall-vs-bands curve for the banded-hyperplane k-NN graph
(operators/similarity.py::knn_graph) on the planted-twin corpus
(entry.py::emb_corpus at sf0.01).

For each (bands, rows_per_band) point: recall of the TRUE nearest
neighbor for vectors with a genuinely close one (cosine >= 0.9, i.e. the
planted twins), plus the candidate-pair count (the cost knob — verification
work ∝ pairs) and wall time.  The curve backs the default choice committed
in similarity.py and the >=0.9 recall floor in tests/test_similarity.py.

Usage: python scripts/recall_curve.py
Prints one JSON line per config and a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import numpy as np

    from dbt_scd2_utils_spark import entry as em
    from dbt_scd2_utils_spark.operators.similarity import (
        _banded,
        _barrier,
        banded_hyperplanes,
        knn_graph,
    )
    from dbt_scd2_utils_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    spark = get_spark("recall-curve", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    emb = em.emb_corpus(spark, "/root/testdata/sf0.01").persist()
    rows = emb.collect()
    ids = [r["vec_id"] for r in rows]
    mat = np.array([r["v"] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    np.fill_diagonal(sims, -2.0)
    true_nn = {
        ids[i]: (ids[int(sims[i].argmax())], sims[i].max()) for i in range(len(ids))
    }
    close = {i: nn for i, (nn, s) in true_nn.items() if s >= 0.9}
    n = len(ids)

    results = []
    for bands, rpb in [(4, 8), (8, 8), (12, 8), (16, 8), (24, 8), (16, 10), (32, 8)]:
        t0 = time.perf_counter()
        got: dict = {}
        g = knn_graph(emb, k=5, id_col="vec_id", vec_col="v",
                      bands=bands, rows_per_band=rpb)
        for r in g.collect():
            got.setdefault(r["src"], set()).add(r["dst"])
        wall = round(time.perf_counter() - t0, 2)
        hits = sum(1 for i, nn in close.items() if nn in got.get(i, set()))
        recall = round(hits / len(close), 3)

        # Candidate cost: Σ per-(band,sig) bucket C(size,2) — the exact
        # number of cosine evaluations the self-join performs.
        bhp = banded_hyperplanes(64, bands, rpb)
        e = _barrier(_banded(emb, "id", "v", "vec_id", "v", bhp))
        buckets = e.groupBy("band", "sig").count().collect()
        pairs = sum(b["count"] * (b["count"] - 1) for b in buckets)
        results.append({
            "bands": bands, "rows_per_band": rpb, "recall": recall,
            "candidate_pairs": pairs, "n_vectors": n, "close_pairs": len(close),
            "wall_s": wall,
        })
        print(json.dumps(results[-1]))

    print(json.dumps({"metric": "knn_recall_curve", "points": results, "cpus": cpus}))


def main_sdc() -> None:
    """--sdc: recall of the SDC-scored graph (knn_graph_pq) and its
    exact-rerank mode vs the exact graph, at the default band config on
    the planted-twin corpus — the measured quantization recall cost
    behind BASELINE §round-7d."""
    import numpy as np

    from dbt_scd2_utils_spark import entry as em
    from dbt_scd2_utils_spark.operators.similarity import (
        knn_graph,
        knn_graph_pq,
    )
    from dbt_scd2_utils_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    spark = get_spark("recall-curve-sdc", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    emb = em.emb_corpus(spark, "/root/testdata/sf0.01").persist()
    rows = emb.collect()
    ids = [r["vec_id"] for r in rows]
    mat = np.array([r["v"] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    np.fill_diagonal(sims, -2.0)
    true_nn = {
        ids[i]: (ids[int(sims[i].argmax())], sims[i].max())
        for i in range(len(ids))
    }
    close = {i: nn for i, (nn, s) in true_nn.items() if s >= 0.9}

    def recall_of(g) -> tuple[float, float]:
        t0 = time.perf_counter()
        got: dict = {}
        for r in g.collect():
            got.setdefault(r["src"], set()).add(r["dst"])
        wall = round(time.perf_counter() - t0, 2)
        hits = sum(1 for i, nn in close.items() if nn in got.get(i, set()))
        return round(hits / len(close), 3), wall

    results = {}
    for label, g in [
        ("exact", knn_graph(emb, k=5, id_col="vec_id", vec_col="v")),
        ("sdc", knn_graph_pq(emb, k=5, id_col="vec_id", vec_col="v",
                             m=8, ksub=16)),
        ("sdc_rerank20", knn_graph_pq(emb, k=5, id_col="vec_id",
                                      vec_col="v", m=8, ksub=16,
                                      rerank=20)),
    ]:
        recall, wall = recall_of(g)
        results[label] = {"recall": recall, "wall_s": wall}
        print(json.dumps({label: results[label],
                          "close_pairs": len(close)}))
    print(json.dumps({"metric": "knn_sdc_recall", "points": results,
                      "n_vectors": len(ids), "cpus": cpus}))


if __name__ == "__main__":
    main_sdc() if "--sdc" in sys.argv else main()
