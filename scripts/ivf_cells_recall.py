#!/usr/bin/env python
"""Recall side of the fixed-cell IVF deployment rule (BASELINE round-9e
measured only the COST side: pinning cells at 1024 instead of √n makes the
assign pass ∝ n, 344 vs 518 s at s10).  This script pins the claim that
"nprobe compensates" with numbers, on the same s10 corpus (500k vectors):

For cells ∈ {√n-rule (2·√n ≈ 1414), fixed 1024} the coarse quantizer is
trained EXACTLY as the build path does (engine k-means,
``kmeans_centroids_vectorized``, 16-points-per-cell hash sample, 2 Lloyd
iterations); then for nprobe ∈ {2,4,8,16,32} we measure

- candidate recall@10: fraction of the true (exact-cosine) top-10
  neighbors whose vector lands in one of the query's nprobe probed cells
  — the cell-pruning loss in isolation, the only thing the cells/nprobe
  dial changes (PQ quantization error is orthogonal: both configs share
  codebooks in the build path),
- probe cost: mean candidates scanned per query (Σ probed cell sizes),
  the O(queries · nprobe · cell-size) term ``ivf_pq_topk`` pays.

Ground truth and cell assignment run driver-side in numpy — this is a
measurement harness, not a production path; the engine's own probe is
gated separately (q:ann_ivf_topk / ann_ivf_pq_topk).

Usage: python scripts/ivf_cells_recall.py [--scale s10] [--queries 300]
Prints one JSON line per (cells, nprobe) point plus a summary line with
the equal-recall nprobe and its probe-cost delta.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale_data"
)


def main() -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from dbt_scd2_utils_spark.operators.similarity import (
        _l2_normalize,
        as_double,
        kmeans_centroids_vectorized,
    )
    from dbt_scd2_utils_spark.session import get_spark

    scale = "s10"
    n_queries = 300
    if "--scale" in sys.argv:
        scale = sys.argv[sys.argv.index("--scale") + 1]
    if "--queries" in sys.argv:
        n_queries = int(sys.argv[sys.argv.index("--queries") + 1])
    k = 10

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    spark = get_spark("ivf-cells-recall", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(os.path.join(DATA_DIR, scale, "embeddings.parquet"))
    normed = emb.select(
        F.col("vec_id").alias("pid"),
        _l2_normalize(as_double("embedding")).alias("nv"),
    ).persist()
    n_vec = normed.count()

    # Corpus to driver as float32 (n x 64 — 128 MB at s10): ground truth +
    # cell assignment are exact dot products, chunked.
    pdf = normed.toPandas()
    ids = pdf["pid"].to_numpy()
    mat = np.stack(pdf["nv"].to_numpy()).astype(np.float32)

    rng = np.random.default_rng(7)
    q_idx = rng.choice(n_vec, size=n_queries, replace=False)
    q = mat[q_idx]

    # Exact top-k (excluding self) — the ground truth.
    sims = q @ mat.T  # (queries x n)
    sims[np.arange(n_queries), q_idx] = -2.0
    truth = np.argpartition(-sims, k, axis=1)[:, :k]

    def centroids_for(n_cells: int) -> np.ndarray:
        sample_mod = max(1, n_vec // (16 * n_cells))
        train = normed.filter(F.pmod(F.xxhash64("pid"), sample_mod) == 0)
        cent = kmeans_centroids_vectorized(
            train, k=n_cells, iters=2, id_col="pid", vec_col="nv"
        )
        cpdf = cent.orderBy("cent_id").toPandas()
        return np.stack(cpdf["cv"].to_numpy()).astype(np.float32)

    sqrt_cells = max(8, int(2 * math.sqrt(n_vec)))
    results = []
    for label, n_cells in (("sqrtn", sqrt_cells), ("fixed", 1024)):
        t0 = time.perf_counter()
        cents = centroids_for(n_cells)
        train_s = round(time.perf_counter() - t0, 1)
        # Rank cells as the engine does (similarity.py `_assign`: cosine
        # rounded to 6, lowest cent_id on ties) — centroids are means of
        # unit vectors with varying norms, so a raw dot product would
        # rank cells by a different rule than the shipped quantizer.
        # (Corpus/query vectors are already unit-norm, so dividing by
        # the centroid norm IS the cosine.  np.round ties half-to-even
        # vs Spark's HALF_UP — a measure-zero difference on float64
        # cosines, noted for honesty rather than handled.)
        cn = cents / np.maximum(
            np.linalg.norm(cents, axis=1, keepdims=True), 1e-12
        )
        # Assign every vector to its nearest centroid, chunked; argmax on
        # the rounded cosine returns the FIRST (lowest cent_id) max.
        assign = np.empty(n_vec, dtype=np.int32)
        for lo in range(0, n_vec, 50_000):
            hi = min(lo + 50_000, n_vec)
            assign[lo:hi] = np.round(mat[lo:hi] @ cn.T, 6).argmax(axis=1)
        cell_sizes = np.bincount(assign, minlength=len(cents))
        q_cent = np.round(q @ cn.T, 6)  # (queries x cells)
        # stable sort on -cosine ⇒ ties break toward lower cent_id,
        # matching the engine's (csim desc, cent_id asc) ordering.
        order = np.argsort(-q_cent, axis=1, kind="stable")
        for nprobe in (2, 4, 8, 16, 32):
            probed = order[:, :nprobe]  # (queries x nprobe)
            hits = 0
            cand = 0
            for qi in range(n_queries):
                pset = set(probed[qi].tolist())
                cand += int(cell_sizes[probed[qi]].sum())
                hits += sum(
                    1 for t in truth[qi] if int(assign[t]) in pset
                )
            results.append({
                "cells": label, "n_cells": int(len(cents)), "nprobe": nprobe,
                "recall_at_10": round(hits / (n_queries * k), 4),
                "mean_candidates": int(cand / n_queries),
                "cell_fraction": round(nprobe / len(cents), 5),
                "train_s": train_s,
            })
            print(json.dumps(results[-1]), flush=True)

    # Equal-recall point: smallest fixed-1024 nprobe whose recall >= the
    # sqrtn reference at the build path's default probe setting (nprobe=8).
    ref = next(r for r in results if r["cells"] == "sqrtn" and r["nprobe"] == 8)
    comp = [
        r for r in results
        if r["cells"] == "fixed" and r["recall_at_10"] >= ref["recall_at_10"]
    ]
    eq = min(comp, key=lambda r: r["nprobe"]) if comp else None
    print(json.dumps({
        "metric": "ivf_cells_recall",
        "scale": scale, "n_vectors": n_vec, "queries": n_queries, "k": k,
        "sqrtn_ref": ref, "fixed_equal_recall": eq,
        "probe_cost_ratio": (
            round(eq["mean_candidates"] / ref["mean_candidates"], 2) if eq else None
        ),
        "points": results,
    }))


if __name__ == "__main__":
    main()
