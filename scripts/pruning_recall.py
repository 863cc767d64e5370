#!/usr/bin/env python
"""Measure the WAND-style static-pruning approximation: top-k overlap
between the pruned (max_postings_per_term) and exact BM25 rankings on
the Heaps-law Zipf corpus (scripts/scale_proof.py::gen_documents_zipf),
across pruning depths.  A document can miss the pruned top-k only if it
ranks below N on EVERY query term — this quantifies how often that
actually happens.

Usage: python scripts/pruning_recall.py [scale]   (s0.1 default)
Prints one JSON line per depth and a summary.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dbt_scd2_utils_spark.session import get_spark  # noqa: E402


def main() -> None:
    from scripts.scale_proof import ensure_data

    scale = sys.argv[1] if len(sys.argv) > 1 else "s0.1"
    paths = ensure_data()
    spark = get_spark("pruning-recall")
    spark.sparkContext.setLogLevel("ERROR")

    from dbt_scd2_utils_spark.operators.search import bm25_topk

    docs = spark.read.parquet(paths[scale]["documents_zipf"])
    qdocs = docs.filter(F.col("doc_id") % 50 == 0)
    # head-term queries: the document's first five tokens — Zipf sampling
    # makes these mostly stopword-class terms (the adversarial case for
    # static pruning: every scored doc competes on megalists)
    head_qs = qdocs.select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(
            " ",
            F.slice(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), 1, 5),
        ).alias("query_text"),
    )
    # discriminative queries: each query doc's five RAREST distinct
    # tokens by corpus df — the realistic search shape
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("t")
    ).filter(F.col("t") != "")
    dfreq = toks.groupBy("t").agg(F.count_distinct("doc_id").alias("df"))
    from pyspark.sql import Window

    wrare = Window.partitionBy("doc_id").orderBy(
        F.col("df").asc(), F.col("t").asc()
    )
    rare_qs = (
        toks.join(qdocs.select("doc_id"), "doc_id", "left_semi")
        .distinct()
        .join(dfreq, "t")
        .withColumn("rn", F.row_number().over(wrare))
        .filter(F.col("rn") <= 5)
        .groupBy("doc_id")
        .agg(F.concat_ws(" ", F.collect_list("t")).alias("query_text"))
        .select(F.col("doc_id").alias("query_id"), "query_text")
    )

    k = 10
    summary = {}
    for qname, qs in (("head_terms", head_qs), ("rare_terms", rare_qs)):
        exact = (
            bm25_topk(docs, qs, k=k, max_df_frac=0.8)
            .select("query_id", "doc_id")
            .collect()
        )
        want: dict[int, set] = {}
        for r in exact:
            want.setdefault(r.query_id, set()).add(r.doc_id)
        results = {}
        for depth in (50, 100, 200, 500):
            got_rows = (
                bm25_topk(
                    docs, qs, k=k, max_df_frac=0.8,
                    max_postings_per_term=depth,
                )
                .select("query_id", "doc_id")
                .collect()
            )
            got: dict[int, set] = {}
            for r in got_rows:
                got.setdefault(r.query_id, set()).add(r.doc_id)
            hit = sum(len(want[q] & got.get(q, set())) for q in want)
            tot = sum(len(want[q]) for q in want)
            results[depth] = round(hit / tot, 4)
            print(
                json.dumps(
                    {
                        "scale": scale,
                        "queries": qname,
                        "depth": depth,
                        "recall_at_10": results[depth],
                    }
                )
            )
        summary[qname] = results
    print(json.dumps({"metric": "bm25_pruning_recall", "scale": scale,
                      "k": k, "recall_by_depth": summary}))


if __name__ == "__main__":
    main()
