"""Bitmap-prefiltered decontamination ≡ exact decontamination
(operators/dedup.py::ngram_decontaminate_prefiltered)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_scd2_utils_spark.operators.dedup import (
    ngram_decontaminate,
    ngram_decontaminate_prefiltered,
)
from dbt_scd2_utils_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF, "documents")


def test_identical_to_exact_path(spark):
    docs = _docs(spark)
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    exact = ngram_decontaminate(docs, bench, n=4)
    fast = ngram_decontaminate_prefiltered(docs, bench, n=4)
    assert exact.schema == fast.schema
    assert exact.exceptAll(fast).count() == 0
    assert fast.exceptAll(exact).count() == 0


def test_identical_under_tiny_bitmap(spark):
    # bits_log2=8 → 256 buckets → heavy false positives; the exact join
    # must still reject every one of them.
    docs = _docs(spark)
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    exact = ngram_decontaminate(docs, bench, n=4)
    fast = ngram_decontaminate_prefiltered(docs, bench, n=4, bits_log2=8)
    assert exact.exceptAll(fast).count() == 0
    assert fast.exceptAll(exact).count() == 0


def test_bitmap_join_is_broadcast(spark):
    docs = _docs(spark)
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    plan = (
        ngram_decontaminate_prefiltered(docs, bench, n=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
