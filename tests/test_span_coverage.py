"""Duplicate-span coverage
(operators/dedup.py::duplicate_span_coverage)."""

from __future__ import annotations

from dbt_scd2_utils_spark.operators.dedup import duplicate_span_coverage


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r for r in duplicate_span_coverage(df, **kw).collect()}


def test_exact_copies_score_full_coverage(spark):
    text = " ".join(f"tok{i}" for i in range(20))
    out = _run(spark, [(1, text), (2, text), (3, "something else entirely here x y z w")], span_n=4)
    assert out[1].dup_coverage_bp == 10000
    assert out[2].dup_coverage_bp == 10000
    assert out[3].dup_coverage_bp == 0
    assert out[1].n_windows == 17  # 20 - 4 + 1


def test_partial_quote_scores_its_share(spark):
    quote = "alpha beta gamma delta"
    unique1 = " ".join(f"u{i}" for i in range(8))
    unique2 = " ".join(f"v{i}" for i in range(8))
    out = _run(
        spark,
        [(1, unique1 + " " + quote), (2, unique2 + " " + quote)],
        span_n=4,
    )
    # doc 1: 12 tokens → 9 windows; only the final all-quote window
    # (positions fully inside the quote) is shared across docs
    assert out[1].n_windows == 9
    assert out[1].n_dup_windows == 1
    assert out[1].dup_coverage_bp == 1111  # 1*10000 div 9


def test_internal_repetition_needs_second_doc(spark):
    # the same phrase twice in ONE doc: df counts distinct docs → not dup
    out = _run(spark, [(1, "a b c d a b c d"), (2, "x y z w q r s t")], span_n=4)
    assert out[1].dup_coverage_bp == 0


def test_short_docs_have_zero_windows(spark):
    out = _run(spark, [(1, "a b"), (2, "a b")], span_n=4)
    assert out[1].n_windows == 0 and out[1].dup_coverage_bp == 0
