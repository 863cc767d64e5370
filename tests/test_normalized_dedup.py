"""Canonical-form dedup (operators/dedup.py::normalized_exact_dedup)."""

from __future__ import annotations

from dbt_scd2_utils_spark.operators.dedup import (
    exact_dedup,
    normalized_exact_dedup,
)


def test_reformatted_copies_collapse(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello, World!"),
            (2, "hello world"),
            (3, "HELLO    WORLD?!"),
            (4, "hello,world"),
            (5, "goodbye world"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in normalized_exact_dedup(df).collect()}
    # 1,2,3,4 all normalize to 'hello world' (punctuation maps to space,
    # runs collapse) → one group, min-id survivor 1.
    assert out[1].dup_count == 4
    assert 2 not in out and 3 not in out and 4 not in out
    assert out[5].dup_count == 1
    # byte-exact dedup keeps all five
    assert exact_dedup(df).count() == 5


def test_unicode_letters_survive_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Café Déjà-Vu"), (2, "café déjà vu"), (3, "cafe deja vu")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in normalized_exact_dedup(df).collect()}
    # accented letters are \p{L}: kept, not stripped; the hyphen becomes
    # a space so 'Déjà-Vu' ≡ 'déjà vu' — but no accent folding: ≠ 'deja'
    assert out[1].dup_count == 2
    assert out[3].dup_count == 1
