"""Corpus mixture report (operators/sampling.py::mixture_report)."""

from __future__ import annotations

from dbt_scd2_utils_spark.operators.sampling import mixture_report


def test_shares_and_cumulative(spark):
    df = spark.createDataFrame(
        [
            ("en", "a", "w " * 60),
            ("en", "b", "w " * 30),
            ("fr", "a", "w " * 10),
        ],
        "lang string, source string, text string",
    )
    # trim strips the trailing space → exactly 60/30/10 tokens
    rows = {
        (r.lang, r.source): r for r in mixture_report(df).collect()
    }
    en_a, en_b, fr_a = rows[("en", "a")], rows[("en", "b")], rows[("fr", "a")]
    assert (en_a.n_tokens, en_b.n_tokens, fr_a.n_tokens) == (60, 30, 10)
    assert en_a.token_share_bp == 6000
    assert en_b.token_share_bp == 3000
    assert fr_a.token_share_bp == 1000
    assert (en_a.token_rank, en_b.token_rank, fr_a.token_rank) == (1, 2, 3)
    assert (en_a.cum_share_bp, en_b.cum_share_bp, fr_a.cum_share_bp) == (
        6000,
        9000,
        10000,
    )
    assert en_a.n_docs == 1


def test_rank_ties_break_on_group_cols(spark):
    df = spark.createDataFrame(
        [("en", "b", "x y"), ("en", "a", "p q")],
        "lang string, source string, text string",
    )
    rows = {(r.lang, r.source): r.token_rank for r in mixture_report(df).collect()}
    assert rows[("en", "a")] == 1 and rows[("en", "b")] == 2
