"""top_ngrams + quality_percentile_filter (operators/text.py)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from dbt_scd2_utils_spark.operators.text import (
    quality_percentile_filter,
    quality_percentile_filter_sql,
    top_ngrams,
    top_ngrams_sql,
)
from dbt_scd2_utils_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return sorted(tuple(str(v) for v in r) for r in df.itertuples(index=False))


def _duck():
    con = duckdb.connect()
    con.sql(f"create view documents as select * from '{SF}/documents.parquet'")
    return con


def test_top_ngrams_counts_occurrences(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "a b c")], "doc_id long, text string"
    )
    got = {r["gram"]: r["n_occurrences"] for r in top_ngrams(df, n=2, k=10).collect()}
    # "a b" occurs twice in doc 1 (occurrences, not per-doc distinct) + once in doc 2
    assert got["a b"] == 3
    assert got["b a"] == 2
    assert got["b c"] == 1


def test_top_ngrams_deterministic_tiebreak(spark):
    df = spark.createDataFrame([(1, "z y x w")], "doc_id long, text string")
    out = [r["gram"] for r in top_ngrams(df, n=2, k=2).collect()]
    # grams are 'z y','y x','x w', all count 1 -> lexicographic gram
    # order decides the top-2 exactly
    assert out == ["x w", "y x"]


def test_top_ngrams_drops_short_docs(spark):
    # a document shorter than n tokens contributes NO gram (no truncated
    # unigram leaks into the bigram vocabulary)
    df = spark.createDataFrame(
        [(1, "solo"), (2, "a b")], "doc_id long, text string"
    )
    got = {r["gram"]: r["n_occurrences"] for r in top_ngrams(df, n=2, k=10).collect()}
    assert got == {"a b": 1}


def test_top_ngrams_matches_duckdb(spark):
    docs = load_table(spark, SF, "documents")
    got = top_ngrams(docs, n=2, k=50).toPandas()
    con = _duck()  # keep the connection alive past the lazy relation
    want = con.sql(top_ngrams_sql("select * from documents", n=2, k=50)).df()
    assert _norm(got) == _norm(want)


def test_quality_filter_keeps_upper_percentiles(spark):
    rows = [(i, "g", i * 10) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    kept = quality_percentile_filter(
        df, group_cols=("lang",), min_percentile=0.5
    ).collect()
    # percent_rank >= 0.5 over 10 rows keeps ranks 6..10 (pct 5/9..1)
    assert sorted(r["doc_id"] for r in kept) == [6, 7, 8, 9, 10]


def test_quality_filter_is_per_group(spark):
    rows = [(i, "a", i) for i in range(1, 6)] + [(i + 10, "b", 1000 + i) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    kept = quality_percentile_filter(
        df, group_cols=("lang",), min_percentile=0.5
    ).collect()
    by_lang = {}
    for r in kept:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    # each group keeps its own upper half — group b's low scores (1001..)
    # are not rescued by being globally high
    assert sorted(by_lang["a"]) == [3, 4, 5]
    assert sorted(by_lang["b"]) == [13, 14, 15]


def test_quality_filter_matches_duckdb(spark):
    docs = load_table(spark, SF, "documents")
    got = quality_percentile_filter(docs, group_cols=("lang", "source")).toPandas()
    con = _duck()
    want = con.sql(
        quality_percentile_filter_sql(
            "select * from documents", group_cols=("lang", "source")
        )
    ).df()
    assert len(got) > 0
    assert _norm(got) == _norm(want)


def test_top_ngrams_by_group_isolated_per_group(spark):
    from dbt_scd2_utils_spark.operators.text import top_ngrams_by_group

    df = spark.createDataFrame(
        [
            ("en", "a b a b a b"),
            ("en", "a b c d"),
            ("fr", "x y x y"),
            ("fr", "z"),          # shorter than n → contributes nothing
        ],
        "lang string, text string",
    )
    rows = top_ngrams_by_group(df, n=2, k=2).collect()
    by = {(r.lang, r.rank): (r.gram, r.n_occurrences) for r in rows}
    # en bigram occurrences: 'a b'×4 (3 + 1), 'b a'×2, 'b c'×1, 'c d'×1
    assert by[("en", 1)] == ("a b", 4)
    assert by[("en", 2)] == ("b a", 2)
    # fr: 'x y'×2, 'y x'×1 — the singleton 'z' doc adds nothing
    assert by[("fr", 1)] == ("x y", 2)
    assert by[("fr", 2)] == ("y x", 1)
    assert len(rows) == 4
