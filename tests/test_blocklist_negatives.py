"""Blocklist filtering (operators/text.py::blocklist_filter) and
hard-negative mining (operators/similarity.py::hard_negatives)."""

from __future__ import annotations

from dbt_scd2_utils_spark.operators.similarity import hard_negatives
from dbt_scd2_utils_spark.operators.text import blocklist_filter


def test_blocklist_exact_prefix_suffix(spark):
    df = spark.createDataFrame(
        [
            (1, "spam.example.com"),
            (2, "example.com"),
            (3, "ads.tracker.net"),
            (4, "news.site.org"),
            (5, "site.org"),
        ],
        "doc_id long, source string",
    )
    bl = spark.createDataFrame(
        [
            ("example.com", "suffix"),   # blocks 1 and 2
            ("ads.", "prefix"),          # blocks 3
            ("site.org", "exact"),       # blocks 5, NOT 4 (subdomain)
        ],
        "pattern string, kind string",
    )
    kept = {r.doc_id for r in blocklist_filter(df, bl).collect()}
    assert kept == {4}


def test_blocklist_empty_list_keeps_all(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, source string")
    bl = spark.createDataFrame([], "pattern string, kind string")
    assert blocklist_filter(df, bl).count() == 2


def test_hard_negatives_exclude_query_and_positives(spark):
    # 6 vectors on a line: query 0 → nearest are 1,2,3… positive is 1.
    emb = spark.createDataFrame(
        [(i, [1.0, float(i) / 10.0]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    pos = spark.createDataFrame(
        [(0, 1)], "query_id long, positive_id long"
    )
    rows = hard_negatives(emb, pos, k=3).collect()
    ids = [r.negative_id for r in sorted(rows, key=lambda r: r.rank)]
    assert 0 not in ids and 1 not in ids
    assert len(ids) == 3
    # ranks are 1..k and qdot non-increasing
    qdots = [r.qdot for r in sorted(rows, key=lambda r: r.rank)]
    assert qdots == sorted(qdots, reverse=True)


def test_hard_negatives_multiple_positives_all_excluded(spark):
    emb = spark.createDataFrame(
        [(i, [1.0, float(i)]) for i in range(5)],
        "vec_id long, embedding array<float>",
    )
    pos = spark.createDataFrame(
        [(2, 1), (2, 3)], "query_id long, positive_id long"
    )
    ids = {r.negative_id for r in hard_negatives(emb, pos, k=4).collect()}
    assert ids <= {0, 4}


def test_blocklist_wildcard_chars_match_literally(spark):
    # '%' and '_' in patterns are LITERAL characters, never wildcards
    df = spark.createDataFrame(
        [(1, "100%org"), (2, "100Xorg"), (3, "a_b"), (4, "aXb")],
        "doc_id long, source string",
    )
    bl = spark.createDataFrame(
        [("100%", "prefix"), ("a_b", "exact")],
        "pattern string, kind string",
    )
    from dbt_scd2_utils_spark.operators.text import blocklist_filter

    kept = {r.doc_id for r in blocklist_filter(df, bl).collect()}
    assert kept == {2, 4}
