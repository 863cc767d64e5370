"""Quality-aware dedup survivorship
(operators/clustering.py::dedup_survivors)."""

from __future__ import annotations

from dbt_scd2_utils_spark.operators.clustering import dedup_survivors


def test_highest_quality_wins_not_min_id(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 50), (7, 5)], "doc_id long, quality long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    out = {r.doc_id: r for r in dedup_survivors(df, pairs).collect()}
    # cluster {1,2,3}: survivor is 2 (quality 99), NOT min-id 1
    assert out[2].is_survivor and not out[1].is_survivor and not out[3].is_survivor
    assert out[1].cluster_rep == out[2].cluster_rep == out[3].cluster_rep
    # singleton survives trivially
    assert out[7].is_survivor and out[7].cluster_rep == 7


def test_quality_tie_breaks_by_min_id(spark):
    df = spark.createDataFrame(
        [(4, 10), (9, 10)], "doc_id long, quality long"
    )
    pairs = spark.createDataFrame([(4, 9)], "id_a long, id_b long")
    out = {r.doc_id: r for r in dedup_survivors(df, pairs).collect()}
    assert out[4].is_survivor and not out[9].is_survivor


def test_exactly_one_survivor_per_cluster(spark):
    df = spark.createDataFrame(
        [(i, i * 7 % 13) for i in range(20)], "doc_id long, quality long"
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 18, 2)], "id_a long, id_b long"
    )
    rows = dedup_survivors(df, pairs).collect()
    per_cluster = {}
    for r in rows:
        per_cluster[r.cluster_rep] = per_cluster.get(r.cluster_rep, 0) + (
            1 if r.is_survivor else 0
        )
    assert all(v == 1 for v in per_cluster.values())
