"""Per-group duplication report (operators/clustering.py::dup_rate_report)."""

from __future__ import annotations

from dbt_scd2_utils_spark.operators.clustering import dup_rate_report


def test_counts_non_canonical_members_per_group(spark):
    df = spark.createDataFrame(
        [
            (1, "a"), (2, "a"), (3, "a"),       # cluster {1,2,3} in src a
            (4, "b"),                            # singleton in b
            (5, "b"), (6, "a"),                  # cross-source cluster {5,6}
        ],
        "doc_id long, source string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    out = {r.source: r for r in dup_rate_report(df, pairs).collect()}
    # src a: docs {1,2,3,6}; canonical are 1 (cluster {1,2,3}) — 6 is
    # non-canonical (cluster rep 5) → 2,3,6 duplicates of 4 docs
    assert (out["a"].n_docs, out["a"].n_duplicates, out["a"].dup_bp) == (4, 3, 7500)
    # src b: docs {4,5}; 5 is canonical (min of {5,6}), 4 singleton
    assert (out["b"].n_docs, out["b"].n_duplicates, out["b"].dup_bp) == (2, 0, 0)
