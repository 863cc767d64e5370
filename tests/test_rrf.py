"""Reciprocal-rank fusion semantics (operators/search.py::rrf_fuse)."""

from __future__ import annotations

from dbt_scd2_utils_spark.operators.search import rrf_fuse


def _lists(spark, a, b):
    schema = "query_id long, doc_id long, rank long"
    return [spark.createDataFrame(a, schema), spark.createDataFrame(b, schema)]


def test_doc_in_both_lists_beats_single_list_winners(spark):
    # doc 3 is mid-ranked in BOTH lists; docs 1 and 2 each top one list.
    # 1/(60+2)+1/(60+2) > 1/(60+1) → consensus wins under RRF.
    a = [(7, 1, 1), (7, 3, 2)]
    b = [(7, 2, 1), (7, 3, 2)]
    out = rrf_fuse(_lists(spark, a, b), k=10).collect()
    ranked = {r.rank: r for r in out}
    assert ranked[1].doc_id == 3
    assert ranked[1].n_lists == 2
    # contribution micro: round(1e6/62)=16129 twice
    assert ranked[1].rrf_micro == 2 * 16129
    # docs 1 and 2 tie on score → deterministic id tiebreak
    assert (ranked[2].doc_id, ranked[3].doc_id) == (1, 2)


def test_k_truncation_and_per_query_isolation(spark):
    a = [(1, d, r) for r, d in enumerate((10, 11, 12), start=1)]
    b = [(2, d, r) for r, d in enumerate((20, 21), start=1)]
    out = rrf_fuse(_lists(spark, a, b), k=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q[1]) == 2 and len(by_q[2]) == 2
    assert {r.doc_id for r in by_q[1]} == {10, 11}
    assert {r.doc_id for r in by_q[2]} == {20, 21}
