"""connected_components / dedup_clusters (operators/clustering.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_scd2_utils_spark.operators.clustering import (
    connected_components,
    dedup_clusters,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_path_graph_needs_propagation(spark):
    # 1-2-3-4-5 chain (diameter 4): exercises multiple rounds, not just the
    # first-hop min.
    cc = connected_components(_pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]))
    got = {r["id"]: r["component"] for r in cc.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_disjoint_clusters_and_order_independence(spark):
    # Two components; edges given in arbitrary orientation/order.
    cc = connected_components(
        _pairs(spark, [(7, 3), (3, 9), (20, 10), (2, 9)])
    )
    got = {r["id"]: r["component"] for r in cc.collect()}
    assert got == {2: 2, 3: 2, 7: 2, 9: 2, 10: 10, 20: 10}


def test_max_iter_bounds_rounds(spark):
    # A long chain with max_iter=1 must still terminate (possibly
    # unconverged) — the bound is a guard, not a correctness dependency
    # once >= diameter.
    pairs = _pairs(spark, [(i, i + 1) for i in range(1, 8)])
    cc = connected_components(pairs, max_iter=1)
    assert cc.count() == 8
    cc_full = connected_components(pairs)
    assert set(r["component"] for r in cc_full.collect()) == {1}


def test_dedup_clusters_whole_corpus(spark):
    corpus = spark.createDataFrame(
        [(i, f"t{i}") for i in range(1, 7)], "doc_id long, text string"
    )
    pairs = _pairs(spark, [(1, 2), (2, 3), (5, 6)])
    out = dedup_clusters(corpus, pairs).collect()
    rep = {r["doc_id"]: r["cluster_rep"] for r in out}
    canon = {r["doc_id"]: r["is_canonical"] for r in out}
    assert rep == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5}
    assert canon == {1: True, 2: False, 3: False, 4: True, 5: True, 6: False}
    # filter(is_canonical) is the deduplicated corpus: one survivor per
    # cluster + every unpaired doc.
    kept = [r["doc_id"] for r in out if r["is_canonical"]]
    assert sorted(kept) == [1, 4, 5]


def test_empty_pairs_all_canonical(spark):
    corpus = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    out = dedup_clusters(corpus, _pairs(spark, []))
    assert out.filter(~F.col("is_canonical")).count() == 0


# ---- property: random graphs vs pure-python union-find --------------------


def _uf_components(n_nodes, edges):
    """Independent reference: array union-find with path compression."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    # Min-id representative per component.
    return {x: find(x) for x in list(parent)}


def test_random_graphs_match_union_find(spark):
    import random

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        n = 60
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(1, n + 1), 2)))
                for _ in range(rng.randint(10, 80))
            }
        )
        want = _uf_components(n, edges)
        got = {
            r["id"]: r["component"]
            for r in connected_components(
                _pairs(spark, [(a, b) for a, b in edges])
            ).collect()
        }
        # union-find roots are min ids after full compression of the same
        # edge set — but path compression can leave stale parents; resolve
        # transitively for the comparison.
        resolved = {}
        for x in want:
            r = x
            while want[r] != r:
                r = want[r]
            resolved[x] = r
        assert got == resolved, f"seed {seed} mismatch"


def test_long_path_converges_in_log_rounds(spark):
    """A 200-node path with PERMUTED ids (so id order gives no free
    collapse) must fully converge within 10 alternating rounds — the
    O(log² n) bound that motivated replacing min-label propagation
    (which needs diameter ≈ 200 rounds here)."""
    import random

    ids = list(range(1, 201))
    random.Random(17).shuffle(ids)
    pairs = _pairs(spark, list(zip(ids, ids[1:])))
    cc = connected_components(pairs, max_iter=10)
    comps = {r["component"] for r in cc.collect()}
    assert comps == {1}
