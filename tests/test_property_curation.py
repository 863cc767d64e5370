"""Randomized property harness for the round-4b curation operators:
containment decontamination, RRF fusion, and quality-aware survivorship
must match independent pure-Python re-derivations on random corpora
(same pattern as tests/test_property_search.py — the python models are
written from the definitions, not from the Spark code)."""

from __future__ import annotations

import random
from collections import Counter, defaultdict

from dbt_scd2_utils_spark.operators.clustering import dedup_survivors
from dbt_scd2_utils_spark.operators.dedup import containment_decontaminate
from dbt_scd2_utils_spark.operators.search import rrf_fuse
import pytest

# Randomized property / stress suite: excluded from the default run
# (pytest.ini addopts -m "not slow") so the driver-window selection
# stays fast; run with `pytest -m slow`.
pytestmark = pytest.mark.slow

VOCAB = "red blue green gold iron wood salt rain moss fern".split()


def _shingles(text: str, n: int) -> set[str]:
    ws = text.strip().split()
    if not ws:
        return {""}
    if len(ws) <= n:
        return {" ".join(ws)}
    return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


def _py_containment(corpus, bench, n, threshold, max_df):
    dg = {i: _shingles(t, n) for i, t in corpus}
    if max_df is not None:
        df = Counter(g for gs in dg.values() for g in gs)
        keep = {g for g, c in df.items() if c <= max_df}
        dg = {i: gs & keep for i, gs in dg.items()}
        bg = {i: _shingles(t, n) & keep for i, t in bench}
    else:
        bg = {i: _shingles(t, n) for i, t in bench}
    out = {}
    for i, gs in dg.items():
        best, hits = 0, 0
        for _bid, bgs in bg.items():
            if not bgs:
                continue
            c = round(1e6 * len(gs & bgs) / len(bgs))
            best = max(best, c)
            if c >= round(threshold * 1e6):
                hits += 1
        out[i] = (best, hits, hits > 0)
    return out


def test_containment_matches_python_model(spark):
    rng = random.Random(7)
    for trial in range(4):
        corpus = [
            (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(0, 10))))
            for i in range(30)
        ]
        bench = [
            (100 + i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 6))))
            for i in range(6)
        ]
        max_df = rng.choice([None, 8])
        cdf = spark.createDataFrame(corpus, "doc_id long, text string")
        bdf = spark.createDataFrame(bench, "doc_id long, text string")
        got = {
            r.doc_id: (r.max_containment_micro, r.n_bench_hits, r.is_contaminated)
            for r in containment_decontaminate(
                cdf, bdf, shingle_n=2, threshold=0.5, max_df=max_df
            ).collect()
        }
        want = _py_containment(corpus, bench, 2, 0.5, max_df)
        assert got == want, (trial, max_df)


def _py_rrf(lists, k, k0=60):
    scores: dict = defaultdict(lambda: [0, 0])
    for lst in lists:
        for qid, doc, rank in lst:
            s = scores[(qid, doc)]
            s[0] += round(1e6 / (k0 + rank))
            s[1] += 1
    per_q = defaultdict(list)
    for (qid, doc), (s, n) in scores.items():
        per_q[qid].append((doc, s, n))
    out = {}
    for qid, items in per_q.items():
        ranked = sorted(items, key=lambda x: (-x[1], x[0]))[:k]
        out[qid] = [
            (r + 1, d, s, n) for r, (d, s, n) in enumerate(ranked)
        ]
    return out


def test_rrf_matches_python_model(spark):
    rng = random.Random(11)
    for _ in range(4):
        lists = []
        for _l in range(rng.randint(2, 3)):
            rows = []
            for qid in range(3):
                docs = rng.sample(range(20), rng.randint(0, 8))
                rows += [(qid, d, r) for r, d in enumerate(docs, 1)]
            lists.append(rows)
        dfs = [
            spark.createDataFrame(
                rows or [(0, 0, 1)], "query_id long, doc_id long, rank long"
            )
            for rows in lists
        ]
        # keep the fallback row consistent between model and engine
        lists = [rows or [(0, 0, 1)] for rows in lists]
        got = defaultdict(list)
        for r in rrf_fuse(dfs, k=5).collect():
            got[r.query_id].append((r.rank, r.doc_id, r.rrf_micro, r.n_lists))
        for q in got:
            got[q].sort()
        want = _py_rrf(lists, k=5)
        assert dict(got) == {q: v for q, v in want.items() if v}


def _py_survivors(quality, pairs):
    # union-find transitive closure
    parent = {i: i for i in quality}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters = defaultdict(list)
    for i in quality:
        clusters[find(i)].append(i)
    out = {}
    for rep, members in clusters.items():
        best = min(members, key=lambda i: (-quality[i], i))
        for i in members:
            out[i] = (rep, quality[i], i == best)
    return out


def test_survivors_match_python_union_find(spark):
    rng = random.Random(13)
    for _ in range(4):
        ids = list(range(25))
        quality = {i: rng.randint(0, 5) for i in ids}
        pairs = [
            (rng.randrange(25), rng.randrange(25)) for _ in range(rng.randint(1, 15))
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        if not pairs:
            pairs = [(0, 1)]
        df = spark.createDataFrame(
            [(i, q) for i, q in quality.items()], "doc_id long, quality long"
        )
        pdf = spark.createDataFrame(pairs, "id_a long, id_b long")
        got = {
            r.doc_id: (r.cluster_rep, r.quality, r.is_survivor)
            for r in dedup_survivors(df, pdf).collect()
        }
        assert got == _py_survivors(quality, pairs)
