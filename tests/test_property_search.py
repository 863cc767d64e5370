"""Randomized property harness for operators/search.py: BM25 and the
bigram-LM scorer must match an independent pure-Python re-derivation on
random corpora (same pattern as tests/test_property_scd01.py — the
python model is written from the formulas, not from the Spark code)."""

from __future__ import annotations

import math
import random
from collections import Counter

from pyspark.sql import functions as F

from dbt_scd2_utils_spark.operators.search import bm25_topk, ngram_lm_score
import pytest

# Randomized property / stress suite: excluded from the default run
# (pytest.ini addopts -m "not slow") so the driver-window selection
# stays fast; run with `pytest -m slow`.
pytestmark = pytest.mark.slow

VOCAB = "alpha beta gamma delta zeta eta theta iota kappa lam".split()


def _random_corpus(rng, n_docs):
    docs = []
    for i in range(n_docs):
        n = rng.randint(0, 12)
        docs.append((i, " ".join(rng.choice(VOCAB) for _ in range(n))))
    return docs


def _py_bm25(docs, queries, k, k1=1.2, b=0.75, max_df_frac=None):
    toks = {i: [w for w in t.lower().split() if w] for i, t in docs}
    tf = {i: Counter(ws) for i, ws in toks.items()}
    dl = {i: sum(c.values()) for i, c in tf.items() if c}
    df = Counter(w for c in tf.values() for w in c)
    n_docs = len(dl)  # docs with at least one token
    total_len = sum(dl.values())
    out = {}
    for qid, qtext in queries:
        qterms = {w for w in qtext.lower().split() if w}
        scores = {}
        for d, c in tf.items():
            if not c:
                continue
            s = 0
            hit = False
            for w in qterms & set(c):
                if max_df_frac is not None and df[w] > max_df_frac * n_docs:
                    continue
                idf = math.log(1.0 + (n_docs - df[w] + 0.5) / (df[w] + 0.5))
                tfn = (
                    c[w] * (k1 + 1.0)
                    / (c[w] + k1 * (1.0 - b + b * dl[d] * n_docs / total_len))
                )
                s += round(1e6 * idf * tfn)
                hit = True
            if hit:
                scores[d] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qid] = [(r + 1, d, s) for r, (d, s) in enumerate(ranked)]
    return out


def _py_lm(docs, alpha=0.5):
    toks = {i: [w for w in t.lower().split() if w] for i, t in docs}
    # NOTE: the engine tokenizes split(trim(text), \s+): an empty text is
    # [''] (one empty token) — for bigrams both models agree (no pairs).
    bigrams = {
        i: list(zip(ws, ws[1:])) for i, ws in toks.items()
    }
    c2 = Counter(p for ps in bigrams.values() for p in ps)
    c1 = Counter()
    for (w1, _), n in c2.items():
        c1[w1] += n
    vocab = len({w for ws in toks.values() for w in ws})
    out = {}
    for i, ps in bigrams.items():
        nll = sum(
            round(-1e6 * math.log((c2[p] + alpha) / (c1[p[0]] + alpha * vocab)))
            for p in ps
        )
        out[i] = (len(ps), nll, nll // len(ps) if ps else 0)
    return out


def test_bm25_property_random_corpora(spark):
    rng = random.Random(404)
    for trial in range(8):
        docs = _random_corpus(rng, rng.randint(3, 25))
        queries = [
            (j, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 4))))
            for j in range(rng.randint(1, 4))
        ]
        frac = rng.choice([None, 0.5, 0.9])
        ddf = spark.createDataFrame(docs, "doc_id long, text string")
        qdf = spark.createDataFrame(queries, "query_id long, query_text string")
        got = {}
        for r in bm25_topk(ddf, qdf, k=5, max_df_frac=frac).collect():
            got.setdefault(r["query_id"], []).append(
                (r["rank"], r["doc_id"], r["score_micro"])
            )
        exp = _py_bm25(docs, queries, k=5, max_df_frac=frac)
        exp = {q: v for q, v in exp.items() if v}
        got = {q: sorted(v) for q, v in got.items()}
        exp = {q: sorted(v) for q, v in exp.items()}
        assert got == exp, f"trial {trial} frac {frac}: {got} != {exp}"


def test_lm_property_random_corpora(spark):
    rng = random.Random(505)
    for trial in range(8):
        docs = _random_corpus(rng, rng.randint(2, 25))
        ddf = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_bigrams"], r["nll_micro"], r["avg_nll_micro"])
            for r in ngram_lm_score(ddf).collect()
        }
        exp = _py_lm(docs)
        assert got == exp, f"trial {trial}: {got} != {exp}"


def test_property_index_append_equals_rebuild(spark):
    """Randomized: for arbitrary corpus splits, bm25_index_append over
    the unpruned maintained index is row-identical to rebuilding from
    the full corpus (10 random corpora × random split points)."""
    from dbt_scd2_utils_spark.operators.search import (
        bm25_index,
        bm25_index_append,
    )

    rng = random.Random(451)
    for trial in range(10):
        docs = _random_corpus(rng, rng.randint(4, 25))
        cut = rng.randint(1, max(1, len(docs) - 1))
        old = spark.createDataFrame(docs[:cut], "doc_id long, text string")
        new = spark.createDataFrame(docs[cut:], "doc_id long, text string")
        both = spark.createDataFrame(docs, "doc_id long, text string")
        appended = (
            bm25_index_append(
                bm25_index(old, max_df_frac=None), new, max_df_frac=None
            )
            .toPandas()
            .sort_values(["term", "doc_id"])
            .reset_index(drop=True)
        )
        rebuilt = (
            bm25_index(both, max_df_frac=None)
            .toPandas()
            .sort_values(["term", "doc_id"])
            .reset_index(drop=True)
        )
        assert appended[rebuilt.columns.tolist()].astype(str).equals(
            rebuilt.astype(str)
        ), f"trial {trial} cut {cut}"
