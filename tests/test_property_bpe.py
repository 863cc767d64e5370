"""Randomized property harness for BPE: the DataFrame learner must match
the textbook sequential reference (Sennrich et al. ACL'16, the
get_stats/merge_word loop from the paper) on random corpora — including
adversarial runs of repeated characters, where the leftmost-first
non-overlapping merge semantics is the part a parallel formulation most
easily gets wrong."""

from __future__ import annotations

import random
from collections import Counter

from dbt_scd2_utils_spark.operators.bpe import bpe_token_counts, learn_bpe_merges
import pytest

# Randomized property / stress suite: excluded from the default run
# (pytest.ini addopts -m "not slow") so the driver-window selection
# stays fast; run with `pytest -m slow`.
pytestmark = pytest.mark.slow


def _py_bpe(texts, n_merges):
    """Reference implementation: word-frequency dict, sequential
    leftmost-first merge application."""
    vocab = Counter()
    for t in texts:
        for w in t.strip().lower().split():
            if w:
                vocab[w] += 1
    state = {w: [*w, "</w>"] for w in vocab}
    merges = []
    for rank in range(1, n_merges + 1):
        stats = Counter()
        for w, syms in state.items():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] += vocab[w]
        if not stats:
            break
        # deterministic argmax: count desc, then (left, right) asc
        top = max(stats.values())
        bl, br = min(p for p, c in stats.items() if c == top)
        cnt = top
        merges.append((rank, bl, br, cnt))
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == bl and syms[i + 1] == br:
                    out.append(bl + br)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = out
    return merges, state, vocab


VOCAB = ["aa", "aaa", "aaaa", "abab", "low", "lower", "lowest", "wide", "web"]


def test_learner_matches_sequential_reference(spark):
    rng = random.Random(23)
    for trial in range(4):
        texts = [
            " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 12)))
            for _ in range(8)
        ]
        n = rng.randint(1, 6)
        want, _state, _v = _py_bpe(texts, n)
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        got = [
            (r.merge_rank, r.left, r.right, r.pair_count)
            for r in learn_bpe_merges(df, n_merges=n)
            .orderBy("merge_rank")
            .collect()
        ]
        assert got == want, (trial, texts, n)


def test_token_counts_match_sequential_reference(spark):
    rng = random.Random(29)
    texts = [
        " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 10)))
        for _ in range(6)
    ]
    n = 4
    _m, state, _v = _py_bpe(texts, n)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe_token_counts(df, n_merges=n).collect()
    }
    for i, t in enumerate(texts):
        words = [w for w in t.strip().lower().split() if w]
        want = (len(words), sum(len(state[w]) for w in words))
        assert got[i] == want, (i, t)
