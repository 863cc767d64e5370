"""Exact-substring removal (operators/dedup.py::exact_substring_dedup),
the cut step of Lee et al. ACL'22 ExactSubstr — fixtures for span
merging and edge shapes, plus a randomized cross-engine harness vs an
independent pure-Python model and the DuckDB twin."""

from __future__ import annotations

import hashlib
import random
import re

import duckdb
import pytest

from dbt_scd2_utils_spark.operators.dedup import (
    exact_substring_dedup,
    exact_substring_dedup_sql,
)

MD5_EMPTY = hashlib.md5(b"").hexdigest()


def _run(spark, rows, span_n, min_docs=2):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = exact_substring_dedup(
        df, span_n=span_n, min_docs=min_docs
    ).collect()
    return {r.doc_id: r for r in out}


def test_shared_prefix_cut_exactly(spark):
    out = _run(
        spark,
        [
            (1, "a b c d e f g h i j unique tail one"),
            (2, "a b c d e f g h i j different ending here"),
        ],
        span_n=4,
    )
    # the 10-token shared prefix is covered by dup 4-gram windows; the
    # distinct tails survive
    for i in (1, 2):
        assert out[i].n_tokens == 13
        assert out[i].n_removed_tokens == 10
    assert out[1].retained_hash == hashlib.md5(b"unique tail one").hexdigest()
    assert out[2].retained_hash != out[1].retained_hash


def test_exact_copies_empty_out(spark):
    text = "totally fresh words with no overlap at all whatsoever"
    out = _run(spark, [(1, text), (2, text)], span_n=4)
    for i in (1, 2):
        assert out[i].n_removed_tokens == out[i].n_tokens == 9
        assert out[i].retained_hash == MD5_EMPTY


def test_overlapping_spans_merge(spark):
    # two dup windows overlap by 2 tokens inside doc 1; each covered token
    # is cut once (union, not sum)
    out = _run(
        spark,
        [
            (1, "p q r s t u mid x y z w v"),
            (2, "zz p q r s yy"),  # shares window (p q r s)
            (3, "kk s t u mid jj"),  # shares window (s t u mid)
        ],
        span_n=4,
    )
    # doc 1 tokens: p q r s t u mid -> covered by union of [p..s] and
    # [s..mid] = 7 tokens; x y z w v survive
    assert out[1].n_removed_tokens == 7
    assert out[1].retained_hash == hashlib.md5(b"x y z w v").hexdigest()


def test_short_and_empty_docs_pass_through(spark):
    out = _run(spark, [(1, "tiny doc"), (2, ""), (3, "tiny doc")], span_n=8)
    # both real docs are shorter than span_n -> no windows, nothing cut,
    # even though they are exact copies (span dedup only sees >=span_n runs)
    assert out[1].n_removed_tokens == 0
    assert out[1].retained_hash == hashlib.md5(b"tiny doc").hexdigest()
    # empty text splits to one empty token (TOKEN_SPLIT semantics shared
    # with text_stats); nothing to cut, retained join is ''
    assert out[2].n_tokens == 1
    assert out[2].retained_hash == MD5_EMPTY


def test_min_docs_three_ignores_pairs(spark):
    text = "one two three four five"
    out = _run(
        spark, [(1, text), (2, text)], span_n=4, min_docs=3
    )
    assert out[1].n_removed_tokens == 0
    out = _run(
        spark, [(1, text), (2, text), (3, text)], span_n=4, min_docs=3
    )
    assert out[1].n_removed_tokens == 5


# ---------------------------------------------------------------------------
# randomized harness: Spark == pure-Python model == DuckDB twin
# ---------------------------------------------------------------------------


def _python_model(rows, span_n, min_docs):
    toks = {
        i: re.split(r"\s+", t.strip()) if t.strip() else [""]
        for i, t in rows
    }
    gram_docs: dict[str, set[int]] = {}
    for i, ws in toks.items():
        for s in range(0, max(len(ws) - span_n + 1, 0)):
            gram_docs.setdefault(" ".join(ws[s : s + span_n]), set()).add(i)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= min_docs}
    out = {}
    for i, ws in toks.items():
        covered: set[int] = set()
        for s in range(0, max(len(ws) - span_n + 1, 0)):
            if " ".join(ws[s : s + span_n]) in dup:
                covered.update(range(s, s + span_n))
        kept = " ".join(w for j, w in enumerate(ws) if j not in covered)
        out[i] = (
            len(ws),
            len(covered),
            hashlib.md5(kept.encode()).hexdigest(),
        )
    return out


@pytest.mark.parametrize("seed", range(8))
def test_random_corpus_three_engines(spark, seed):
    rng = random.Random(seed)
    vocab = [f"w{k}" for k in rng.sample(range(50), 12)]
    span_n = rng.choice([3, 4, 5])
    min_docs = rng.choice([2, 2, 3])
    rows = []
    for i in range(rng.randint(4, 14)):
        n = rng.randint(0, 20)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    # plant one exact copy so removal actually fires
    rows.append((99, rows[0][1]))

    model = _python_model(rows, span_n, min_docs)

    got = _run(spark, rows, span_n=span_n, min_docs=min_docs)
    assert set(got) == set(model)
    for i, (nt, nr, h) in model.items():
        r = got[i]
        assert (r.n_tokens, r.n_removed_tokens, r.retained_hash) == (
            nt, nr, h,
        ), f"seed={seed} doc={i}"

    con = duckdb.connect()
    vals = ",".join(
        "({}, '{}')".format(i, t.replace("'", "''")) for i, t in rows
    )
    con.sql(f"create view docs as select * from (values {vals}) t(doc_id, text)")
    du = con.sql(
        exact_substring_dedup_sql(
            "select * from docs", span_n=span_n, min_docs=min_docs
        )
    ).fetchall()
    for doc_id, nt, nr, h in du:
        assert model[doc_id] == (nt, nr, h), f"seed={seed} duckdb doc={doc_id}"


# ---------------------------------------------------------------------------
# adversarial overlap structure (VERDICT r10 #6): the known nasty shapes
# for covered-index union logic, each checked across all three engines
# ---------------------------------------------------------------------------


def _three_engines(spark, rows, span_n, min_docs=2):
    """Assert Spark == pure-Python model == DuckDB twin on one corpus and
    return the model for extra shape-specific assertions."""
    model = _python_model(rows, span_n, min_docs)
    got = _run(spark, rows, span_n=span_n, min_docs=min_docs)
    assert set(got) == set(model)
    for i, (nt, nr, h) in model.items():
        r = got[i]
        assert (r.n_tokens, r.n_removed_tokens, r.retained_hash) == (nt, nr, h), (
            f"spark doc={i}"
        )
    con = duckdb.connect()
    vals = ",".join(
        "({}, '{}')".format(i, t.replace("'", "''")) for i, t in rows
    )
    con.sql(
        f"create view docs as select * from (values {vals}) t(doc_id, text)"
    )
    du = con.sql(
        exact_substring_dedup_sql(
            "select * from docs", span_n=span_n, min_docs=min_docs
        )
    ).fetchall()
    for doc_id, nt, nr, h in du:
        assert model[doc_id] == (nt, nr, h), f"duckdb doc={doc_id}"
    return model


def test_periodic_string_period_below_span(spark):
    """Period-2 text with span_n=4: EVERY window of a periodic doc is the
    same two grams ('a b a b' / 'b a b a'), so covered spans overlap at
    every offset — the union logic's worst case.  Both periodic docs empty
    out entirely; the phase-shifted copy too (its windows are the same
    gram set)."""
    rows = [
        (1, "a b " * 10),          # 20 tokens, period 2
        (2, "b a " * 7),           # phase-shifted, shares both grams
        (3, "c d e f g h i j"),    # control: untouched
    ]
    model = _three_engines(spark, rows, span_n=4)
    assert model[1] == (20, 20, MD5_EMPTY)
    assert model[2] == (14, 14, MD5_EMPTY)
    assert model[3][1] == 0


def test_single_repeated_token_giant_doc(spark):
    """A doc that is ONE token repeated: every window is identical, every
    index is covered by span_n overlapping windows — covered-index dedup
    must still produce each index once (distinct before the fold)."""
    rows = [(1, "x " * 500), (2, "x " * 37), (3, "y z only here")]
    model = _three_engines(spark, rows, span_n=8)
    assert model[1] == (500, 500, MD5_EMPTY)
    assert model[2] == (37, 37, MD5_EMPTY)


def test_span_meets_array_boundaries_exactly(spark):
    """Duplicated spans sitting flush against the token-array ends: the
    first window starts at index 0 and the last window's end is exactly
    len-1 — off-by-one hazards in the sequence(start, start+span_n-1)
    fan-out."""
    shared_head = "h1 h2 h3 h4"
    shared_tail = "t1 t2 t3 t4"
    rows = [
        (1, f"{shared_head} mid1 mid2 {shared_tail}"),
        (2, f"{shared_head} other words {shared_tail}"),
        # exactly span_n tokens: one single window, the whole doc
        (3, shared_head),
    ]
    model = _three_engines(spark, rows, span_n=4)
    # head (0..3) and tail (len-4..len-1) cut; middles survive
    assert model[1] == (10, 8, hashlib.md5(b"mid1 mid2").hexdigest())
    assert model[2] == (10, 8, hashlib.md5(b"other words").hexdigest())
    assert model[3] == (4, 4, MD5_EMPTY)


def test_min_docs_exceeds_corpus_size(spark):
    """min_docs larger than the number of documents: nothing can ever be
    duplicated — full pass-through, no degenerate empty-join crash."""
    text = "same words in every single document here"
    rows = [(i, text) for i in range(3)]
    model = _three_engines(spark, rows, span_n=4, min_docs=10)
    for i in range(3):
        assert model[i][1] == 0


def test_span_n_one_cuts_every_shared_token(spark):
    """span_n=1 degenerates to token-level dedup: every token occurring in
    >= min_docs documents is cut wherever it appears (start == end index,
    sequence() emits exactly one element)."""
    rows = [
        (1, "alpha beta gamma"),
        (2, "beta delta"),
        (3, "gamma epsilon beta"),
    ]
    model = _three_engines(spark, rows, span_n=1)
    # beta (3 docs) and gamma (2 docs) cut everywhere; singles survive
    assert model[1] == (3, 2, hashlib.md5(b"alpha").hexdigest())
    assert model[2] == (2, 1, hashlib.md5(b"delta").hexdigest())
    assert model[3] == (3, 2, hashlib.md5(b"epsilon").hexdigest())


def test_periodic_vs_aperiodic_interleaving(spark):
    """A periodic core embedded mid-document between unique flanks, the
    duplicated region strictly interior — the cut must not bleed into the
    flanks even though the core's windows overlap each other maximally."""
    core = "p q " * 6            # 12 tokens, period 2
    rows = [
        (1, f"u1 u2 u3 {core.strip()} v1 v2 v3"),
        (2, f"w1 {core.strip()} w2"),
    ]
    model = _three_engines(spark, rows, span_n=4)
    assert model[1] == (
        18, 12, hashlib.md5(b"u1 u2 u3 v1 v2 v3").hexdigest()
    )
    assert model[2] == (14, 12, hashlib.md5(b"w1 w2").hexdigest())
