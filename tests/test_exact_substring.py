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
