"""BPE merge learning (operators/bpe.py::learn_bpe_merges)."""

from __future__ import annotations

from dbt_scd2_utils_spark.operators.bpe import learn_bpe_merges


def _merges(spark, texts, n):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in learn_bpe_merges(df, n_merges=n)
        .orderBy("merge_rank")
        .collect()
    ]


def test_classic_pair_learning(spark):
    # 'low' ×5, 'lower' ×2: first merge is (l,o) with count 7
    out = _merges(spark, ["low low low low low", "lower lower"], 3)
    assert out[0][1:] == ("l", "o", 7)
    # second: (lo, w) count 7 beats anything in 'lower' alone
    assert out[1][1:] == ("lo", "w", 7)
    # third: 'low</w>' finishes (count 5) vs lower's pairs (count 2)
    assert out[2][1:] == ("low", "</w>", 5)


def test_overlapping_run_merges_leftmost_nonoverlapping(spark):
    # one word 'aaaa' → symbols [a,a,a,a,</w>]: pair (a,a) counted at
    # 3 adjacent positions, merged leftmost-first to [aa,aa,</w>]
    out = _merges(spark, ["aaaa"], 2)
    assert out[0][1:] == ("a", "a", 3)
    # after the merge the symbol stream is [aa, aa, </w>]: pairs
    # (aa,aa)×1 and (aa,</w>)×1 tie on count → right-side tiebreak
    # '</w>' < 'aa' lexicographically
    assert out[1][1:] == ("aa", "</w>", 1)


def test_merged_symbols_feed_later_rounds(spark):
    out = _merges(spark, ["ababab ababab ababab"], 2)
    # (a,b) dominates, then the merged 'ab' pairs with itself
    assert out[0][1] == "a" and out[0][2] == "b"
    assert out[1][1] == "ab" and out[1][2] == "ab"


def test_case_folding_and_empty_docs(spark):
    out = _merges(spark, ["LOW low", "", "   "], 1)
    # 'LOW' folds into 'low' (freq 2); no crash on empty docs
    assert out[0][1:] == ("l", "o", 2)


def test_token_counts_shrink_with_merges(spark):
    from pyspark.sql import functions as F

    from dbt_scd2_utils_spark.operators.bpe import bpe_token_counts

    df = spark.createDataFrame(
        [(1, "low low lower"), (2, "low")], "doc_id long, text string"
    )
    zero = bpe_token_counts(df, n_merges=0)
    some = bpe_token_counts(df, n_merges=4)
    z = {r.doc_id: r for r in zero.collect()}
    s = {r.doc_id: r for r in some.collect()}
    # 0 merges: chars + marker — 'low'=4 symbols, 'lower'=6
    assert z[1].n_bpe_tokens == 4 + 4 + 6
    assert z[2].n_bpe_tokens == 4
    # merges only ever shrink the piece count; word counts unchanged
    assert s[1].n_bpe_tokens < z[1].n_bpe_tokens
    assert s[2].n_bpe_tokens < z[2].n_bpe_tokens
    assert (s[1].n_words, s[2].n_words) == (3, 1)
    # identical words tokenize identically across documents
    low_pieces = s[2].n_bpe_tokens
    assert s[1].n_bpe_tokens >= 2 * low_pieces


def test_driver_local_equals_distributed(spark):
    """The O(1)-job driver-local learner (round 5) is pinned to the
    original all-in-plan windowed formulation — same merges, same
    corpus-weighted counts, at a depth where merged symbols feed many
    later rounds."""
    from dbt_scd2_utils_spark.operators.bpe import (
        learn_bpe_merges_distributed,
    )

    texts = [
        "low lower lowest slow slower",
        "new newer newest knew",
        "aaaa aaab abab low low low",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    fast = [
        tuple(r)
        for r in learn_bpe_merges(df, n_merges=12)
        .orderBy("merge_rank")
        .collect()
    ]
    slow = [
        tuple(r)
        for r in learn_bpe_merges_distributed(df, n_merges=12)
        .orderBy("merge_rank")
        .collect()
    ]
    assert fast == slow


def test_learner_saturates_cleanly(spark):
    # asking for more merges than exist stops at saturation, no error
    df = spark.createDataFrame([("ab ab",)], "text string")
    out = learn_bpe_merges(df, n_merges=50).collect()
    # 'ab' → [a,b,</w>]: merges (a,b) then (ab,</w>) — exactly 2
    assert len(out) == 2


def test_max_vocab_truncation_is_deterministic(spark):
    df = spark.createDataFrame(
        [("low low low rare",)], "text string"
    )
    # max_vocab=1 keeps only 'low' (freq 3 beats 'rare' 1)
    out = [
        tuple(r)[1:]
        for r in learn_bpe_merges(df, n_merges=1, max_vocab=1).collect()
    ]
    assert out == [("l", "o", 3)]


def test_token_counts_oov_fallback(spark):
    """A segmentation learned on corpus A applied to corpus B counts
    OOV words at character-level pieces (len+1) instead of dropping
    them (round-5 ADVICE fix)."""
    from dbt_scd2_utils_spark.operators.bpe import _learn, bpe_token_counts

    corpus_a = spark.createDataFrame([("low low",)], "text string")
    learned = _learn(corpus_a, 2, "text")
    corpus_b = spark.createDataFrame(
        [(1, "low zzz")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in bpe_token_counts(corpus_b, learned=learned).collect()
    }
    # both words counted: 'low' under its merges, 'zzz' at len+1 = 4
    assert out[1].n_words == 2
    low_pieces = out[1].n_bpe_tokens - 4
    assert 1 <= low_pieces <= 4


def test_default_max_vocab_is_bounded(spark):
    """The DEFAULT collect path must be driver-memory-bounded: the
    default ``max_vocab`` is the 2M frequency-ranked cut, not None
    (round-6 VERDICT: unbounded default = driver OOM at corpus scale).
    ``None`` remains an explicit opt-in and yields identical merges
    whenever the true vocabulary fits under the bound."""
    import inspect

    from dbt_scd2_utils_spark.operators.bpe import (
        DEFAULT_MAX_VOCAB,
        bpe_token_counts,
        learn_bpe_merges,
    )

    assert DEFAULT_MAX_VOCAB == 2_000_000
    for fn in (learn_bpe_merges, bpe_token_counts):
        assert (
            inspect.signature(fn).parameters["max_vocab"].default
            == DEFAULT_MAX_VOCAB
        )

    df = spark.createDataFrame(
        [("low low low lower lowest",)], "text string"
    )
    bounded = [tuple(r) for r in learn_bpe_merges(df, n_merges=3).collect()]
    unbounded = [
        tuple(r)
        for r in learn_bpe_merges(df, n_merges=3, max_vocab=None).collect()
    ]
    assert bounded == unbounded and len(bounded) == 3
