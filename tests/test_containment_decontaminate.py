"""Containment decontamination semantics
(operators/dedup.py::containment_decontaminate): overlap FRACTION of the
benchmark item, not Jaccard — a long doc embedding a short eval item must
flag even though its Jaccard is near zero."""

from __future__ import annotations

from dbt_scd2_utils_spark.operators.dedup import (
    containment_decontaminate,
    ngram_jaccard_pairs,
)


def _run(spark, corpus_rows, bench_rows, **kw):
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
    out = containment_decontaminate(corpus, bench, **kw)
    return {r.doc_id: r.asDict() for r in out.collect()}


def test_long_doc_embedding_short_bench_item_flags(spark):
    bench_text = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"filler{i}" for i in range(200))
    rows = _run(
        spark,
        [(1, filler + " " + bench_text + " " + filler),
         (2, filler)],
        [(100, bench_text)],
        shingle_n=3,
        threshold=0.5,
        max_df=None,
    )
    # Doc 1 contains every benchmark 3-gram → containment = 1.0 …
    assert rows[1]["is_contaminated"]
    assert rows[1]["max_containment_micro"] == 1_000_000
    assert rows[1]["n_bench_hits"] == 1
    # … while its Jaccard vs the bench item is tiny (this is the case the
    # Jaccard-threshold path cannot catch).
    corpus = spark.createDataFrame(
        [(1, filler + " " + bench_text + " " + filler), (100, bench_text)],
        "doc_id long, text string",
    )
    pairs = ngram_jaccard_pairs(corpus, shingle_n=3, threshold=0.05).collect()
    assert pairs == []
    # The pure-filler doc shares nothing.
    assert not rows[2]["is_contaminated"]
    assert rows[2]["max_containment_micro"] == 0


def test_threshold_and_hit_count(spark):
    # Doc shares exactly half of bench A's grams and all of bench B's.
    rows = _run(
        spark,
        [(1, "a b c d x y z w")],
        [(10, "a b c d e f g h"), (11, "x y z w")],
        shingle_n=2,
        threshold=0.5,
        max_df=None,
    )
    # bench 10 bigrams: {ab,bc,cd,de,ef,fg,gh} → shared {ab,bc,cd} = 3/7 < .5
    # bench 11 bigrams: {xy,yz,zw} → shared 3/3 = 1.0
    assert rows[1]["n_bench_hits"] == 1
    assert rows[1]["max_containment_micro"] == 1_000_000


def test_boilerplate_pruning_keeps_denominator_honest(spark):
    # 'terms of service' appears in every corpus doc (df=3 > max_df=2);
    # pruning drops it from BOTH sides, so doc 1 still reaches 1.0 on the
    # surviving benchmark gram rather than being diluted.
    rows = _run(
        spark,
        [
            (1, "terms of service unique alpha beta"),
            (2, "terms of service something else one"),
            (3, "terms of service another thing two"),
        ],
        [(10, "terms of service unique alpha beta")],
        shingle_n=3,
        threshold=0.9,
        max_df=2,
    )
    assert rows[1]["is_contaminated"]
    assert rows[1]["max_containment_micro"] == 1_000_000
    assert not rows[2]["is_contaminated"]
    assert not rows[3]["is_contaminated"]
