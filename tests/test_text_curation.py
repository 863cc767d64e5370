"""Curation operators: repetition quality signals (operators/text.py) and
benchmark n-gram decontamination (operators/dedup.py) — hand-computed
expectations."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_scd2_utils_spark.operators.dedup import ngram_decontaminate
from dbt_scd2_utils_spark.operators.text import repetition_stats


def test_repetition_stats_hand_computed(spark):
    df = spark.createDataFrame(
        [
            # "a b a b a b": 2-grams = [a b, b a, a b, b a, a b] → n=5,
            # distinct=2, top=3
            (1, "a b a b a b"),
            # all-distinct 2-grams → dup_bp 0, top_bp = 10000//3
            (2, "w x y z"),
            # single word: shorter than n → one whole-text gram
            (3, "solo"),
        ],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert rows[1]["n_grams"] == 5 and rows[1]["n_distinct_grams"] == 2
    assert rows[1]["top_gram_count"] == 3
    assert rows[1]["dup_gram_bp"] == (5 - 2) * 10000 // 5 == 6000
    assert rows[1]["top_gram_bp"] == 3 * 10000 // 5 == 6000
    assert rows[2]["n_grams"] == 3 and rows[2]["dup_gram_bp"] == 0
    assert rows[2]["top_gram_bp"] == 10000 // 3
    assert rows[3]["n_grams"] == 1 and rows[3]["top_gram_bp"] == 10000


def test_ngram_decontaminate_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words here now"),
            (3, "quick brown fox jumps elsewhere"),  # shares one 4-gram path
            (4, "tiny"),  # shorter than n → whole-text gram
        ],
        "doc_id int, text string",
    )
    bench = spark.createDataFrame(
        [(100, "watch the quick brown fox jumps today"), (101, "tiny")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in ngram_decontaminate(docs, bench, n=4).collect()}
    # doc 1 shares "the quick brown fox" and "quick brown fox jumps"
    assert out[1]["is_contaminated"] and out[1]["contaminated_grams"] == 2
    assert not out[2]["is_contaminated"] and out[2]["contaminated_grams"] == 0
    # doc 3 shares "quick brown fox jumps" only
    assert out[3]["is_contaminated"] and out[3]["contaminated_grams"] == 1
    # whole-text fallback gram "tiny" matches the benchmark's whole-text gram
    assert out[4]["is_contaminated"] and out[4]["contaminated_grams"] == 1
    # every input doc appears exactly once
    assert set(out) == {1, 2, 3, 4}


def test_decontaminate_plan_is_equi_join(spark):
    """The benchmark join must be an equi-join on the gram (broadcastable),
    never a nested-loop: assert no CartesianProduct/BroadcastNestedLoop in
    the plan."""
    docs = spark.range(100).select(
        F.col("id").cast("int").alias("doc_id"),
        F.concat(F.lit("w"), F.col("id")).alias("text"),
    )
    plan = (
        ngram_decontaminate(docs, docs.limit(10), n=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_scrub_pii_order_and_counts(spark):
    from dbt_scd2_utils_spark.operators.text import scrub_pii

    df = spark.createDataFrame(
        [
            # email INSIDE a URL counts once, as the URL
            (1, "see https://x.io/u?mail=bob@x.com then mail carol@y.org"),
            (2, "call 555-123-4567 or 555.987.6543 twice"),
            (3, "clean text with no identifiers at all"),
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert (out[1]["n_urls"], out[1]["n_emails"], out[1]["n_phones"]) == (1, 1, 0)
    assert out[1]["scrubbed_text"] == "see <URL> then mail <EMAIL>"
    assert (out[2]["n_urls"], out[2]["n_emails"], out[2]["n_phones"]) == (0, 0, 2)
    assert out[2]["scrubbed_text"] == "call <PHONE> or <PHONE> twice"
    assert out[3]["scrubbed_text"] == "clean text with no identifiers at all"
    assert (out[3]["n_urls"], out[3]["n_emails"], out[3]["n_phones"]) == (0, 0, 0)


def test_minhash_novelty_flags_dup_and_novel(spark):
    from dbt_scd2_utils_spark.operators.dedup import minhash_novelty

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again today"),
            (2, "completely unrelated text about spark query planning engines"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            # exact copy of corpus doc 1 -> duplicate
            (10, "the quick brown fox jumps over the lazy dog again today"),
            # nothing in common with the corpus -> novel
            (11, "zebra walrus penguin iguana yak otter badger newt stoat mole"),
        ],
        "doc_id long, text string",
    )
    out = {r.id: r for r in minhash_novelty(new, corpus, threshold=0.5).collect()}
    assert set(out) == {10, 11}
    assert not out[10].is_novel and out[10].n_dup_matches >= 1
    assert out[11].is_novel and out[11].n_dup_matches == 0


def test_banded_minhash_index_shape(spark):
    from dbt_scd2_utils_spark.operators.dedup import banded_minhash_index

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "g h i j k l")], "doc_id long, text string"
    )
    idx = banded_minhash_index(df, k=12, bands=4).collect()
    # one row per doc per band
    assert len(idx) == 2 * 4
    assert {r.band for r in idx} == {0, 1, 2, 3}


def test_minhash_index_roundtrip_equals_recompute(spark, tmp_path):
    from dbt_scd2_utils_spark.operators.dedup import (
        banded_minhash_index,
        load_minhash_index,
        minhash_novelty,
        save_minhash_index,
    )

    corpus = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta doc {i} body words") for i in range(20)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta doc 3 body words"),
         (101, "totally disjoint vocabulary nothing shared here at all ok")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "mh_index")
    save_minhash_index(banded_minhash_index(corpus), path)
    idx = load_minhash_index(spark, path)
    via_index = minhash_novelty(new, corpus, corpus_index=idx).collect()
    recomputed = minhash_novelty(new, corpus).collect()
    assert sorted(map(tuple, via_index)) == sorted(map(tuple, recomputed))
    flags = {r.id: r.is_novel for r in via_index}
    assert flags == {100: False, 101: True}
