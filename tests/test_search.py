"""Semantic tests for operators/search.py (BM25 retrieval + bigram-LM
quality scoring) on hand-built corpora — oracle parity is covered by
tests/test_oracle_parity.py; these pin the retrieval/LM behavior itself."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dbt_scd2_utils_spark.operators.search import bm25_topk, ngram_lm_score


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark, rows):
    return spark.createDataFrame(rows, "query_id long, query_text string")


def test_bm25_rare_term_outranks_common(spark):
    """A document matching the query's RARE term must outrank one matching
    only the ubiquitous term (the idf core of BM25)."""
    docs = _docs(
        spark,
        [
            (1, "common zebra common common"),
            (2, "common common common common"),
            (3, "common common common common"),
            (4, "common common common common"),
        ],
    )
    qs = _queries(spark, [(10, "zebra common")])
    out = bm25_topk(docs, qs, k=4, max_df_frac=None).collect()
    ranked = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked[0] == 1
    # identical docs 2/3/4 score exactly equal -> deterministic id tiebreak
    assert ranked[1:] == [2, 3, 4]


def test_bm25_score_matches_closed_form(spark):
    """score_micro equals the hand-computed Okapi formula, per term
    quantized to micros then integer-summed."""
    docs = _docs(spark, [(1, "a b b"), (2, "a a c c")])
    qs = _queries(spark, [(7, "b c")])
    out = {
        r["doc_id"]: r["score_micro"]
        for r in bm25_topk(docs, qs, k=10, max_df_frac=None).collect()
    }
    # N=2, total_len=7; doc1: dl=3, tf(b)=2, df(b)=1; doc2: dl=4, tf(c)=2, df(c)=1
    k1, b = 1.2, 0.75

    def contrib(tf, dl, df, N=2, total_len=7):
        idf = math.log(1.0 + ((N - df + 0.5) / (df + 0.5)))
        tfn = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl * N / total_len))
        return round(1e6 * idf * tfn)

    assert out[1] == contrib(2, 3, 1)
    assert out[2] == contrib(2, 4, 1)


def test_bm25_max_df_prunes_stopword(spark):
    """With max_df_frac=0.5 a term in every document contributes nothing:
    a doc matching ONLY the stopword drops out of the results."""
    docs = _docs(
        spark,
        [
            (1, "the zebra"),
            (2, "the cat"),
            (3, "the dog"),
        ],
    )
    qs = _queries(spark, [(1, "the zebra")])
    out = bm25_topk(docs, qs, k=10, max_df_frac=0.5).collect()
    assert {r["doc_id"] for r in out} == {1}  # docs 2/3 matched only "the"


def test_bm25_case_insensitive(spark):
    docs = _docs(spark, [(1, "Zebra Stripes"), (2, "plain horse")])
    qs = _queries(spark, [(1, "zebra")])
    out = bm25_topk(docs, qs, k=1, max_df_frac=None).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_lm_score_zeros_for_short_docs(spark):
    docs = _docs(spark, [(1, "solo"), (2, ""), (3, "a b a b")])
    out = {r["doc_id"]: r for r in ngram_lm_score(docs).collect()}
    assert len(out) == 3  # one row per input document
    for d in (1, 2):
        assert out[d]["n_bigrams"] == 0
        assert out[d]["nll_micro"] == 0
        assert out[d]["avg_nll_micro"] == 0
    assert out[3]["n_bigrams"] == 3


def test_lm_score_matches_closed_form(spark):
    """NLL equals the hand-computed add-0.5 bigram model: repeated
    in-corpus bigrams score lower (more likely) than a one-off."""
    docs = _docs(spark, [(1, "a b a b"), (2, "a c")])
    out = {r["doc_id"]: r for r in ngram_lm_score(docs).collect()}
    # corpus bigrams: doc1 -> (a,b)x2, (b,a)x1; doc2 -> (a,c)x1
    # prefix counts: c1(a)=3, c1(b)=1; vocab = {a,b,c} -> V=3
    a = 0.5

    def nll(c2, c1, V=3):
        return round(-1e6 * math.log((c2 + a) / (c1 + a * V)))

    exp1 = 2 * nll(2, 3) + 1 * nll(1, 1)
    exp2 = 1 * nll(1, 3)
    assert out[1]["n_bigrams"] == 3
    assert out[1]["nll_micro"] == exp1
    assert out[1]["avg_nll_micro"] == exp1 // 3
    assert out[2]["nll_micro"] == exp2
    # the common bigram (a,b| seen twice) is more likely than the one-off
    # (a,c): per-position NLL ordering sanity
    assert nll(2, 3) < nll(1, 3)


def test_lm_score_flags_gibberish_vs_template(spark):
    """The curation use: documents made of corpus-typical bigrams score a
    lower avg NLL than a document of never-repeated transitions."""
    template = "the quick brown fox jumps over the lazy dog"
    rows = [(i, template) for i in range(10)]
    rows.append((99, "zxq plormf wibble the snarf quux"))
    out = {r["doc_id"]: r["avg_nll_micro"] for r in ngram_lm_score(_docs(spark, rows)).collect()}
    assert out[99] > out[0]


def test_bm25_static_pruning_matches_duckdb_and_keeps_top_doc(spark):
    """max_postings_per_term (WAND-style static pruning): the Spark and
    DuckDB formulations stay value-identical under truncation, the
    truncated index still surfaces each term's highest-impact document,
    and pruning=None reproduces the exact ranking."""
    import duckdb

    from dbt_scd2_utils_spark.operators.search import bm25_topk_sql

    rows = [
        (i, " ".join(["common"] * (1 + i % 3) + (["rare"] if i % 7 == 0 else [])))
        for i in range(40)
    ]
    docs = _docs(spark, rows)
    qs = _queries(spark, [(0, "rare common")])

    got = bm25_topk(
        docs, qs, k=5, max_df_frac=None, max_postings_per_term=3
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)

    con = duckdb.connect()
    con.register("d", docs.toPandas())
    con.register("q", qs.toPandas())
    want = con.sql(
        bm25_topk_sql(
            "select * from d", "select * from q",
            k=5, max_df_frac=None, max_postings_per_term=3,
        )
    ).df().sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert got.astype(str).equals(want.astype(str))

    # the exact (unpruned) top-1 survives pruning: its posting is the
    # highest-impact entry of the 'rare' list
    exact = bm25_topk(docs, qs, k=5, max_df_frac=None)
    assert got.doc_id[0] == exact.orderBy("rank").first().doc_id


def test_bm25_disk_index_probe_prunes_partitions(spark):
    """save/load round trip: a probe against the on-disk bucketed index
    is value-identical to the direct path, and its scan carries a
    dynamic-partition-pruning filter on term_bucket (the probe reads
    O(query terms) buckets, not the whole postings table)."""
    import tempfile

    from dbt_scd2_utils_spark.operators.search import (
        bm25_index,
        load_bm25_index,
        save_bm25_index,
    )

    docs = _docs(
        spark,
        [(i, f"alpha beta w{i} w{i % 9} gamma") for i in range(60)],
    )
    qs = _queries(spark, [(0, "alpha w3"), (1, "gamma w7")])
    direct = bm25_topk(docs, qs, k=5).toPandas()
    base = tempfile.mkdtemp(prefix="t_bm25_idx_")
    save_bm25_index(bm25_index(docs), f"{base}/idx")
    probe = bm25_topk(None, qs, k=5, index=load_bm25_index(spark, f"{base}/idx"))
    got = probe.toPandas()
    key = ["query_id", "rank"]
    assert (
        got.sort_values(key).reset_index(drop=True).astype(str)
        .equals(direct.sort_values(key).reset_index(drop=True).astype(str))
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()


def test_bm25_index_append_equals_rebuild(spark):
    """Incremental maintenance: append-tokenize-union-rederive is
    value-identical to rebuilding the index from the full corpus, and
    probing the appended index surfaces the appended documents."""
    from dbt_scd2_utils_spark.operators.search import (
        bm25_index,
        bm25_index_append,
    )

    old_docs = _docs(
        spark, [(i, f"alpha beta w{i % 7} gamma") for i in range(30)]
    )
    new_docs = _docs(
        spark, [(100 + i, f"delta epsilon w{i % 3}") for i in range(10)]
    )
    # the MAINTAINED copy is unpruned (pruning loses tf rows — the
    # append contract); the probe copy can prune downstream
    maintained = bm25_index(old_docs, max_df_frac=None)
    appended = bm25_index_append(maintained, new_docs, max_df_frac=None)
    rebuilt = bm25_index(old_docs.unionByName(new_docs), max_df_frac=None)
    key = ["term", "doc_id"]
    a = appended.toPandas().sort_values(key).reset_index(drop=True)
    r = rebuilt.toPandas().sort_values(key).reset_index(drop=True)
    assert a[r.columns].astype(str).equals(r.astype(str))

    qs = _queries(spark, [(0, "delta")])
    hits = bm25_topk(None, qs, k=5, index=appended)
    assert {r.doc_id for r in hits.collect()} <= set(range(100, 110))
    assert hits.count() > 0


def test_bm25_salted_pruning_equals_single_window(spark):
    """The two-phase salted top-K in _bm25_from_tf must be EXACTLY the
    plain global per-term window (the skew fix may not change a single
    posting).  Hot term: 'hot' appears in all 200 docs with varying tf
    (so contribs differ and more than one salt group survives phase 1);
    K far below df forces real truncation."""
    from pyspark.sql import Window

    from dbt_scd2_utils_spark.operators.search import bm25_index

    rows = [
        (i, " ".join(["hot"] * (1 + i % 9) + [f"tail{i % 40}"]))
        for i in range(200)
    ]
    docs = _docs(spark, rows)
    k = 10
    got = bm25_index(docs, max_df_frac=None, max_postings_per_term=k)

    full = bm25_index(docs, max_df_frac=None, max_postings_per_term=None)
    w = Window.partitionBy("term").orderBy(
        F.col("contrib_micro").desc(), F.col("doc_id").asc()
    )
    want = (
        full.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )
    key = ["term", "doc_id"]
    g = got.toPandas().sort_values(key).reset_index(drop=True)
    x = want.toPandas().sort_values(key).reset_index(drop=True)
    assert g[x.columns].astype(str).equals(x.astype(str))
    # the hot term really was truncated
    assert g[g.term == "hot"].shape[0] == k
