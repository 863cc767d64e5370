"""Document chunking (operators/text.py::chunk_documents)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from dbt_scd2_utils_spark.operators.text import chunk_documents, chunk_documents_sql
from dbt_scd2_utils_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_short_doc_single_chunk(spark):
    out = chunk_documents(_df(spark, ["a b c"]), max_tokens=5).collect()
    assert len(out) == 1
    assert out[0]["chunk_text"] == "a b c"
    assert out[0]["chunk_tokens"] == 3
    assert out[0]["chunk_idx"] == 0


def test_exact_multiple_no_overlap(spark):
    text = " ".join(str(i) for i in range(10))
    out = chunk_documents(_df(spark, [text]), max_tokens=5).orderBy("chunk_idx").collect()
    assert [r["chunk_text"] for r in out] == ["0 1 2 3 4", "5 6 7 8 9"]


def test_overlap_windows(spark):
    text = " ".join(str(i) for i in range(8))
    out = (
        chunk_documents(_df(spark, [text]), max_tokens=4, overlap=2)
        .orderBy("chunk_idx")
        .collect()
    )
    # stride 2, ceil((8-2)/2)=3 starts 0,2,4 — the last full window ends
    # exactly at the text end; no redundant trailing sub-window.
    assert [r["chunk_text"] for r in out] == [
        "0 1 2 3", "2 3 4 5", "4 5 6 7",
    ]
    # every token appears in at least one chunk
    seen = {t for r in out for t in r["chunk_text"].split()}
    assert seen == {str(i) for i in range(8)}


def test_overlap_must_be_smaller(spark):
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(_df(spark, ["x"]), max_tokens=4, overlap=4)


def test_matches_duckdb_oracle(spark):
    docs = load_table(spark, SF, "documents")
    got = chunk_documents(docs, max_tokens=32, overlap=8).toPandas()
    con = duckdb.connect()
    con.sql(f"create view documents as select * from '{SF}/documents.parquet'")
    want = con.sql(
        chunk_documents_sql("select * from documents", max_tokens=32, overlap=8)
    ).df()
    norm = lambda df: sorted(  # noqa: E731
        tuple(str(v) for v in r)
        for r in df.reindex(sorted(df.columns), axis=1).itertuples(index=False)
    )
    assert len(got) > len(docs.toPandas())
    assert norm(got) == norm(want)


def test_no_shuffle(spark):
    docs = load_table(spark, SF, "documents")
    plan = (
        chunk_documents(docs, max_tokens=32)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_paragraph_dedup_stats(spark):
    from dbt_scd2_utils_spark.operators.dedup import paragraph_dedup_stats

    # doc 0 and doc 1 share a paragraph-sized block; doc 2 is unique.
    block = " ".join(f"w{i}" for i in range(16))
    other = " ".join(f"x{i}" for i in range(16))
    df = _df(spark, [block + " " + other, block, "unique words only"])
    out = {
        r["doc_id"]: (r["n_paragraphs"], r["n_duplicate"], r["dup_bp"])
        for r in paragraph_dedup_stats(df, para_tokens=16).collect()
    }
    assert out[0] == (2, 0, 0)        # doc 0 owns both canonical copies
    assert out[1] == (1, 1, 10000)    # doc 1's only paragraph is a dup
    assert out[2] == (1, 0, 0)


def test_paragraph_dedup_matches_duckdb(spark):
    import duckdb

    from dbt_scd2_utils_spark.operators.dedup import (
        paragraph_dedup_stats,
        paragraph_dedup_stats_sql,
    )

    docs = load_table(spark, SF, "documents")
    got = paragraph_dedup_stats(docs).toPandas()
    con = duckdb.connect()
    con.sql(f"create view documents as select * from '{SF}/documents.parquet'")
    want = con.sql(paragraph_dedup_stats_sql("select * from documents")).df()
    norm = lambda df: sorted(  # noqa: E731
        tuple(str(v) for v in r)
        for r in df.reindex(sorted(df.columns), axis=1).itertuples(index=False)
    )
    assert (got["n_duplicate"] > 0).any()  # the corpus really has dups
    assert norm(got) == norm(want)


def test_chunking_invariants_random(spark):
    """Random docs: every token covered, no chunk exceeds max_tokens,
    consecutive chunks overlap by exactly `overlap` (except the final
    short chunk), and reassembly without overlap restores the doc."""
    import random

    from dbt_scd2_utils_spark.operators.text import chunk_documents

    rng = random.Random(99)
    texts = [
        " ".join(f"t{rng.randrange(1000)}_{i}_{j}" for j in range(rng.randint(1, 90)))
        for i in range(25)
    ]
    df = _df(spark, texts)
    for max_tokens, overlap in [(7, 0), (10, 3), (16, 8)]:
        stride = max_tokens - overlap
        rows = (
            chunk_documents(df, max_tokens=max_tokens, overlap=overlap)
            .orderBy("doc_id", "chunk_idx")
            .collect()
        )
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for i, text in enumerate(texts):
            words = text.split()
            chunks = [r["chunk_text"].split() for r in by_doc[i]]
            assert all(len(c) <= max_tokens for c in chunks)
            # start offsets step by stride; chunk c equals the source slice
            for ci, c in enumerate(chunks):
                assert c == words[ci * stride : ci * stride + max_tokens]
            # full coverage: the last chunk reaches the end of the doc
            last_start = (len(chunks) - 1) * stride
            assert last_start + len(chunks[-1]) == len(words)
