"""Canonical-form dedup (operators/dedup.py::normalized_exact_dedup)."""

from __future__ import annotations

from dbt_scd2_utils_spark.operators.dedup import (
    exact_dedup,
    normalized_exact_dedup,
)


def test_reformatted_copies_collapse(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello, World!"),
            (2, "hello world"),
            (3, "HELLO    WORLD?!"),
            (4, "hello,world"),
            (5, "goodbye world"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in normalized_exact_dedup(df).collect()}
    # 1,2,3,4 all normalize to 'hello world' (punctuation maps to space,
    # runs collapse) → one group, min-id survivor 1.
    assert out[1].dup_count == 4
    assert 2 not in out and 3 not in out and 4 not in out
    assert out[5].dup_count == 1
    # byte-exact dedup keeps all five
    assert exact_dedup(df).count() == 5


def test_unicode_letters_survive_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Café Déjà-Vu"), (2, "café déjà vu"), (3, "cafe deja vu")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in normalized_exact_dedup(df).collect()}
    # accented letters are \p{L}: kept, not stripped; the hyphen becomes
    # a space so 'Déjà-Vu' ≡ 'déjà vu' — but no accent folding: ≠ 'deja'
    assert out[1].dup_count == 2
    assert out[3].dup_count == 1


def test_minhash_max_bucket_caps_floods_and_matches_duckdb(spark):
    """max_bucket (the mega-bucket safety valve): a 30-doc identical
    flood is dropped from the candidate stream while an ordinary
    near-dup pair survives; default None is unchanged; Spark ≡ the
    DuckDB twin under the cap."""
    import duckdb

    from dbt_scd2_utils_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_sql,
    )

    flood = [(i, "the same boilerplate page text repeated verbatim here")
             for i in range(30)]
    pair = [
        (100, "a genuinely unique document about spark shuffle tuning"),
        (101, "a genuinely unique document about spark shuffle tuning!"),
    ]
    loners = [(200 + i, f"completely distinct text number {i} "
               f"with words w{i}a w{i}b w{i}c") for i in range(5)]
    df = spark.createDataFrame(
        flood + pair + loners, "doc_id long, text string"
    )

    capped = minhash_lsh_pairs(df, max_bucket=10).toPandas()
    assert not ((capped.id_a < 30) & (capped.id_b < 30)).any()  # flood gone
    assert ((capped.id_a == 100) & (capped.id_b == 101)).any()  # pair kept

    uncapped = minhash_lsh_pairs(df).toPandas()
    assert ((uncapped.id_a < 30) & (uncapped.id_b < 30)).sum() == 30 * 29 // 2

    con = duckdb.connect()
    con.register("d", df.toPandas())
    want = con.sql(
        minhash_lsh_pairs_sql("select * from d", max_bucket=10)
    ).df()
    key = ["id_a", "id_b"]
    g = capped.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert g.astype(str).equals(w[g.columns].astype(str))
