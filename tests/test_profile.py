"""profile_columns (operators/profile.py)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from dbt_scd2_utils_spark.operators.profile import (
    profile_columns,
    profile_columns_sql,
)
from dbt_scd2_utils_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
COLS = ("l_orderkey", "l_partkey", "l_returnflag", "l_shipdate")


def test_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "a")], "k long, s string"
    )
    out = {r["column_name"]: r for r in profile_columns(df, ["k", "s"]).collect()}
    assert out["k"]["n_rows"] == 4
    assert out["k"]["n_non_null"] == 3
    assert out["k"]["n_distinct"] == 2
    assert out["k"]["min_value"] == "1" and out["k"]["max_value"] == "2"
    assert out["s"]["n_non_null"] == 3
    assert out["s"]["n_distinct"] == 2


def test_single_scan(spark):
    li = load_table(spark, SF, "lineitem")
    plan = (
        profile_columns(li, COLS)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet") == 1


def test_approx_mode_no_expand(spark):
    li = load_table(spark, SF, "lineitem")
    exact = profile_columns(li, COLS)._jdf.queryExecution().executedPlan().toString()
    approx = (
        profile_columns(li, COLS, exact=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" in exact and "Expand" not in approx


def test_empty_cols_raises(spark):
    with pytest.raises(ValueError):
        profile_columns(load_table(spark, SF, "lineitem"), [])


def test_matches_duckdb(spark):
    li = load_table(spark, SF, "lineitem")
    got = profile_columns(li, COLS).toPandas()
    con = duckdb.connect()
    con.sql(f"create view lineitem as select * from '{SF}/lineitem.parquet'")
    want = con.sql(profile_columns_sql("select * from lineitem", COLS)).df()
    norm = lambda df: sorted(  # noqa: E731
        tuple(str(v) for v in r)
        for r in df.reindex(sorted(df.columns), axis=1).itertuples(index=False)
    )
    assert norm(got) == norm(want)


def test_numeric_quantiles_exact_rank_selection(spark):
    from dbt_scd2_utils_spark.operators.profile import numeric_quantiles

    # 11 values 0..10 → (n-1)·q/10000: q2500→rank 2 (value 2),
    # q5000→rank 5, q9000→rank 9; nulls excluded from ranks entirely.
    df = spark.createDataFrame(
        [(float(i),) for i in range(11)] + [(None,)], "x double"
    )
    out = {
        r.q_bp: r.value
        for r in numeric_quantiles(df, ["x"], (2500, 5000, 9000)).collect()
    }
    assert out == {2500: 2.0, 5000: 5.0, 9000: 9.0}


def test_numeric_quantiles_duplicate_heavy_column(spark):
    from dbt_scd2_utils_spark.operators.profile import numeric_quantiles

    # 90 zeros + 10 ones: median rank 49 → 0.0; q9500 rank 94 → 1.0
    df = spark.createDataFrame(
        [(0.0,)] * 90 + [(1.0,)] * 10, "x double"
    )
    out = {
        r.q_bp: r.value
        for r in numeric_quantiles(df, ["x"], (5000, 9500)).collect()
    }
    assert out == {5000: 0.0, 9500: 1.0}


def test_numeric_quantiles_value_exists_in_data(spark):
    from dbt_scd2_utils_spark.operators.profile import numeric_quantiles
    from dbt_scd2_utils_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    rows = numeric_quantiles(li, ["l_extendedprice"], (5000,)).collect()
    vals = {r.l_extendedprice for r in li.select("l_extendedprice").collect()}
    assert float(rows[0].value) in {float(v) for v in vals}


def test_dataset_card_exact_values(spark):
    from dbt_scd2_utils_spark.operators.profile import dataset_card

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps", "en", "a"),
            (2, "the quick brown fox jumps", "en", "b"),   # exact dup
            (3, "une autre phrase ici", "fr", "a"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    card = dataset_card(df).collect()[0]
    assert card.n_docs == 3
    assert card.n_tokens == 5 + 5 + 4
    assert card.n_langs == 2 and card.n_sources == 2
    assert card.exact_dup_bp == 1 * 10000 // 3  # one non-first copy
    assert 0 <= card.mean_quality_micro <= 1_000_000
