"""scd2_join temporal spine join — fixtures modeled on
integration_tests/seeds/scd2_join/ (customers + addresses + credit_ratings
with interleaved change instants; composite-key orders/order_items)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from dbt_scd2_utils_spark import ScdConfig, scd2_initial_load
from dbt_scd2_utils_spark.operators.temporal_join import scd2_join

T = lambda s: datetime.fromisoformat(s)  # noqa: E731
FAR = T("2999-12-31 23:59:59")


def build_scd2(spark, rows, schema, keys):
    df = spark.createDataFrame(rows, schema)
    return scd2_initial_load(df, ScdConfig(unique_key=tuple(keys)))


def test_two_table_spine(spark):
    customers = build_scd2(
        spark,
        [
            (1, "John", "j@x.com", T("2024-01-01 00:00:00")),
            (1, "Johnny", "j@x.com", T("2024-01-15 00:00:00")),
        ],
        "customer_id int, customer_name string, email string, _updated_at timestamp",
        ["customer_id"],
    )
    addresses = build_scd2(
        spark,
        [
            (1, "NYC", "NY", T("2024-01-01 00:00:00")),
            (1, "Boston", "MA", T("2024-01-10 00:00:00")),
        ],
        "customer_id int, city string, state string, _updated_at timestamp",
        ["customer_id"],
    )
    out = scd2_join([customers, addresses], ["customer_id"]).orderBy("_valid_from")
    rows = [r.asDict() for r in out.collect()]
    # Spine instants: 01-01, 01-10, 01-15 → three segments.
    assert len(rows) == 3
    assert [r["_valid_from"] for r in rows] == [
        T("2024-01-01 00:00:00"), T("2024-01-10 00:00:00"), T("2024-01-15 00:00:00"),
    ]
    # Segment 2 (01-10..01-15): customer unchanged (John), address changed.
    assert rows[1]["customer_name"] == "John"
    assert rows[1]["city"] == "Boston"
    # Segment 3 current: Johnny in Boston.
    assert rows[2]["customer_name"] == "Johnny"
    assert rows[2]["city"] == "Boston"
    assert rows[2]["_is_current"] is True
    assert rows[2]["_valid_to"] == FAR
    # Windows tile continuously.
    assert rows[0]["_valid_to"] == rows[1]["_valid_from"]
    assert rows[1]["_valid_to"] == rows[2]["_valid_from"]


def test_three_table_spine_with_nulls(spark):
    customers = build_scd2(
        spark,
        [(1, "John", T("2024-01-05 00:00:00"))],
        "customer_id int, customer_name string, _updated_at timestamp",
        ["customer_id"],
    )
    ratings = build_scd2(
        spark,
        [
            (1, "AA", 700, T("2024-01-12 00:00:00")),
            (1, "AAA", 760, T("2024-01-18 00:00:00")),
        ],
        "customer_id int, credit_rating string, credit_score int, _updated_at timestamp",
        ["customer_id"],
    )
    out = scd2_join([customers, ratings], ["customer_id"]).orderBy("_valid_from")
    rows = [r.asDict() for r in out.collect()]
    # Instants 01-05, 01-12, 01-18. First segment has no rating yet → NULL.
    assert len(rows) == 3
    assert rows[0]["credit_rating"] is None
    assert rows[1]["credit_rating"] == "AA"
    assert rows[2]["credit_score"] == 760


def test_composite_key_join(spark):
    orders = build_scd2(
        spark,
        [
            (1, 10, "PLACED", T("2024-01-01 00:00:00")),
            (1, 10, "SHIPPED", T("2024-01-03 00:00:00")),
        ],
        "customer_id int, order_id int, order_status string, _updated_at timestamp",
        ["customer_id", "order_id"],
    )
    items = build_scd2(
        spark,
        [(1, 10, "Widget", 2, T("2024-01-01 00:00:00"))],
        "customer_id int, order_id int, item_name string, quantity int, _updated_at timestamp",
        ["customer_id", "order_id"],
    )
    out = scd2_join([orders, items], ["customer_id", "order_id"]).orderBy("_valid_from")
    rows = [r.asDict() for r in out.collect()]
    assert len(rows) == 2
    assert rows[0]["order_status"] == "PLACED"
    assert rows[1]["order_status"] == "SHIPPED"
    assert all(r["item_name"] == "Widget" for r in rows)


def test_snapshot_at_matches_current_when_asof_is_late(spark):
    from dbt_scd2_utils_spark.operators.temporal_join import snapshot_at

    import dbt_scd2_utils_spark.entry as em
    built = em.scd2_initial_load(
        em.change_feed(spark, "/root/testdata/sf0.001"), em.SCD2_CFG
    ).persist()
    # as-of far future == current snapshot
    far = snapshot_at(built, "2199-01-01 00:00:00")
    cur = built.filter(F.col("_is_current"))
    assert far.exceptAll(cur).count() == 0 and cur.exceptAll(far).count() == 0
    # as-of before history begins == empty
    assert snapshot_at(built, "1990-01-01 00:00:00").count() == 0
    # one row per key at any instant
    mid = snapshot_at(built, em.SPLIT)
    assert mid.groupBy("user_id").count().filter(F.col("count") > 1).count() == 0
    built.unpersist()
