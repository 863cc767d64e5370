"""salted_join ≡ plain join, with the hot key spread (functions/skew.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_scd2_utils_spark.functions.skew import salted_join
from dbt_scd2_utils_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _hot(spark):
    # 5k rows of ONE key + 100 normal keys on the probe side.
    probe = spark.range(5100).select(
        F.when(F.col("id") < 5000, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    build = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    return probe, build


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_equals_plain_join(spark, how):
    probe, build = _hot(spark)
    want = probe.join(build, ["k"], how)
    got = salted_join(probe, build, "k", how=how, salts=8)
    assert sorted(got.columns) == sorted(want.columns)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def _salt_expr(probe, salts):
    # mirror of salted_join's internal salt expression
    return F.pmod(
        F.xxhash64(
            *[F.col(c) for c in probe.columns], F.monotonically_increasing_id()
        ),
        F.lit(salts),
    ).cast("int")


def test_hot_key_spreads_over_salts(spark):
    probe, build = _hot(spark)
    p = probe.withColumn("__salt", _salt_expr(probe, 8))
    n = p.filter(F.col("k") == 7).select("__salt").distinct().count()
    assert n == 8  # the hot key's rows occupy every salt sub-partition


def test_identical_duplicate_rows_still_spread(spark):
    # A probe projected down to just the join key: every row of the hot
    # key is byte-identical.  A pure row-hash salt would send all of
    # them to ONE sub-partition (the straggler reborn); the unique-id
    # component spreads them.
    probe = spark.range(5000).select(F.lit(7).alias("k"))
    build = spark.range(20).select(F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
    p = probe.withColumn("__salt", _salt_expr(probe, 8))
    assert p.select("__salt").distinct().count() == 8
    got = salted_join(probe, build, "k", salts=8)
    want = probe.join(build, ["k"])
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_rejects_right_joins(spark):
    probe, build = _hot(spark)
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(probe, build, "k", how="right")
    with pytest.raises(ValueError, match="salts"):
        salted_join(probe, build, "k", salts=1)


def test_on_real_tables(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    want = li.join(orders, ["l_orderkey"], "inner")
    got = salted_join(li, orders, "l_orderkey", salts=4)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
