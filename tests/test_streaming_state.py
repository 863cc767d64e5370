"""Stateful streaming SCD2 (applyInPandasWithState): change events match the
batch-path versions for in-order feeds; out-of-order events flagged 'late'."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from dbt_scd2_utils_spark import ScdConfig
from dbt_scd2_utils_spark.streaming.scd2_state import scd2_streaming_changes
from tests.fixtures.seeds import CUSTOMERS_RAW, CUSTOMERS_SCHEMA

CFG = ScdConfig(unique_key=("customer_id",), deleted_at_column="deleted_at")


def run_stream(spark, tmp_path, batches):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = None
    for df in batches:
        schema = df.schema
        df.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    changes = scd2_streaming_changes(stream, CFG)
    q = (
        changes.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain in time"
    return spark.read.parquet(out)


def test_streaming_changes_in_order(spark, tmp_path):
    b1 = spark.createDataFrame(CUSTOMERS_RAW[1], CUSTOMERS_SCHEMA)
    got = run_stream(spark, tmp_path, [b1]).cache()

    inserts = got.filter(F.col("_op") == "insert")
    # key 2's 17 duplicates collapse to one insert
    assert inserts.filter(F.col("customer_id") == 2).count() == 1
    # key 9 full lifecycle: I → U → D → I inserts, 3 expires
    k9 = [r.asDict() for r in got.filter(F.col("customer_id") == 9)
          .orderBy("_valid_from", "_op").collect()]
    k9_ins = [r for r in k9 if r["_op"] == "insert"]
    assert [r["_change_type"] for r in k9_ins] == ["I", "U", "D", "I"]
    k9_exp = [r for r in k9 if r["_op"] == "expire"]
    assert len(k9_exp) == 3
    assert all(r["_is_current"] is False for r in k9_exp)
    # applying inserts-minus-expired gives exactly one current row per key
    expired = got.filter(F.col("_op") == "expire").select(
        F.col("customer_id").alias("cid"), F.col("_valid_from").alias("vf")
    )
    current = inserts.join(
        expired,
        (inserts["customer_id"] == expired["cid"])
        & (inserts["_valid_from"] == expired["vf"]),
        "left_anti",
    )
    assert (
        current.groupBy("customer_id").count().filter(F.col("count") != 1).count() == 0
    )


def test_streaming_flags_late_events(spark, tmp_path):
    rows1 = [(1, "A", "a@x", "ACTIVE", None, datetime(2024, 1, 2))]
    rows2 = [(1, "B", "b@x", "ACTIVE", None, datetime(2024, 1, 1))]  # older!
    b1 = spark.createDataFrame(rows1, CUSTOMERS_SCHEMA)
    b2 = spark.createDataFrame(rows2, CUSTOMERS_SCHEMA)
    got = run_stream(spark, tmp_path, [b1, b2])
    # the in-batch-order event inserted; the cross-batch older event is
    # either reconciled in the same micro-batch (single-batch run) or late
    ops = {r["_op"] for r in got.collect()}
    assert "insert" in ops
    lates = got.filter(F.col("_op") == "late").collect()
    for r in lates:
        assert r["customer_name"] == "B"
