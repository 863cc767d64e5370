"""JSONL / ORC / date-partitioned sources (sources/formats.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_scd2_utils_spark.sources.formats import (
    CORRUPT_COL,
    read_date_partition,
    read_jsonl,
    read_orc,
    write_date_partitioned,
    write_jsonl,
    write_orc,
)
from dbt_scd2_utils_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_jsonl_roundtrip_exact(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    p = str(tmp_path / "ev_jsonl")
    write_jsonl(ev, p)
    back = read_jsonl(spark, p, ev.schema).drop(CORRUPT_COL)
    # JSON columns are always nullable — compare names+types, not flags.
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in ev.schema.fields
    ]
    assert back.exceptAll(ev).count() == 0 and ev.exceptAll(back).count() == 0


def test_jsonl_corrupt_lines_quarantined(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"event_id": 1, "value": 2.5}\n'
        "THIS IS NOT JSON\n"
        '{"event_id": 2, "value": 3.5}\n'
    )
    schema = spark.createDataFrame([(1, 2.5)], "event_id long, value double").schema
    # persist: Spark forbids querying ONLY the corrupt column on a raw
    # JSON scan (internal-row pruning restriction) — cache first.
    got = read_jsonl(spark, str(p), schema).persist()
    assert got.count() == 3
    bad = got.filter(F.col(CORRUPT_COL).isNotNull())
    assert bad.count() == 1
    assert got.filter(F.col("event_id").isNotNull()).count() == 2


def test_orc_roundtrip_exact(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    p = str(tmp_path / "ev_orc")
    write_orc(ev, p)
    back = read_orc(spark, p)
    assert back.exceptAll(ev).count() == 0 and ev.exceptAll(back).count() == 0


def test_date_partition_prunes(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    p = str(tmp_path / "ev_part")
    write_date_partitioned(ev, p)
    day = "2024-01-16"
    got = read_date_partition(spark, p, day)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_date" in plan.split("PartitionFilters")[1][:200]
    want = ev.filter(F.to_date("ts") == F.lit(day).cast("date"))
    assert got.count() == want.count() > 0
