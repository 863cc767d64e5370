"""scd2_diff CDC read (operators/temporal_join.py)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

import dbt_scd2_utils_spark.entry as em
from dbt_scd2_utils_spark.operators.temporal_join import scd2_diff, snapshot_at

SF = "/root/testdata/sf0.001"
FAR = "2199-01-01 00:00:00"
CMP = ("event_type", "value", "props", "deleted_at")


def _built(spark):
    return em.scd2_initial_load(em.change_feed(spark, SF), em.SCD2_CFG).persist()


def test_diff_applies_a_to_b(spark):
    built = _built(spark)
    diff = scd2_diff(built, em.SPLIT, FAR, ["user_id"], CMP)
    a = snapshot_at(built, em.SPLIT).select("user_id", *CMP)
    b = snapshot_at(built, FAR).select("user_id", *CMP)
    # apply: (a minus diffed keys) union upserts == b
    keys = diff.select("user_id")
    upserts = diff.filter(F.col("_change_type") != "D").select("user_id", *CMP)
    applied = a.join(keys, "user_id", "left_anti").unionByName(upserts)
    assert applied.exceptAll(b).count() == 0
    assert b.exceptAll(applied).count() == 0
    built.unpersist()


def test_diff_same_instant_is_empty(spark):
    built = _built(spark)
    assert scd2_diff(built, em.SPLIT, em.SPLIT, ["user_id"], CMP).count() == 0
    built.unpersist()


def test_delete_classified_when_key_expires(spark):
    rows = [
        # key 1: one version valid [t0, t1) only -> absent at t2
        (1, "x", datetime(2024, 1, 1), datetime(2024, 1, 10)),
        # key 2: current throughout
        (2, "y", datetime(2024, 1, 1), datetime(2199, 1, 1)),
    ]
    tbl = spark.createDataFrame(
        rows, "k long, v string, _valid_from timestamp, _valid_to timestamp"
    )
    out = {
        r["k"]: r["_change_type"]
        for r in scd2_diff(
            tbl, "2024-01-05 00:00:00", "2024-02-01 00:00:00", ["k"], ["v"]
        ).collect()
    }
    assert out == {1: "D"}


def test_insert_and_update_classification(spark):
    rows = [
        (1, "old", datetime(2024, 1, 1), datetime(2024, 1, 10)),
        (1, "new", datetime(2024, 1, 10), datetime(2199, 1, 1)),
        (3, "born", datetime(2024, 1, 20), datetime(2199, 1, 1)),
    ]
    tbl = spark.createDataFrame(
        rows, "k long, v string, _valid_from timestamp, _valid_to timestamp"
    )
    got = {
        r["k"]: (r["_change_type"], r["v"])
        for r in scd2_diff(
            tbl, "2024-01-05 00:00:00", "2024-02-01 00:00:00", ["k"], ["v"]
        ).collect()
    }
    assert got == {1: ("U", "new"), 3: ("I", "born")}


def test_diff_apply_equivalence_random_tables(spark):
    """Random SCD2-shaped tables + random probe instants: applying the
    diff to snapshot(t1) must always reconstruct snapshot(t2)."""
    import random
    from datetime import timedelta

    rng = random.Random(4321)
    base = datetime(2024, 1, 1)
    for trial in range(15):
        rows = []
        for k in range(rng.randint(1, 12)):
            # contiguous version chain per key with random boundaries
            cuts = sorted(rng.sample(range(1, 120), rng.randint(1, 4)))
            bounds = [0] + cuts + [200 if rng.random() < 0.7 else cuts[-1] + 1]
            for vi in range(len(bounds) - 1):
                if bounds[vi] == bounds[vi + 1]:
                    continue
                rows.append(
                    (
                        k,
                        f"v{vi}-{rng.randrange(3)}",
                        base + timedelta(days=bounds[vi]),
                        base + timedelta(days=bounds[vi + 1]),
                    )
                )
        tbl = spark.createDataFrame(
            rows, "k long, v string, _valid_from timestamp, _valid_to timestamp"
        ).persist()
        t1 = (base + timedelta(days=rng.randint(0, 60))).strftime("%Y-%m-%d %H:%M:%S")
        t2 = (base + timedelta(days=rng.randint(61, 150))).strftime("%Y-%m-%d %H:%M:%S")
        diff = scd2_diff(tbl, t1, t2, ["k"], ["v"])
        a = snapshot_at(tbl, t1).select("k", "v")
        b = snapshot_at(tbl, t2).select("k", "v")
        keys = diff.select("k")
        upserts = diff.filter(F.col("_change_type") != "D").select("k", "v")
        applied = a.join(keys, "k", "left_anti").unionByName(upserts)
        assert applied.exceptAll(b).count() == 0, f"trial {trial}"
        assert b.exceptAll(applied).count() == 0, f"trial {trial}"
        tbl.unpersist()
