#!/usr/bin/env python
"""Measure the merge_fn composition: a provoked hot key merged into a
BUCKETED generational ScdTable through (a) the default window chain and
(b) the salted hot-key chain — the round-12 seam that lets the two
100-TB features (bucketing shards tables, salting shards keys) run
together.

Provocation (same shape as scripts/hot_key_window_tail.py): 10k
single-version keys plus ONE key that receives H new versions in the
incremental batch; bucketing cannot split that key (it hashes to one
bucket and the key-partitioned windows put all H rows on one task), so
the salted chain is the only lever.  For each H we stage the same
bucketed table twice and time ONE incremental merge per flavor, then
hash-compare the two resulting tables (must be identical — the
correctness pin at scale).

Local[32] expectation per BASELINE round-10c/11c: the plain chain wins
until the hot key's window partition approaches executor-memory scale
(~10M versions, ~520 B/version/task); this script records where the
crossover sits WHEN ROUTED THROUGH THE BUCKETED SINK so the composition
has its own measured row, not an inference from the unbucketed runs.

Round-13 extension: a third flavor, ``auto`` (scd2_incremental_adaptive
at its shipped default threshold), merges the SAME provocation — the row
records which route it picked and its wall clock, so the BASELINE table
shows the adaptive default choosing the measured winner on each side of
the crossover band (VERDICT r12 item 5).

Usage: python scripts/salted_bucketed_compose.py [H ...]  (default 1M 4M)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dbt_scd2_utils_spark import ScdConfig  # noqa: E402
from dbt_scd2_utils_spark.operators.scd2_salted import (  # noqa: E402
    scd2_incremental_salted,
)
from dbt_scd2_utils_spark.plans.build import ScdTable  # noqa: E402
from dbt_scd2_utils_spark.session import get_spark  # noqa: E402

NORM_K = 10_000
HOT_KEY = 0
BASE = "timestamp'2020-01-01 00:00:00'"
CFG = ScdConfig(
    unique_key=("k",), default_valid_to="2200-01-01 00:00:00"
)


def initial_feed(spark):
    return spark.range(0, NORM_K + 1).select(
        F.col("id").cast("int").alias("k"),
        F.lit("x").alias("payload"),
        F.expr(BASE).alias("_updated_at"),
    )


def hot_batch(spark, h: int):
    return spark.range(h).select(
        F.lit(HOT_KEY).cast("int").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("payload"),
        F.expr(f"{BASE} + make_interval(0,0,0,0,0,0, id+1)").alias(
            "_updated_at"
        ),
    )


def fingerprint(df):
    r = df.select(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.crc32(F.to_json(F.struct(*sorted(df.columns))))).alias("h"),
    ).first()
    return (r["c"], r["h"])


def main() -> None:
    hs = [int(a) for a in sys.argv[1:] if a.isdigit()] or [
        1_000_000, 4_000_000
    ]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    spark = get_spark("salted-bucketed", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from dbt_scd2_utils_spark.operators.scd2_salted import (  # noqa: E402
        scd2_incremental_adaptive,
    )

    route_log: list = []
    flavors = {
        "plain": None,
        "salted": partial(
            scd2_incremental_salted, salts=16, hot_key_threshold=200_000
        ),
        # The shipped default: routes itself per merge (threshold 2M sits
        # inside the measured 1M..4M crossover band).
        "auto": partial(
            scd2_incremental_adaptive, salts=16, route_log=route_log
        ),
    }
    for h in hs:
        batch = hot_batch(spark, h).persist()
        batch.count()  # materialize the provocation outside timing
        fps = {}
        route_log.clear()
        row = {"metric": "salted_bucketed_compose", "hot_versions": h}
        for name, fn in flavors.items():
            base = tempfile.mkdtemp(prefix=f"sbc_{name}_")
            t = ScdTable(
                spark, os.path.join(base, "tbl"), CFG,
                partition_buckets=16, merge_fn=fn,
            )
            t.build(initial_feed(spark))  # staging, untimed
            t0 = time.perf_counter()
            t.build(batch)
            row[f"{name}_merge_s"] = round(time.perf_counter() - t0, 2)
            fps[name] = fingerprint(t.read())
            row[f"{name}_phases"] = {
                k: round(v, 3) for k, v in t.last_phase_times.items()
            }
            shutil.rmtree(base, ignore_errors=True)
        batch.unpersist()
        row["auto_route"] = route_log[0][0] if route_log else None
        row["value_parity"] = len(set(fps.values())) == 1
        print(json.dumps(row))
        assert row["value_parity"], f"flavors diverged at H={h}"


if __name__ == "__main__":
    main()
