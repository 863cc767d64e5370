#!/usr/bin/env python
"""Measure the SCD2 window chain's hot-key straggler tail at 1M/10M
versions per key — the evidence behind operators/scd2.py's decision NOT
to salt the audit windows by default (module note option (c): a salted
two-phase lead/lag with boundary fixup "only pays off past ~10M
versions/key").

Provocation (same shape as tests/test_scd2_incremental.py::
test_hot_key_window_skew_completes, scaled up): ONE business key with H
versions among 10k single-version keys; the key-partitioned windows put
all H rows on one task, AQE cannot split a window stage.  For
H ∈ {0 (baseline), 100k, 1M, 10M} we time initial load + one incremental
merge.  tail(H) = wall(H) − wall(0) isolates the straggler; the
per-version rate says what a salted variant would have to beat, and the
baseline's own wall time is the floor a salt-shuffle + fixup join would
add to EVERY run.

Prints one JSON line per H plus a summary; results go to BASELINE.md and
the scd2.py note.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dbt_scd2_utils_spark import (  # noqa: E402
    ScdConfig,
    scd2_incremental,
    scd2_initial_load,
)
from dbt_scd2_utils_spark.session import get_spark  # noqa: E402

NORM_K = 10_000
BASE = "timestamp'2020-01-01 00:00:00'"


def feed_for(spark, hot_versions: int):
    norm = spark.range(1, NORM_K + 1).select(
        F.col("id").cast("int").alias("k"),
        F.lit("x").alias("payload"),
        F.expr(BASE).alias("_updated_at"),
    )
    if not hot_versions:
        return norm
    hot = spark.range(hot_versions).select(
        F.lit(0).cast("int").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("payload"),
        F.expr(f"{BASE} + make_interval(0,0,0,0,0,0,id)").alias("_updated_at"),
    )
    return hot.unionByName(norm)


def _rest(spark, path: str):
    import json as _json
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/{path}", timeout=30) as r:
        return _json.load(r)


def _max_stage_id(spark) -> int:
    try:
        app = spark.sparkContext.applicationId
        stages = _rest(spark, f"applications/{app}/stages")
        return max((s["stageId"] for s in stages), default=-1)
    except Exception:  # noqa: BLE001 — metrics are advisory
        return -1


def _max_task_bytes(spark, since_stage: int) -> dict:
    """Max PER-TASK peak execution memory and shuffle-read bytes over the
    stages submitted after ``since_stage`` — the quantity that maps to
    EXECUTOR memory on a real cluster (a window over a hot key puts the
    whole history's sort buffer in one task; salted, each task holds
    history/S).  Read from the UI REST API's task summaries so the number
    is measured, not estimated."""
    out = {"task_peak_mem_bytes": 0, "task_shuffle_read_bytes": 0}
    try:
        app = spark.sparkContext.applicationId
        stages = _rest(spark, f"applications/{app}/stages?status=complete")
        for st in stages:
            if st["stageId"] <= since_stage:
                continue
            try:
                ts = _rest(
                    spark,
                    f"applications/{app}/stages/{st['stageId']}/"
                    f"{st.get('attemptId', 0)}/taskSummary?quantiles=1.0",
                )
            except Exception:  # noqa: BLE001 — skipped/empty stages 404
                continue
            pm = int((ts.get("peakExecutionMemory") or [0])[-1])
            sr = int(((ts.get("shuffleReadMetrics") or {}).get("readBytes") or [0])[-1])
            out["task_peak_mem_bytes"] = max(out["task_peak_mem_bytes"], pm)
            out["task_shuffle_read_bytes"] = max(
                out["task_shuffle_read_bytes"], sr
            )
    except Exception:  # noqa: BLE001
        pass
    return out


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    spark = get_spark("hot-key-window-tail", cpus=cpus, ui=True)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = ScdConfig(unique_key=("k",), default_valid_to="2200-01-01 00:00:00")

    from dbt_scd2_utils_spark.operators.scd2_salted import (
        scd2_incremental_salted,
        scd2_initial_load_salted,
    )

    salted_flavors = {
        1_000_000: True, 10_000_000: True,  # measure the opt-in path here
    }
    results = []
    for hot in (0, 100_000, 1_000_000, 10_000_000):
        feed = feed_for(spark, hot)
        # Split so roughly half the hot key's history lands in each phase
        # (seconds since BASE run 0..hot-1; normal keys are all at BASE).
        split_s = max(1, hot // 2)
        split = F.expr(f"{BASE} + make_interval(0,0,0,0,0,0,{split_s})")
        t0 = time.perf_counter()
        state = scd2_initial_load(
            feed.filter(F.col("_updated_at") <= split), cfg
        ).persist()
        state.write.format("noop").mode("overwrite").save()
        initial_s = round(time.perf_counter() - t0, 2)
        mark = _max_stage_id(spark)
        t0 = time.perf_counter()
        scd2_incremental(
            state, feed.filter(F.col("_updated_at") > split), cfg
        ).write.format("noop").mode("overwrite").save()
        incr_s = round(time.perf_counter() - t0, 2)
        row = {
            "hot_versions": hot, "initial_s": initial_s, "incremental_s": incr_s,
        }
        row.update(
            {f"plain_{k}": v for k, v in _max_task_bytes(spark, mark).items()}
        )
        if salted_flavors.get(hot):
            # Salted twin, INCLUDING hot-key auto-detection cost.  Guarded:
            # at 10M versions the salted path's eager stage barriers hold
            # several materialized copies of the hot history, which can
            # exceed a single local-mode JVM heap (that is exactly the
            # cluster failure mode salting exists to spread out — but here
            # it means the measurement itself can die).
            try:
                t0 = time.perf_counter()
                scd2_initial_load_salted(
                    feed.filter(F.col("_updated_at") <= split), cfg,
                    salts=32, hot_key_threshold=500_000,
                ).write.format("noop").mode("overwrite").save()
                row["initial_salted_s"] = round(time.perf_counter() - t0, 2)
                mark = _max_stage_id(spark)
                t0 = time.perf_counter()
                scd2_incremental_salted(
                    state, feed.filter(F.col("_updated_at") > split), cfg,
                    salts=32, hot_key_threshold=500_000,
                ).write.format("noop").mode("overwrite").save()
                row["incremental_salted_s"] = round(
                    time.perf_counter() - t0, 2
                )
                row.update(
                    {
                        f"salted_{k}": v
                        for k, v in _max_task_bytes(spark, mark).items()
                    }
                )
            except Exception as exc:  # noqa: BLE001 — record, keep curve
                row["salted_error"] = type(exc).__name__
        state.unpersist()
        results.append(row)
        print(json.dumps(row), flush=True)

    base = results[0]
    summary = {
        "metric": "scd2_hot_key_window_tail",
        "cpus": cpus,
        "norm_keys": NORM_K,
        "points": results,
        "tails": [
            {
                "hot_versions": r["hot_versions"],
                "initial_tail_s": round(r["initial_s"] - base["initial_s"], 2),
                "incremental_tail_s": round(
                    r["incremental_s"] - base["incremental_s"], 2
                ),
            }
            for r in results[1:]
        ],
        # The OOM-trade argument in bytes: plain holds the WHOLE hot
        # history in one task's sort; salted holds ~history/S per task.
        "bytes_per_task": [
            {
                "hot_versions": r["hot_versions"],
                "plain_task_peak_mem_bytes": r.get("plain_task_peak_mem_bytes"),
                "plain_task_shuffle_read_bytes": r.get(
                    "plain_task_shuffle_read_bytes"
                ),
                "salted_task_peak_mem_bytes": r.get("salted_task_peak_mem_bytes"),
                "salted_task_shuffle_read_bytes": r.get(
                    "salted_task_shuffle_read_bytes"
                ),
            }
            for r in results
            if r["hot_versions"]
        ],
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
