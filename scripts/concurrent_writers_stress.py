#!/usr/bin/env python
"""Cross-PROCESS concurrent-writer stress on the bucketed generational
ScdTable: N separate OS processes (each with its own Spark session — its
own JVM, nothing shared but the table directory) merge interleaved batches
of DISJOINT key ranges into ONE table, retrying on ConcurrentWriteError
with the streaming sink's jittered backoff.

This is the measured companion to the two pins:
* tests/test_bucketed_build.py::test_concurrent_threads_serialize_* (two
  threads, one process) and
* ::test_concurrent_processes_serialize_and_lose_across_the_boundary (one
  blocked child) —
here the OCC protocol runs under sustained multi-PROCESS contention, the
regime a real cluster's independent driver JVMs produce.  SCD2 merges of
disjoint keys commute (per-key independence), so ANY interleaving must
end at exactly the full-refresh state over the union of every batch —
verified by fingerprint at the end.  Zero lost updates is the claim; the
conflict/retry counts show the protocol actually exercised it.

Usage: python scripts/concurrent_writers_stress.py [N_PROCS] [N_BATCHES]
       (defaults 4 writers x 4 batches; ~32 cpus assumed, local[6] each)
Child mode (internal): ... child <proc_id>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEYS_PER_PROC = 500
BASE = "timestamp'2020-01-01 00:00:00'"
TABLE_ENV = "SCD_STRESS_TABLE"


def _cfg():
    from dbt_scd2_utils_spark import ScdConfig

    return ScdConfig(unique_key=("k",), default_valid_to="2200-01-01 00:00:00")


def _batch(spark, proc_id: int, m: int):
    from pyspark.sql import functions as F

    lo = proc_id * KEYS_PER_PROC
    return spark.range(lo, lo + KEYS_PER_PROC).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit(f"p{proc_id}m{m}v"), F.col("id")).alias("payload"),
        F.expr(f"{BASE} + make_interval(0,0,0,0,0,{m},0)").alias("_updated_at"),
    )


def child(proc_id: int, n_batches: int) -> None:
    from dbt_scd2_utils_spark.plans.build import ConcurrentWriteError, ScdTable
    from dbt_scd2_utils_spark.session import get_spark
    from dbt_scd2_utils_spark.streaming.scd2_stream import Scd2BucketedSink

    spark = get_spark(f"stress-w{proc_id}", cpus=6)
    spark.sparkContext.setLogLevel("ERROR")
    t = ScdTable(spark, os.environ[TABLE_ENV], _cfg(), partition_buckets=8)
    conflicts = 0
    for m in range(n_batches):
        batch = _batch(spark, proc_id, m)
        for attempt in range(50):
            try:
                t.build(batch)
                break
            except ConcurrentWriteError:
                conflicts += 1
                Scd2BucketedSink._backoff(min(attempt, 4))
        else:
            print(json.dumps({"proc": proc_id, "error": "retries exhausted"}))
            sys.exit(1)
    print(json.dumps({"proc": proc_id, "conflicts": conflicts}))
    sys.exit(0)


def main() -> None:
    import tempfile

    from pyspark.sql import functions as F

    from dbt_scd2_utils_spark.operators.scd2 import scd2_initial_load
    from dbt_scd2_utils_spark.plans.build import ScdTable
    from dbt_scd2_utils_spark.session import get_spark

    n_procs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    base = tempfile.mkdtemp(prefix="scd_stress_")
    table = os.path.join(base, "tbl")
    env = {**os.environ, TABLE_ENV: table}

    # Stage the table (empty initial load) BEFORE fanning out: the OCC
    # protocol guards the bucketed INCREMENTAL path; a concurrent INITIAL
    # load takes the full-refresh directory swap, whose semantics are
    # deliberately last-writer-wins ("table := this batch's state", the
    # reference's table materialization) — so a deployment sequences the
    # initial load, exactly as this harness does.
    stage = get_spark("stress-stage", cpus=8)
    stage.sparkContext.setLogLevel("ERROR")
    ScdTable(stage, table, _cfg(), partition_buckets=8).build(
        _batch(stage, 0, 0).limit(0)
    )

    t0 = time.perf_counter()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "child", str(p),
             str(n_batches)],
            env=env, stdout=subprocess.PIPE, text=True,
        )
        for p in range(n_procs)
    ]
    outs = [p.communicate()[0] for p in procs]
    wall = time.perf_counter() - t0
    assert all(p.returncode == 0 for p in procs), outs
    stats = [json.loads(line) for o in outs for line in o.splitlines()
             if line.startswith("{")]

    # Verify: final state == full refresh over the union of every batch.
    spark = get_spark("stress-verify", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    t = ScdTable(spark, table, _cfg(), partition_buckets=8)
    union = None
    for p in range(n_procs):
        for m in range(n_batches):
            b = _batch(spark, p, m)
            union = b if union is None else union.unionByName(b)
    want = scd2_initial_load(union, _cfg())
    got = t.read()

    def fp(df):
        r = df.select(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.crc32(F.to_json(F.struct(*sorted(df.columns))))).alias("h"),
        ).first()
        return (r["c"], r["h"])

    got_fp, want_fp = fp(got), fp(want)
    gen = t._read_manifest()["gen"]
    row = {
        "metric": "concurrent_writers_stress",
        "writers": n_procs,
        "batches_per_writer": n_batches,
        "commits": gen + 1,
        "conflicts": sum(s["conflicts"] for s in stats),
        "conflicts_per_proc": {str(s["proc"]): s["conflicts"] for s in stats},
        "wall_s": round(wall, 1),
        "rows": got_fp[0],
        "lost_updates": got_fp != want_fp,
    }
    print(json.dumps(row))
    assert not row["lost_updates"], "state diverged from the commuted oracle"
    import shutil

    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(int(sys.argv[2]), int(sys.argv[3]))
    else:
        main()
