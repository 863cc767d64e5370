#!/usr/bin/env python
"""Capture .explain("formatted") output for bench queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> [query,query,...]

Streaming queries (which drain a stream and return a read of the sink) are
skipped unless named explicitly: their returned DataFrame's plan is just a
parquet scan of the drained output, not the streamed computation.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_scd2_utils_spark import entry as entry_mod  # noqa: E402
from dbt_scd2_utils_spark.session import get_spark  # noqa: E402

SKIP_PREFIX = "streaming_"


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    if len(sys.argv) > 2:
        names = [n for n in sys.argv[2].split(",") if n]
    else:
        import bench

        names = [
            n
            for n in bench.BENCH_QUERIES
            if n in qs and not n.startswith(SKIP_PREFIX)
        ]
    entry_mod.prewarm_merge_targets(spark, sf_dir)
    entry_mod.prewarm_indexes(spark, sf_dir)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR capturing plan: {type(e).__name__}: {e}"
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"captured {name} ({len(plan)} chars)", flush=True)


if __name__ == "__main__":
    main()
