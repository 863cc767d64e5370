#!/usr/bin/env python
"""Hot-key skew evidence for functions/skew.py::salted_join.

Synthesizes a probe relation where ONE key owns 94% of all rows (15M
of 16M) joined to a small-but-unbroadcastable build side, with
autoBroadcastJoinThreshold disabled so the join must shuffle — the
cluster situation salting exists for.  Measures plain vs salted wall
time (the plain join's cost is one straggler task processing the hot
key's 15M rows).  Prints one JSON line; results recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dbt_scd2_utils_spark.functions.skew import salted_join  # noqa: E402
from dbt_scd2_utils_spark.session import get_spark  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    spark = get_spark("skew-proof", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # AQE skew handling would mask the effect we want to isolate — turn it
    # off so the comparison shows the salting mechanism itself; with AQE on
    # (the engine default) BOTH paths improve.
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")

    n, hot_share = 16_000_000, 0.94
    hot_rows = int(n * hot_share)
    probe = spark.range(n).select(
        F.when(F.col("id") < hot_rows, F.lit(7)).otherwise(F.col("id") % 5000).alias("k"),
        (F.col("id") * 3).alias("payload"),
    )
    build = spark.range(5001).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )

    def run(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 2)

    run(probe.join(build, ["k"]))  # warm
    plain = min(run(probe.join(build, ["k"])) for _ in range(2))
    salted = min(run(salted_join(probe, build, "k", salts=32)) for _ in range(2))
    rows_match = (
        salted_join(probe, build, "k", salts=32).count()
        == probe.join(build, ["k"]).count()
    )
    print(
        json.dumps(
            {
                "metric": "salted_join_hot_key",
                "plain_s": plain,
                "salted_s": salted,
                "speedup": round(plain / salted, 2),
                "rows_equal": rows_match,
                "hot_share": hot_share,
                "rows": n,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
