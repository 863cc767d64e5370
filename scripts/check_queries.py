#!/usr/bin/env python
"""Driver-faithful oracle check for a named subset of queries, each run
``--times N`` times (default 2) so session-memoized staging paths are
exercised: run 1 stages cold, run 2 reuses the memo — both must match the
DuckDB oracle exactly.

Usage: python scripts/check_queries.py q1,q2,... [--sf /root/testdata/sf0.01] [--times 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as em  # noqa: E402
from dbt_scd2_utils_spark.session import get_spark  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def canon(df):
    df.columns = df.columns.str.lower()
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--times", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark("check-queries")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{args.sf}/{t}.parquet'")
    qs, oracles = em.queries(), em.oracle_sql()
    names = [n for n in args.queries.split(",") if n]
    bad = []
    for name in names:
        du = canon(con.sql(oracles[name]).df())
        for run in range(1, args.times + 1):
            t0 = time.time()
            try:
                sp = canon(qs[name](spark, args.sf).toPandas())
                ok = (
                    list(sp.columns) == list(du.columns)
                    and len(sp) == len(du)
                    and sp.astype(str).equals(du.astype(str))
                )
            except Exception as e:  # noqa: BLE001
                ok = False
                print(f"{name} run{run}: ERR {type(e).__name__}: {e}", flush=True)
            dt = time.time() - t0
            print(f"{name} run{run}: {'ok' if ok else 'MISMATCH'} {dt:.1f}s", flush=True)
            if not ok:
                bad.append((name, run))
    print(f"{'ALL GREEN' if not bad else 'RED: ' + str(bad)}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
