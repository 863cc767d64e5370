#!/usr/bin/env python
"""Pre-flight the driver's correctness gate: run the FIRST 50 queries()
entries (the r-next gate window) at sf0.01 through a driver-faithful
comparison — pandas sort_values canonicalization (which throws on
list-typed cells, exactly like the driver's _canon), row count, column
set, and stringified value equality against the DuckDB oracle.

Usage: python scripts/gate_preflight.py [N]   (default 50)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as em  # noqa: E402
from dbt_scd2_utils_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def canon(df):
    df.columns = df.columns.str.lower()
    df = df[sorted(df.columns)]
    # the driver's sort_values is what crashes on list cells — keep it
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    spark = get_spark("gate-preflight")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{SF}/{t}.parquet'")
    qs, oracles = em.queries(), em.oracle_sql()
    names = list(qs)[:n]
    bad = []
    for i, name in enumerate(names, 1):
        t0 = time.time()
        try:
            sp = canon(qs[name](spark, SF).toPandas())
            du = canon(con.sql(oracles[name]).df())
            ok = (
                list(sp.columns) == list(du.columns)
                and len(sp) == len(du)
                and sp.astype(str).equals(du.astype(str))
            )
        except Exception as e:  # noqa: BLE001
            ok, sp = False, None
            print(f"{i:3} {name}: ERR {type(e).__name__}: {e}", flush=True)
        if ok:
            print(
                f"{i:3} {name}: ok rows={len(sp)} {time.time() - t0:.1f}s",
                flush=True,
            )
        else:
            bad.append(name)
            if sp is not None:
                print(f"{i:3} {name}: MISMATCH", flush=True)
    print(f"\n{len(names) - len(bad)}/{len(names)} green; red: {bad}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
