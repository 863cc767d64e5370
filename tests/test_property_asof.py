"""Randomized asof_join ≡ DuckDB ASOF JOIN over arbitrary feeds.

Complements tests/test_asof.py's hand-picked corners with 30 random
(keys × timestamps × duplicates × missing-key) configurations — the
same confidence strategy as test_property_random_feeds.py for SCD2.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import duckdb

from dbt_scd2_utils_spark.operators.asof import asof_join
import pytest

# Randomized property / stress suite: excluded from the default run
# (pytest.ini addopts -m "not slow") so the driver-window selection
# stays fast; run with `pytest -m slow`.
pytestmark = pytest.mark.slow

BASE = datetime(2024, 1, 1)


def _feeds(rng):
    n_keys = rng.randint(1, 6)
    # ~1 in 8 keys is NULL on each side: pins the SQL-equality rule that
    # NULL keys never match (NULL-key left rows emit no-match).
    nullable = lambda k: None if rng.random() < 0.125 else k  # noqa: E731
    left = [
        (
            i,
            nullable(rng.randrange(n_keys + 2)),  # keys beyond right's range too
            BASE + timedelta(minutes=rng.randrange(2000)),
        )
        for i in range(rng.randint(1, 40))
    ]
    right = [
        (
            nullable(rng.randrange(n_keys)),
            BASE + timedelta(minutes=rng.randrange(2000)),
            rng.randrange(5),
        )
        for _ in range(rng.randint(1, 40))
    ]
    # dedup right on (k, ts): keep max payload, so tie resolution is
    # engine-independent (DuckDB ASOF picks an arbitrary row among exact
    # ts duplicates).
    best = {}
    for k, ts, v in right:
        best[(k, ts)] = max(v, best.get((k, ts), -1))
    right = [(k, ts, v) for (k, ts), v in best.items()]
    return left, right


def test_random_feeds_match_duckdb(spark):
    rng = random.Random(1234)
    for trial in range(30):
        left, right = _feeds(rng)
        l = spark.createDataFrame(left, "event_id long, k long, ts timestamp")
        r = spark.createDataFrame(right, "k long, vts timestamp, v long")
        got = sorted(
            tuple(row)
            for row in asof_join(
                l, r, on="k", left_ts="ts", right_ts="vts"
            ).collect()
        )
        con = duckdb.connect()
        con.execute("create table l(event_id bigint, k bigint, ts timestamp)")
        con.execute("create table r(k bigint, vts timestamp, v bigint)")
        con.executemany("insert into l values (?,?,?)", [list(x) for x in left])
        con.executemany("insert into r values (?,?,?)", [list(x) for x in right])
        want = sorted(
            tuple(w)
            for w in con.execute(
                "select l.event_id, l.k, l.ts, r.v from l "
                "asof left join r on l.k = r.k and l.ts >= r.vts"
            ).fetchall()
        )
        assert got == want, f"trial {trial}: {got[:3]} != {want[:3]}"
        con.close()
