"""Randomized property harness for operators/temporal_join.py::scd2_join
(the re-expression of macros/joins/scd2_join.sql:21-66).

Random SCD2 relations are GENERATED through scd2_initial_load (so every
input has well-formed windows), then joined 2-4 ways with randomized key
overlap (shared keys, keys private to one relation, NULL keys, composite
keys) and instants that collide across relations or hit the open-end
default (the natural zero-width-spine-segment case).  The result must
match, value for value, a DuckDB oracle written independently from the
reference macro's CTE shape (distinct_updates -> temporal_spine -> N
interval-containment left joins -> drop zero-width segments).

A pinned test also documents the reference's shared-business-column
caveat (scd2_join.sql:44-55, SURVEY.md §3.2): two relations sharing a
non-key payload column would make the reference emit ambiguous SQL; this
engine disambiguates by suffixing the LATER relation's duplicate with its
relation position.
"""

from __future__ import annotations

import datetime as dt
import random

import duckdb
from pyspark.sql import functions as F

from dbt_scd2_utils_spark import ScdConfig, scd2_initial_load
from dbt_scd2_utils_spark.operators.temporal_join import scd2_join
import pytest

# Randomized property / stress suite: excluded from the default run
# (pytest.ini addopts -m "not slow") so the driver-window selection
# stays fast; run with `pytest -m slow`.
pytestmark = pytest.mark.slow

# Within pandas' ns-timestamp range (the DuckDB oracle round-trips
# relations through pandas); equality-with-default still exercised below.
DEFAULT_VT = "2250-12-31 23:59:59"
# A small instant pool so windows collide across relations; the last one
# EQUALS the open-end default, producing a zero-width final spine segment
# that the WHERE _valid_from < _valid_to leg must drop.
INSTANTS = [
    dt.datetime(2024, 1, d, h) for d in (1, 2, 3) for h in (0, 12)
] + [dt.datetime(2250, 12, 31, 23, 59, 59)]


def _mk_relation(spark, rng, keys, payload_cols, key_pool):
    """A random SCD2 relation built THROUGH the engine's initial load."""
    n_keys = rng.randint(1, 5)
    chosen = rng.sample(key_pool, min(n_keys, len(key_pool)))
    rows = []
    for kv in chosen:
        for ts in sorted(rng.sample(INSTANTS, rng.randint(1, 3))):
            payload = [
                rng.choice([None, "a", "b", f"v{rng.randint(0, 3)}"])
                for _ in payload_cols
            ]
            rows.append((*kv, *payload, ts))
    schema = (
        ", ".join(f"{k} int" for k in keys)
        + ", "
        + ", ".join(f"{c} string" for c in payload_cols)
        + ", _updated_at timestamp"
    )
    feed = spark.createDataFrame(rows, schema)
    cfg = ScdConfig(unique_key=tuple(keys), default_valid_to=DEFAULT_VT)
    return scd2_initial_load(feed, cfg)


def _oracle_sql(rel_names, rel_payloads, keys):
    key_list = ", ".join(keys)
    instants = " UNION ".join(
        f"SELECT DISTINCT {key_list}, _valid_from AS iu FROM {n}"
        for n in rel_names
    )
    sel_payload, joins = [], []
    seen = {k.upper() for k in keys}
    for i, (name, pcols) in enumerate(zip(rel_names, rel_payloads)):
        on = " AND ".join(f"s.{k} = r{i}.{k}" for k in keys)
        joins.append(
            f"LEFT JOIN {name} r{i} ON {on}"
            f" AND s._valid_from >= r{i}._valid_from"
            f" AND s._valid_to <= r{i}._valid_to"
        )
        for c in pcols:
            out = c if c.upper() not in seen else f"{c}_{i}"
            seen.add(out.upper())
            sel_payload.append(f"r{i}.{c} AS {out}")
    return f"""
    WITH instants AS ({instants}),
    spine AS (
      SELECT {key_list}, iu AS _valid_from,
             COALESCE(LEAD(iu) OVER (PARTITION BY {key_list} ORDER BY iu),
                      TIMESTAMP '{DEFAULT_VT}') AS _valid_to,
             ROW_NUMBER() OVER (PARTITION BY {key_list} ORDER BY iu DESC) = 1
               AS _is_current
      FROM instants
    )
    SELECT {", ".join("s." + k for k in keys)}, {", ".join(sel_payload)},
           s._is_current, s._valid_from, s._valid_to
    FROM spine s {" ".join(joins)}
    WHERE s._valid_from < s._valid_to
    """


def _norm(rows):
    out = []
    for r in rows:
        out.append(
            tuple(
                v.isoformat() if isinstance(v, dt.datetime) else v for v in r
            )
        )
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def test_scd2_join_property_random_relations(spark):
    rng = random.Random(4242)
    audit = ["_valid_from", "_valid_to", "_is_current", "_updated_at", "_change_type"]
    for trial in range(12):
        keys = ["k"] if trial % 3 else ["k", "k2"]
        n_rel = rng.randint(2, 4)
        # Shared pool + one private range per relation => keys present in
        # some relations and absent from others; occasionally a NULL key.
        rel_dfs, rel_payloads = [], []
        for i in range(n_rel):
            pool = [
                tuple(rng.randint(0, 5) for _ in keys) for _ in range(8)
            ] + [tuple(100 + 10 * i + j for j in range(len(keys))) for j in range(2)]
            if trial % 4 == 0:
                pool.append(tuple(None for _ in keys))
            pcols = [f"p{i}_{c}" for c in ("x", "y")[: rng.randint(1, 2)]]
            rel_dfs.append(_mk_relation(spark, rng, keys, pcols, pool))
            rel_payloads.append(pcols)

        got = scd2_join(rel_dfs, keys, default_valid_to=DEFAULT_VT)

        con = duckdb.connect()
        names = []
        for i, r in enumerate(rel_dfs):
            pdf = r.select(keys + rel_payloads[i] + audit).toPandas()
            con.register(f"rel{i}_v", pdf)
            con.sql(f"CREATE TABLE rel{i} AS SELECT * FROM rel{i}_v")
            names.append(f"rel{i}")
        want = con.sql(_oracle_sql(names, rel_payloads, keys)).fetchall()

        assert _norm([tuple(r) for r in got.collect()]) == _norm(want), trial
        con.close()


def test_scd2_join_zero_width_input_version_never_matches(spark):
    """A zero-width version in an INPUT relation (vf == vt) can satisfy no
    positive-width spine segment's containment — engine and oracle agree
    it contributes its instant to the spine but never its payload."""
    cfg = ScdConfig(unique_key=("k",), default_valid_to=DEFAULT_VT)
    a = scd2_initial_load(
        spark.createDataFrame(
            [(1, "a1", dt.datetime(2024, 1, 1)), (1, "a2", dt.datetime(2024, 1, 3))],
            "k int, pa string, _updated_at timestamp",
        ),
        cfg,
    )
    zero = a.limit(1).select(
        "k", F.lit("ghost").alias("pa"),
        *[F.col(c) for c in a.columns if c not in ("k", "pa", "_valid_from", "_valid_to")],
        F.lit("2024-01-02 00:00:00").cast("timestamp").alias("_valid_from"),
        F.lit("2024-01-02 00:00:00").cast("timestamp").alias("_valid_to"),
    ).select(a.columns)
    rows = scd2_join(
        [a.unionByName(zero)], ["k"], default_valid_to=DEFAULT_VT
    ).collect()
    assert [r.pa for r in sorted(rows, key=lambda r: r._valid_from)] == [
        "a1", "a1", "a2"  # ghost's instant splits a1's window; ghost absent
    ]
    assert all(r._valid_from < r._valid_to for r in rows)


def test_scd2_join_shared_business_column_suffix_pinned(spark):
    """scd2_join.sql:44-55 caveat: the reference emits ambiguous SQL when
    two relations share a non-key payload column name.  Pinned behavior
    here (strictly more permissive): the LATER relation's duplicate is
    suffixed with its relation position."""
    cfg = ScdConfig(unique_key=("k",), default_valid_to=DEFAULT_VT)
    mk = lambda val: scd2_initial_load(
        spark.createDataFrame(
            [(1, val, dt.datetime(2024, 1, 1))],
            "k int, status string, _updated_at timestamp",
        ),
        cfg,
    )
    out = scd2_join([mk("left"), mk("right")], ["k"], default_valid_to=DEFAULT_VT)
    assert out.columns == [
        "k", "status", "status_1", "_is_current", "_valid_from", "_valid_to"
    ]
    row = out.collect()[0]
    assert (row.status, row.status_1) == ("left", "right")
