"""Randomized equivalence harness for operators/scd2_salted.py: the salted
hot-key window strategy must produce EXACTLY the unsalted chain's output
(row-for-row, via exceptAll both ways) on random feeds covering the
chain's edge cases — duplicate (key, updated_at) rows with differing
payloads (dedup tiebreak), identical consecutive content hashes
(changes_only / collapse runs), NULL updated_at, NULL key values,
composite keys, deleted_at / created_at / loaded_at configurations, and
collapse on/off.  salts is kept small (3) so salt boundaries and
empty-salt gaps are actually crossed, and hot_keys covers every key so
every row takes the salted path.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from dbt_scd2_utils_spark import ScdConfig, scd2_incremental, scd2_initial_load
from dbt_scd2_utils_spark.operators.scd2_salted import (
    scd2_incremental_salted,
    scd2_initial_load_salted,
)

BASE = dt.datetime(2024, 1, 1)


import pytest

# Randomized property / stress suite: excluded from the default run
# (pytest.ini addopts -m "not slow") so the driver-window selection
# stays fast; run with `pytest -m slow`.
pytestmark = pytest.mark.slow

def _rand_feed(spark, rng, composite):
    rows = []
    n_keys = rng.randint(2, 5)
    for ki in range(n_keys):
        k = None if (ki == 0 and rng.random() < 0.3) else ki
        k2 = (ki % 2) if composite else None
        n_v = rng.randint(1, 12)
        instants = sorted(rng.sample(range(48), min(n_v, 48)))
        for t in instants:
            u = None if rng.random() < 0.08 else BASE + dt.timedelta(hours=t)
            # Duplicate (key, u) rows sometimes (dedup tiebreak), and runs
            # of identical payloads (hash runs for changes_only/collapse).
            for _ in range(1 + (rng.random() < 0.2)):
                payload = rng.choice(["a", "a", "b", None, f"v{rng.randint(0, 2)}"])
                deleted = (
                    u if (u is not None and rng.random() < 0.1) else None
                )
                loaded = BASE + dt.timedelta(minutes=rng.randint(0, 500))
                rows.append((k, k2, payload, deleted, loaded, u))
    schema = (
        "k int, k2 int, payload string, deleted_at timestamp,"
        " _loaded_at timestamp, _updated_at timestamp"
    )
    df = spark.createDataFrame(rows, schema)
    return df if composite else df.drop("k2")


def _cfg(rng, composite):
    return ScdConfig(
        unique_key=("k", "k2") if composite else ("k",),
        deleted_at_column="deleted_at" if rng.random() < 0.5 else None,
        collapse_redundant_versions=rng.random() < 0.5,
        default_valid_to="2200-01-01 00:00:00",
    )


def _same(a, b):
    return a.exceptAll(b).count() + b.exceptAll(a).count()


def test_salted_scd2_property_random_feeds(spark):
    rng = random.Random(1331)
    for trial in range(6):
        composite = trial % 3 == 2
        feed = _rand_feed(spark, rng, composite)
        cfg = _cfg(rng, composite)
        keys = list(cfg.unique_key)
        hot = feed.select(*keys).distinct()

        v_init = scd2_initial_load(feed, cfg)
        s_init = scd2_initial_load_salted(feed, cfg, salts=3, hot_keys=hot)
        assert _same(v_init, s_init) == 0, ("initial", trial)

        split = F.lit((BASE + dt.timedelta(hours=20)).isoformat()).cast("timestamp")
        b1 = feed.filter(F.col("_updated_at") <= split)
        b2 = feed.filter(
            (F.col("_updated_at") > split) | F.col("_updated_at").isNull()
        )
        if not b1.limit(1).count() or not b2.limit(1).count():
            continue
        target = scd2_initial_load(b1, cfg)
        v_inc = scd2_incremental(target, b2, cfg)
        s_inc = scd2_incremental_salted(target, b2, cfg, salts=3, hot_keys=hot)
        assert _same(v_inc, s_inc) == 0, ("incremental", trial)


def test_salted_threshold_detection_routes_only_hot_keys(spark):
    """Auto-detection: one key above the threshold, the rest below — the
    output must still exactly match the unsalted chain."""
    rows = [
        (0, f"v{i}", BASE + dt.timedelta(minutes=i)) for i in range(200)
    ] + [
        (k, "x", BASE) for k in range(1, 30)
    ]
    feed = spark.createDataFrame(rows, "k int, payload string, _updated_at timestamp")
    cfg = ScdConfig(unique_key=("k",), default_valid_to="2200-01-01 00:00:00")
    v = scd2_initial_load(feed, cfg)
    s = scd2_initial_load_salted(feed, cfg, salts=4, hot_key_threshold=100)
    assert _same(v, s) == 0

    split = F.lit((BASE + dt.timedelta(minutes=100)).isoformat()).cast("timestamp")
    target = scd2_initial_load(feed.filter(F.col("_updated_at") <= split), cfg)
    b2 = feed.filter(F.col("_updated_at") > split)
    v2 = scd2_incremental(target, b2, cfg)
    s2 = scd2_incremental_salted(target, b2, cfg, salts=4, hot_key_threshold=100)
    assert _same(v2, s2) == 0


def test_salted_degenerate_single_instant_key(spark):
    """All versions at ONE updated_at (span=0: everything lands in salt 0
    and dedups to a single row) and an all-NULL-updated_at key."""
    rows = [(0, f"v{i}", BASE) for i in range(10)] + [
        (1, "n1", None), (1, "n2", None)
    ]
    feed = spark.createDataFrame(rows, "k int, payload string, _updated_at timestamp")
    cfg = ScdConfig(unique_key=("k",), default_valid_to="2200-01-01 00:00:00")
    hot = feed.select("k").distinct()
    v = scd2_initial_load(feed, cfg)
    s = scd2_initial_load_salted(feed, cfg, salts=4, hot_keys=hot)
    assert _same(v, s) == 0


def test_salted_rejects_unorderable_updated_at(spark):
    """Salt ranges come from the timestamp CAST while chain windows order
    by the RAW column; a string updated_at can order differently under
    the two rules ('2024-1-2' vs '2024-01-10'), so the salted entry
    points refuse it rather than silently break exact equivalence."""
    import pytest as _pytest

    from dbt_scd2_utils_spark import ScdConfig
    from dbt_scd2_utils_spark.operators.scd2_salted import (
        scd2_incremental_salted,
        scd2_initial_load_salted,
    )

    cfg = ScdConfig(unique_key=("k",))
    df = spark.createDataFrame(
        [(1, "2024-1-2 00:00:00", "a"), (1, "2024-01-10 00:00:00", "b")],
        "k long, _updated_at string, v string",
    )
    with _pytest.raises(ValueError, match="temporal or numeric"):
        scd2_initial_load_salted(df, cfg, hot_key_threshold=1)
    with _pytest.raises(ValueError, match="temporal or numeric"):
        scd2_incremental_salted(df, df, cfg, hot_key_threshold=1)


def test_adaptive_merge_routes_by_measured_skew_and_is_exact(spark):
    """scd2_incremental_adaptive (the opt-in merge_fn that removes the
    know-your-skew-in-advance requirement): below the threshold every
    merge routes PLAIN (zero salted machinery in the plan), above it the
    hot key routes SALTED — and the output is exactly the unsalted
    chain's on BOTH sides of the threshold.  Hotness must count target
    versions of batch keys plus batch rows, not batch rows alone: the
    accumulation leg feeds a tiny batch onto a key whose HISTORY crosses
    the threshold and still expects the salted route."""
    from dbt_scd2_utils_spark.operators.scd2_salted import (
        scd2_incremental_adaptive,
    )

    rows = [
        (0, f"v{i}", BASE + dt.timedelta(minutes=i)) for i in range(120)
    ] + [(k, "x", BASE) for k in range(1, 20)]
    feed = spark.createDataFrame(
        rows, "k int, payload string, _updated_at timestamp"
    )
    cfg = ScdConfig(unique_key=("k",), default_valid_to="2200-01-01 00:00:00")
    split = F.lit((BASE + dt.timedelta(minutes=60)).isoformat()).cast("timestamp")
    target = scd2_initial_load(feed.filter(F.col("_updated_at") <= split), cfg)
    b2 = feed.filter(F.col("_updated_at") > split)
    want = scd2_incremental(target, b2, cfg)

    # Above every key's volume: plain route, value-identical.
    log: list = []
    out = scd2_incremental_adaptive(
        target, b2, cfg, salts=4, hot_key_threshold=10_000, route_log=log
    )
    assert log == [("plain", 0)]
    assert _same(out, want) == 0

    # Threshold inside the skew: key 0 (61 target versions + 60 batch
    # rows) routes salted, the cold keys stay plain — still identical.
    log = []
    out = scd2_incremental_adaptive(
        target, b2, cfg, salts=4, hot_key_threshold=100, route_log=log
    )
    assert log == [("salted", 1)]
    assert _same(out, want) == 0

    # Accumulated hotness: a 1-row batch for key 0 must still route
    # salted once its HISTORY crosses the threshold (a batch-only count
    # would never notice).
    tiny = spark.createDataFrame(
        [(0, "final", BASE + dt.timedelta(days=2))],
        "k int, payload string, _updated_at timestamp",
    )
    log = []
    out = scd2_incremental_adaptive(
        want, tiny, cfg, salts=4, hot_key_threshold=100, route_log=log
    )
    assert log == [("salted", 1)]
    assert _same(out, scd2_incremental(want, tiny, cfg)) == 0


def test_adaptive_merge_composes_with_bucketed_sink(spark, tmp_path):
    """merge_fn=scd2_incremental_adaptive through the bucketed
    generational ScdTable: the staged table must equal the plain-merged
    twin while the route log shows the adaptive decision actually ran
    (the composition seam is the same merge_fn plumbing the salted chain
    uses — BASELINE 12g)."""
    from functools import partial

    from dbt_scd2_utils_spark.operators.scd2_salted import (
        scd2_incremental_adaptive,
    )
    from dbt_scd2_utils_spark.plans.build import ScdTable

    rows1 = [(k, "a", BASE) for k in range(40)]
    rows2 = [
        (0, f"v{i}", BASE + dt.timedelta(minutes=1 + i)) for i in range(50)
    ] + [(k, "b", BASE + dt.timedelta(hours=2)) for k in range(1, 40)]
    cfg = ScdConfig(unique_key=("k",), default_valid_to="2200-01-01 00:00:00")
    schema = "k int, payload string, _updated_at timestamp"
    b1 = spark.createDataFrame(rows1, schema)
    b2 = spark.createDataFrame(rows2, schema)

    log: list = []
    adaptive = ScdTable(
        spark, str(tmp_path / "adaptive"), cfg, partition_buckets=8,
        merge_fn=partial(
            scd2_incremental_adaptive, salts=4, hot_key_threshold=50,
            route_log=log,
        ),
    )
    plain = ScdTable(spark, str(tmp_path / "plain"), cfg, partition_buckets=8)
    for t in (adaptive, plain):
        t.build(b1)
        t.build(b2)
    assert log == [("salted", 1)], "key 0 (51 versions) must route salted"
    got, want = adaptive.read(), plain.read()
    assert got.exceptAll(want).count() + want.exceptAll(got).count() == 0
