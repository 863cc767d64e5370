"""Property-style tests for SCD types 0/1 over randomized change feeds
(companion to test_property_random_feeds.py's SCD2 harness; beyond the
reference's test strategy, SURVEY.md §5).

The 0/1 merge asymmetries (operators/scd01.py:86-93) are exactly where a
tiebreak bug would hide:
  * SCD1's merge overwrites on match with NO recency guard (reference
    parity: get_incremental_scd1_sql.sql matches and updates regardless of
    updated_at), so with older-row re-delivery the staged result is "the
    latest row of the key's LAST-appearing batch" — not the global latest.
    Its audit columns are FIRST-SEEN (a match keeps the target's
    _valid_from), so that oracle is "latest updated_at within the key's
    first-appearing batch".  Both oracles are computed independently from
    the batch-tagged union.
  * SCD0 staged must equal full refresh EXACTLY (audit columns included):
    insert-only + chronological terciles means a key's earliest row is in
    its first-appearing batch, and re-deliveries always match → untouched.
  * NULL-bearing keys never match the raw-equality merge, so they re-insert
    once per batch they appear in (reference parity, J7).

Fifty independent random feeds run as ONE staged pipeline: each feed gets a
``feed`` id column that joins the business key, so per-feed semantics are
preserved (windows and merges partition by the full key) while the whole
suite costs a constant number of Spark jobs instead of 50 × per-feed runs.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from dbt_scd2_utils_spark import ScdConfig
from dbt_scd2_utils_spark.operators.scd01 import (
    scd0_incremental,
    scd0_initial_load,
    scd1_incremental,
    scd1_initial_load,
)

N_FEEDS = 50
SCHEMA = "feed int, k1 int, k2 string, payload string, amount double, _updated_at timestamp"

CFG = ScdConfig(
    unique_key=("feed", "k1", "k2"),
    default_valid_to="2200-01-01 00:00:00",
)


import pytest

# Randomized property / stress suite: excluded from the default run
# (pytest.ini addopts -m "not slow") so the driver-window selection
# stays fast; run with `pytest -m slow`.
pytestmark = pytest.mark.slow

def gen_feed(seed: int, n: int = 60) -> list[tuple]:
    """Messy but contract-respecting: content is a deterministic function of
    (key, ts) — same-(key, ts) duplicates always carry identical content
    (the reference's stated assumption; differing content under an equal
    updated_at is out of contract for every SCD type)."""
    rng = random.Random(seed)
    base = datetime(2024, 1, 1)
    rows = []
    for _ in range(n):
        k1 = rng.randint(1, 8)
        k2 = rng.choice(["A", "B", None])  # NULL key component
        ts = base + timedelta(minutes=rng.randint(0, 5000))
        h = hash((seed, k1, k2, ts.minute + ts.hour * 60 + ts.toordinal() * 1440))
        payload = [None, "p1", "p2", "p3"][h % 4]
        amount = [None, 1.5, 2.25, 10.0][(h >> 2) % 4]
        row = (seed, k1, k2, payload, amount, ts)
        rows.append(row)
        if rng.random() < 0.2:  # exact duplicate emission
            rows.append(row)
    return rows


def batched_rows() -> list[list[tuple]]:
    """Per-feed chronological terciles (shuffled within each batch), unioned
    across feeds; a sample of older rows is re-delivered in later batches."""
    batches: list[list[tuple]] = [[], [], []]
    for seed in range(1, N_FEEDS + 1):
        rows = sorted(gen_feed(seed), key=lambda r: r[5])
        rng = random.Random(seed * 31)
        n = len(rows)
        per_feed = [rows[: n // 3], rows[n // 3 : 2 * n // 3], rows[2 * n // 3 :]]
        for i in (1, 2):
            per_feed[i] = per_feed[i] + rng.sample(per_feed[i - 1], k=3)
            rng.shuffle(per_feed[i])
        for i in range(3):
            batches[i].extend(per_feed[i])
    return batches


def _staged(spark, initial, incremental):
    dfs = [spark.createDataFrame(b, SCHEMA) for b in batched_rows()]
    state = initial(dfs[0], CFG)
    tagged = [df.withColumn("_b", F.lit(i)) for i, df in enumerate(dfs)]
    for df in dfs[1:]:
        # materialize like a table write between runs
        state = spark.createDataFrame(state.collect(), state.schema)
        state = incremental(state, df, CFG)
    union_all = tagged[0].unionByName(tagged[1]).unionByName(tagged[2])
    return state.persist(), dfs, union_all.persist()


def _nonnull(df):
    return df.filter(F.col("k2").isNotNull())


def _first_batch_latest_ts(union_all):
    """Oracle for SCD1 first-seen _valid_from: per key, the max updated_at
    within the FIRST batch the key appears in."""
    first_b = union_all.groupBy("feed", "k1", "k2").agg(F.min("_b").alias("_fb"))
    return (
        union_all.join(first_b, ["feed", "k1", "k2"])
        .filter(F.col("_b") == F.col("_fb"))
        .groupBy("feed", "k1", "k2")
        .agg(F.max("_updated_at").alias("vf_expected"))
    )


def _last_batch_latest_rows(union_all):
    """Oracle for SCD1 business columns: the latest row (by updated_at)
    within the LAST batch each key appears in — the no-recency-guard
    overwrite means a later batch's re-delivered OLDER row still wins."""
    last_b = union_all.groupBy("feed", "k1", "k2").agg(F.max("_b").alias("_lb"))
    in_last = union_all.join(last_b, ["feed", "k1", "k2"]).filter(
        F.col("_b") == F.col("_lb")
    )
    latest_ts = in_last.groupBy("feed", "k1", "k2").agg(
        F.max("_updated_at").alias("_u")
    )
    return (
        in_last.join(latest_ts, ["feed", "k1", "k2"])
        .filter(F.col("_updated_at") == F.col("_u"))
        .select("feed", "k1", "k2", "payload", "amount", "_updated_at")
        .distinct()
    )


def test_scd1_staged_properties(spark):
    final, dfs, union_all = _staged(spark, scd1_initial_load, scd1_incremental)

    # One always-current row per non-null key; business cols == the latest
    # row of the key's LAST-appearing batch (no-recency-guard overwrite).
    biz = ["feed", "k1", "k2", "payload", "amount", "_updated_at"]
    s = _nonnull(final).select(*biz)
    f = _last_batch_latest_rows(_nonnull(union_all))
    assert s.exceptAll(f).count() + f.exceptAll(s).count() == 0

    assert _nonnull(final).filter(~F.col("_is_current")).count() == 0
    dupes = (
        _nonnull(final).groupBy("feed", "k1", "k2").count().filter("count > 1").count()
    )
    assert dupes == 0

    # First-seen _valid_from: latest updated_at of the key's first batch —
    # NOT the full-refresh value (the merge keeps target audit on match).
    expected = _first_batch_latest_ts(_nonnull(union_all))
    bad = (
        _nonnull(final)
        .join(expected, ["feed", "k1", "k2"])
        .filter(F.col("_valid_from") != F.col("vf_expected"))
        .count()
    )
    assert bad == 0

    # NULL-bearing keys never match raw equality ⇒ one insert per batch the
    # key appears in (J7 reference parity).
    null_rows = final.filter(F.col("k2").isNull()).count()
    expected_null = (
        union_all.filter(F.col("k2").isNull())
        .select("feed", "k1", "_b")
        .distinct()
        .count()
    )
    assert null_rows == expected_null
    final.unpersist(), union_all.unpersist()


def test_scd0_staged_equals_full_refresh(spark):
    final, dfs, union_all = _staged(spark, scd0_initial_load, scd0_incremental)

    # Insert-only + chronological splits ⇒ staged ≡ full refresh EXACTLY
    # (audit columns included) on non-null keys.
    full = scd0_initial_load(union_all.drop("_b"), CFG)
    s, f = _nonnull(final), _nonnull(full)
    assert s.exceptAll(f).count() + f.exceptAll(s).count() == 0

    # NULL-key accumulation, same rule as SCD1.
    null_rows = final.filter(F.col("k2").isNull()).count()
    expected_null = (
        union_all.filter(F.col("k2").isNull())
        .select("feed", "k1", "_b")
        .distinct()
        .count()
    )
    assert null_rows == expected_null
    final.unpersist(), union_all.unpersist()


def test_scd01_schema_evolution_equals_prealigned_merge(spark):
    """Schema evolution on the type-0/1 merges (align_evolved_schemas,
    shared with SCD2): an add-column batch must merge exactly as if the
    target carried the column as NULL, a drop-column batch exactly as if
    the batch carried NULL — and a batch missing a CONFIG-critical
    column must still raise the loud ScdConfigError (validation runs on
    the raw batch, before alignment)."""
    import pytest as _pytest

    from dbt_scd2_utils_spark.plans.config import ScdConfigError

    cfg = ScdConfig(unique_key=("k",), default_valid_to="2200-01-01 00:00:00")
    base = datetime(2024, 1, 1)
    b1 = spark.createDataFrame(
        [(k, f"p{k}", base) for k in range(6)],
        "k int, payload string, _updated_at timestamp",
    )
    b2_evo = spark.createDataFrame(
        [(k, f"q{k}", "gold", base + timedelta(days=1)) for k in range(3)],
        "k int, payload string, tier string, _updated_at timestamp",
    )
    null_tier = F.lit(None).cast("string")

    for inc, init in (
        (scd1_incremental, scd1_initial_load),
        (scd0_incremental, scd0_initial_load),
    ):
        target = init(b1, cfg)
        got = inc(target, b2_evo, cfg)
        assert "tier" in got.columns
        want = inc(target.withColumn("tier", null_tier), b2_evo, cfg)
        assert got.exceptAll(want).count() + want.exceptAll(got).count() == 0
        # SCD0 never rewrites → tier NULL everywhere; SCD1 overwrites the
        # matched keys with the batch's value.
        gold = got.filter(F.col("tier") == "gold").count()
        assert gold == (3 if inc is scd1_incremental else 0)

        # drop-column: batch without payload rides NULL, history survives.
        b3 = spark.createDataFrame(
            [(1, base + timedelta(days=2))], "k int, _updated_at timestamp"
        )
        got3 = inc(got, b3, cfg)
        assert "payload" in got3.columns
        want3 = inc(
            got, b3.withColumn("payload", null_tier).withColumn("tier", null_tier),
            cfg,
        )
        assert got3.exceptAll(want3).count() + want3.exceptAll(got3).count() == 0

        # config-critical columns still fail loudly.
        with _pytest.raises(ScdConfigError, match="updated_at_column"):
            inc(got, b2_evo.drop("_updated_at"), cfg)
        with _pytest.raises(ScdConfigError, match="unique_key column"):
            inc(got, b2_evo.drop("k"), cfg)
