"""hash_split / shard_by_token_budget (operators/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_scd2_utils_spark.operators.sampling import (
    hash_split,
    shard_by_token_budget,
)


def test_split_stable_under_corpus_growth(spark):
    small = spark.range(1, 200).withColumnRenamed("id", "doc_id")
    big = spark.range(1, 2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(small).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(big).collect()}
    # Every doc keeps its assignment when the corpus grows 10×.
    assert all(b[k] == v for k, v in a.items())
    # All three labels materialize at this size.
    assert {"train", "val", "test"} == set(b.values())


def test_split_weights_validated(spark):
    with pytest.raises(ValueError, match="10000"):
        hash_split(
            spark.range(5).withColumnRenamed("id", "doc_id"),
            weights=(("train", 5000), ("test", 100)),
        )


def test_split_proportions_roughly_hold(spark):
    df = hash_split(spark.range(1, 5001).withColumnRenamed("id", "doc_id"))
    frac = (
        df.groupBy("split").count().withColumn("f", F.col("count") / 5000.0)
    )
    got = {r["split"]: r["f"] for r in frac.collect()}
    assert abs(got["train"] - 0.90) < 0.03
    assert abs(got["val"] - 0.05) < 0.02
    assert abs(got["test"] - 0.05) < 0.02


def test_shard_packing_sequential_and_oversized(spark):
    rows = [(1, 300), (2, 300), (3, 2000), (4, 100), (5, 100)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    # One bucket → a single sequential packing, deterministic by doc_id.
    out = {
        r["doc_id"]: r["shard"]
        for r in shard_by_token_budget(df, budget=512, buckets=1).collect()
    }
    # starts: 0, 300, 600, 2600, 2700 → shards 0, 0, 1, 5, 5
    assert out == {1: 0, 2: 0, 3: 1, 4: 5, 5: 5}
    # doc 3 (2000 tokens > budget) holds its shard alone
    assert list(out.values()).count(1) == 1


def test_shard_buckets_partition_work(spark):
    df = spark.range(1, 500).select(
        F.col("id").alias("doc_id"), F.lit(100).alias("n_tokens")
    )
    out = shard_by_token_budget(df, budget=1000, buckets=8)
    assert out.select("bucket").distinct().count() == 8
    # Within every bucket, shard ids start at 0 and are dense.
    per = out.groupBy("bucket").agg(
        F.min("shard").alias("lo"),
        F.max("shard").alias("hi"),
        F.countDistinct("shard").alias("n"),
    )
    assert per.filter((F.col("lo") != 0) | (F.col("n") != F.col("hi") + 1)).count() == 0


def test_weighted_repeat_fraction_and_stability(spark):
    from dbt_scd2_utils_spark.operators.sampling import weighted_repeat

    df = spark.range(1, 2001).withColumnRenamed("id", "doc_id")
    out = weighted_repeat(df, weight=1.3)
    n = out.count()
    # every doc once + ~30% twice
    assert 2000 * 1.25 < n < 2000 * 1.35
    # weight 0.5: a stable subset exactly once; subset of the weight-1.5 set
    half = {r["doc_id"] for r in weighted_repeat(df, weight=0.5).collect()}
    again = {r["doc_id"] for r in weighted_repeat(df, weight=0.5).collect()}
    assert half == again and 2000 * 0.45 < len(half) < 2000 * 0.55
    # integer weight: exact multiplicity
    assert weighted_repeat(df, weight=2.0).count() == 4000


def test_mixture_sample_rates_and_stability(spark):
    from dbt_scd2_utils_spark.operators.sampling import mixture_sample

    rows = [(i, f"src{i % 4}") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    rates = (("src0", 10_000), ("src1", 5_000), ("src2", 0))
    out = mixture_sample(df, rates=rates, default_bp=1_000).toPandas()
    by_dom = out.groupby("domain").size().to_dict()
    assert by_dom.get("src0", 0) == 1000          # keep all
    assert 400 <= by_dom.get("src1", 0) <= 600    # ~50%
    assert by_dom.get("src2", 0) == 0             # drop all
    assert 50 <= by_dom.get("src3", 0) <= 150     # default 10%

    # growth stability: kept set over a prefix is a subset of kept over all
    small = mixture_sample(
        df.filter("doc_id < 2000"), rates=rates, default_bp=1_000
    ).toPandas()
    assert set(small.doc_id) == set(out[out.doc_id < 2000].doc_id)


def test_mixture_sample_rejects_bad_rate(spark):
    import pytest
    from dbt_scd2_utils_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError, match="mixture rate"):
        mixture_sample(df, rates=(("a", 10_001),))


# ---- round-4 additions: temperature mixture + per-group cap ---------------


def test_temperature_alpha1_keeps_target_rate_everywhere(spark):
    """alpha=1 collapses the temperature to proportional sampling: every
    domain's keep_bp equals the global target."""
    from dbt_scd2_utils_spark.operators.sampling import temperature_mixture_sample

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mixture_sample(df, alpha=1.0, target_frac_bp=2_000)
    kept = out.collect()
    assert {r["keep_bp"] for r in kept} == {2000}
    # hashed Bernoulli at 20% over 1000 ids: loose band
    assert 100 <= len(kept) <= 320


def test_temperature_alpha0_equalizes_domain_totals(spark):
    """alpha=0 gives every domain the same weight: expected kept COUNT per
    domain is equal, so the small domain's keep_bp is ~9x the big one's
    (900 vs 100 rows)."""
    from dbt_scd2_utils_spark.operators.sampling import temperature_mixture_sample

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mixture_sample(df, alpha=0.0, target_frac_bp=2_000)
    bp = {r["domain"]: r["keep_bp"] for r in out.collect()}
    # target total 200; per-domain 100 -> big: 100/900=11.1% -> 1111 bp,
    # small: 100/100 -> 10000 bp (clamped exact fit)
    assert bp["big"] == 1111
    assert bp["small"] == 10000


def test_temperature_rejects_bad_target(spark):
    import pytest as _pytest

    from dbt_scd2_utils_spark.operators.sampling import temperature_mixture_sample

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with _pytest.raises(ValueError, match="target_frac_bp"):
        temperature_mixture_sample(df, target_frac_bp=10_001)


def test_per_group_cap_keeps_k_smallest(spark):
    from dbt_scd2_utils_spark.operators.sampling import per_group_cap

    rows = [(1, "c1"), (2, "c1"), (3, "c1"), (9, "c2"), (4, "c2"), (7, "c3")]
    df = spark.createDataFrame(rows, "vec_id long, cluster string")
    out = per_group_cap(df, "cluster", "vec_id", k=2).collect()
    by_c = {}
    for r in out:
        by_c.setdefault(r["cluster"], []).append((r["grp_rank"], r["vec_id"]))
    assert sorted(by_c["c1"]) == [(1, 1), (2, 2)]  # 3 dropped
    assert sorted(by_c["c2"]) == [(1, 4), (2, 9)]  # rank follows order_col
    assert sorted(by_c["c3"]) == [(1, 7)]


def test_per_group_cap_rejects_bad_k(spark):
    import pytest as _pytest

    from dbt_scd2_utils_spark.operators.sampling import per_group_cap

    df = spark.createDataFrame([(1, "a")], "vec_id long, cluster string")
    with _pytest.raises(ValueError, match="k must be"):
        per_group_cap(df, "cluster", "vec_id", k=0)


def test_training_order_is_permutation(spark):
    from dbt_scd2_utils_spark.operators.sampling import training_order

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    out = training_order(df, shards=8).collect()
    ranks = sorted(r.shuffle_rank for r in out)
    assert ranks == list(range(500))
    # shards cover the id space and respect rank order: every rank in
    # shard s is below every rank in shard s+1
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.shuffle_rank)
    shards = sorted(by_shard)
    for a, b in zip(shards, shards[1:]):
        assert max(by_shard[a]) < min(by_shard[b])


def test_training_order_seed_changes_order_not_membership(spark):
    from dbt_scd2_utils_spark.operators.sampling import training_order

    df = spark.range(200).select(F.col("id").alias("doc_id"))
    e0 = {r.doc_id: r.shuffle_rank for r in training_order(df, seed="e0").collect()}
    e1 = {r.doc_id: r.shuffle_rank for r in training_order(df, seed="e1").collect()}
    assert set(e0) == set(e1)
    assert e0 != e1  # different epoch, different permutation
    # rerun is bit-stable
    e0b = {r.doc_id: r.shuffle_rank for r in training_order(df, seed="e0").collect()}
    assert e0 == e0b


def test_training_order_no_single_partition_rank_window(spark):
    from dbt_scd2_utils_spark.operators.sampling import training_order

    df = spark.range(100).select(F.col("id").alias("doc_id"))
    plan = (
        training_order(df, shards=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the ROW-LEVEL rank window must be partitioned by shard; the only
    # unpartitioned window allowed is the offsets cumsum over ≤ shards
    # rows (the aggregated table)
    assert "row_number" in plan
    import re
    rn_specs = [
        l for l in plan.splitlines() if "row_number" in l and "windowspec" in l.lower()
    ]
    assert all("shard" in l for l in rn_specs), rn_specs


def test_pack_sequences_manifest_consistent_with_sharding(spark):
    from dbt_scd2_utils_spark.operators.sampling import (
        pack_sequences,
        shard_by_token_budget,
    )

    df = spark.createDataFrame(
        [(i, 10 + (i * 7) % 50) for i in range(200)],
        "doc_id long, n_tokens long",
    )
    manifest = pack_sequences(df, budget=128, buckets=4).collect()
    sharded = shard_by_token_budget(df, budget=128, buckets=4).collect()
    by_key = {}
    for r in sharded:
        by_key.setdefault((r.bucket, r.shard), []).append((r.doc_id, r.n_tokens))
    for m in manifest:
        want = sorted(by_key[(m.bucket, m.shard)])
        assert list(m.doc_ids) == [d for d, _ in want]
        assert list(m.token_counts) == [t for _, t in want]
        assert m.total_tokens == sum(t for _, t in want)
        assert m.n_docs == len(want)
        assert m.fill_bp == m.total_tokens * 10000 // 128
    # every doc appears exactly once across the manifest
    all_ids = [d for m in manifest for d in m.doc_ids]
    assert sorted(all_ids) == list(range(200))


def test_pack_sequences_oversized_doc_owns_shard(spark):
    from dbt_scd2_utils_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(1, 10), (2, 999), (3, 10)], "doc_id long, n_tokens long"
    )
    rows = {r.shard: r for r in pack_sequences(df, budget=100, buckets=1).collect()}
    # start offsets: doc1@0, doc2@10 (same window — overflows it by
    # design), doc3@1009 → shard 10; the overflow never leaks into the
    # NEXT doc's placement
    assert list(rows[0].doc_ids) == [1, 2]
    assert rows[0].fill_bp > 10000  # overflow recorded, not hidden
    assert list(rows[10].doc_ids) == [3]
    assert rows[10].fill_bp == 1000
