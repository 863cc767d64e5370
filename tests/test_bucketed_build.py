"""Bucketed ScdTable: incremental rewrites touch only affected bucket
partitions and the result equals the unbucketed build."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dbt_scd2_utils_spark import ScdConfig
from dbt_scd2_utils_spark.plans.build import BUCKET_COL, ScdTable
from tests.fixtures.seeds import CUSTOMERS_RAW, CUSTOMERS_SCHEMA

CFG = ScdConfig(unique_key=("customer_id",), deleted_at_column="deleted_at")


def _mtimes(path):
    out = {}
    for b in os.listdir(path):
        if b.startswith(f"{BUCKET_COL}="):
            d = os.path.join(path, b)
            out[b] = max(
                os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)
            )
    return out


def test_bucketed_equals_plain_and_prunes_writes(spark, tmp_path):
    plain_path = str(tmp_path / "plain")
    buck_path = str(tmp_path / "bucketed")
    plain = ScdTable(spark, plain_path, CFG)
    bucketed = ScdTable(spark, buck_path, CFG, partition_buckets=8)

    b1 = spark.createDataFrame(CUSTOMERS_RAW[1], CUSTOMERS_SCHEMA)
    plain.build(b1)
    bucketed.build(b1)

    before = _mtimes(buck_path)
    assert len(before) > 1  # keys spread over several buckets

    # Batch 2 touches a subset of keys → only their buckets may be rewritten.
    b2 = spark.createDataFrame(CUSTOMERS_RAW[2], CUSTOMERS_SCHEMA)
    out_plain = plain.build(b2)
    out_buck = bucketed.build(b2)

    # Identical results (modulo row order).
    assert (
        out_plain.exceptAll(out_buck).count() == 0
        and out_buck.exceptAll(out_plain).count() == 0
    )

    after = _mtimes(buck_path)
    untouched = [b for b in before if before[b] == after.get(b)]
    rewritten = [b for b in before if before[b] != after.get(b)]
    assert rewritten, "some buckets must be rewritten"
    assert untouched, "unaffected buckets must NOT be rewritten"


def test_bucketed_read_roundtrip(spark, tmp_path):
    path = str(tmp_path / "rt")
    t = ScdTable(spark, path, CFG, partition_buckets=4)
    b1 = spark.createDataFrame(CUSTOMERS_RAW[1], CUSTOMERS_SCHEMA)
    out = t.build(b1)
    assert BUCKET_COL not in out.columns  # internal column hidden from readers
    assert out.count() > 0


# -- partition manifest -------------------------------------------------


def _disk_buckets(path):
    out = {}
    for b in os.listdir(path):
        if b.startswith(f"{BUCKET_COL}="):
            d = os.path.join(path, b)
            out[b.split("=", 1)[1]] = sorted(
                f for f in os.listdir(d) if f.endswith(".parquet")
            )
    return out


def _expected(spark, path, batches):
    """The unbucketed build over the same batch sequence."""
    t = ScdTable(spark, path, CFG)
    out = None
    for b in batches:
        out = t.build(spark.createDataFrame(b, CUSTOMERS_SCHEMA))
    return out


def _assert_same(a, b):
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_manifest_matches_disk_and_is_patched_incrementally(spark, tmp_path):
    path = str(tmp_path / "m")
    t = ScdTable(spark, path, CFG, partition_buckets=8)
    t.build(spark.createDataFrame(CUSTOMERS_RAW[1], CUSTOMERS_SCHEMA))
    m1 = t._read_manifest()
    assert m1 is not None and m1["schema"]
    assert {b: e["files"] for b, e in m1["buckets"].items()} == _disk_buckets(path)
    assert all(e["rows"] > 0 for e in m1["buckets"].values())

    t.build(spark.createDataFrame(CUSTOMERS_RAW[2], CUSTOMERS_SCHEMA))
    m2 = t._read_manifest()
    assert {b: e["files"] for b, e in m2["buckets"].items()} == _disk_buckets(path)
    # Untouched buckets keep their exact (files, rows) entries.
    b2 = spark.createDataFrame(CUSTOMERS_RAW[2], CUSTOMERS_SCHEMA)
    touched = {
        r[0] for r in b2.select(t._bucket_expr(b2).alias("b")).distinct().collect()
    }
    for b, e in m1["buckets"].items():
        if int(b) not in touched:
            assert m2["buckets"][b] == e


def test_manifest_crash_recovery_stale_entry(spark, tmp_path):
    """Simulate a crash between the partition swap and the manifest commit:
    a bucket's entry lists files that no longer exist.  The next merge must
    fall back to re-listing that bucket and still produce correct rows, and
    its commit repairs the manifest."""
    import json

    path = str(tmp_path / "crash")
    t = ScdTable(spark, path, CFG, partition_buckets=8)
    t.build(spark.createDataFrame(CUSTOMERS_RAW[1], CUSTOMERS_SCHEMA))
    mp = t._manifest_path()
    m = json.load(open(mp))
    for e in m["buckets"].values():  # every entry stale
        e["files"] = ["part-gone-from-a-crashed-swap.parquet"]
    json.dump(m, open(mp, "w"))

    b2 = spark.createDataFrame(CUSTOMERS_RAW[2], CUSTOMERS_SCHEMA)
    touched = {
        str(r[0]) for r in b2.select(t._bucket_expr(b2).alias("b")).distinct().collect()
    }
    out = t.build(b2)
    _assert_same(out, _expected(spark, str(tmp_path / "p1"),
                                [CUSTOMERS_RAW[1], CUSTOMERS_RAW[2]]))
    # The merge's commit repairs every bucket it touched; untouched stale
    # entries stay (a real crash only stales the crashed merge's own
    # buckets) and are verified-then-relisted whenever a merge reads them.
    m2 = t._read_manifest()
    disk = _disk_buckets(path)
    for b in touched:
        assert m2["buckets"][b]["files"] == disk[b]


def test_manifest_missing_migrates_legacy_table(spark, tmp_path):
    """A pre-manifest table (manifest deleted) merges correctly via the
    one-time migration listing, after which the manifest exists."""
    path = str(tmp_path / "legacy")
    t = ScdTable(spark, path, CFG, partition_buckets=8)
    t.build(spark.createDataFrame(CUSTOMERS_RAW[1], CUSTOMERS_SCHEMA))
    os.remove(t._manifest_path())

    out = t.build(spark.createDataFrame(CUSTOMERS_RAW[2], CUSTOMERS_SCHEMA))
    _assert_same(out, _expected(spark, str(tmp_path / "p2"),
                                [CUSTOMERS_RAW[1], CUSTOMERS_RAW[2]]))
    assert t._read_manifest() is not None


def test_bucketed_merge_into_brand_new_bucket(spark, tmp_path):
    """A batch whose keys hash to buckets with no existing partition must
    merge against an empty slice (manifest schema), not crash."""
    path = str(tmp_path / "newbucket")
    t = ScdTable(spark, path, CFG, partition_buckets=64)
    only_k1 = [r for r in CUSTOMERS_RAW[1] if r[0] == 1]
    t.build(spark.createDataFrame(only_k1, CUSTOMERS_SCHEMA))
    # Merge the full batch-2: with 64 buckets the other keys land in
    # partitions that do not exist yet.
    out = t.build(spark.createDataFrame(CUSTOMERS_RAW[2], CUSTOMERS_SCHEMA))
    _assert_same(out, _expected(spark, str(tmp_path / "p3"),
                                [only_k1, CUSTOMERS_RAW[2]]))
    m = t._read_manifest()
    assert {b: e["files"] for b, e in m["buckets"].items()} == _disk_buckets(path)


def test_bucketed_merge_empty_batch_is_noop(spark, tmp_path):
    """An empty CDC delta merges as a no-op (guard for repartition(0))."""
    path = str(tmp_path / "empty")
    t = ScdTable(spark, path, CFG, partition_buckets=8)
    before = t.build(spark.createDataFrame(CUSTOMERS_RAW[1], CUSTOMERS_SCHEMA))
    empty = spark.createDataFrame([], CUSTOMERS_SCHEMA)
    after = t.build(empty)
    _assert_same(before, after)


def test_manifest_stale_schema_not_pinned_over_swapped_files(spark, tmp_path):
    """A crash between swap and manifest commit can straddle a SCHEMA
    change: the swapped-in files carry a column the recorded manifest
    schema lacks.  The stale-detecting read must derive the schema from
    the files (mergeSchema) instead of pinning the old recorded one —
    otherwise the new column is silently dropped (wrong data, not a
    re-list)."""
    path = str(tmp_path / "schema_crash")
    t = ScdTable(spark, path, CFG, partition_buckets=8)
    t.build(spark.createDataFrame(CUSTOMERS_RAW[1], CUSTOMERS_SCHEMA))

    # Simulate the crashed swap: one bucket dir's files are replaced by
    # files with an EXTRA column under fresh names; manifest not updated.
    bdir = next(
        os.path.join(path, d)
        for d in os.listdir(path)
        if d.startswith(f"{BUCKET_COL}=")
    )
    swapped = spark.read.parquet(bdir).withColumn("tier", F.lit("gold"))
    staging = str(tmp_path / "swapped_files")
    swapped.coalesce(1).write.parquet(staging)
    for f in os.listdir(bdir):
        if f.endswith(".parquet"):
            os.remove(os.path.join(bdir, f))
    import shutil

    for i, f in enumerate(sorted(os.listdir(staging))):
        if f.endswith(".parquet"):
            shutil.copy(
                os.path.join(staging, f),
                os.path.join(bdir, f"part-swapped-{i}.parquet"),
            )

    out = t.read()
    assert "tier" in out.columns, "new column silently dropped"
    assert out.filter(F.col("tier") == "gold").count() > 0
    assert out.filter(F.col("tier").isNull()).count() > 0  # other buckets


def test_new_bucket_is_growth_not_stale(spark, tmp_path):
    """A bucket with no manifest entry AND no directory is normal growth
    (a batch introducing keys there), not a crash artifact — it must not
    poison the read into abandoning the pinned manifest schema.  Only an
    on-disk directory the manifest never learned about, or a listed file
    that vanished, counts as stale."""
    path = str(tmp_path / "growth")
    t = ScdTable(spark, path, CFG, partition_buckets=8)
    t.build(spark.createDataFrame(CUSTOMERS_RAW[1], CUSTOMERS_SCHEMA))
    manifest = t._read_manifest()
    known = list(manifest["buckets"])
    # brand-new bucket id: no entry, no dir -> no files, NOT stale
    fresh_id = next(str(b) for b in range(8) if str(b) not in known)
    files, stale = t._affected_files(manifest, [fresh_id])
    assert files == [] and stale is False
    # known bucket + new bucket -> known files, still not stale
    files, stale = t._affected_files(manifest, [known[0], fresh_id])
    assert files and stale is False
    # a listed file vanishing IS stale
    manifest["buckets"][known[0]]["files"] = ["part-vanished.parquet"]
    files, stale = t._affected_files(manifest, [known[0]])
    assert stale is True
