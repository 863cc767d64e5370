"""Build orchestration: the engine's equivalent of the dbt materialization.

Mirrors the reference lifecycle (``materialization_scd.sql:19-38`` +
``scd_plan.sql:24-287``, SURVEY.md §3.1):

1. resolve + validate config (``ScdConfig`` — same errors/warnings);
2. evaluate the model DataFrame once (``df.cache()`` ≡ the CTAS temp table,
   ``create_temp_table_as.sql:6-12``) and introspect ``df.schema``
   (≡ ``adapter.get_columns_in_relation``, no extra round trip in Spark);
3. decide initial vs incremental: ``full_refresh or target missing``
   (``scd_plan.sql:104``, ``is_incremental.sql:18-28``);
4. branch by scd_type 0/1/2 to the operator;
5. write atomically (tmp dir + rename — the vanilla-merge durability story,
   SURVEY.md §7.3 item 5).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.scd01 import (
    scd0_incremental,
    scd0_initial_load,
    scd1_incremental,
    scd1_initial_load,
)
from ..operators.scd2 import scd2_incremental, scd2_initial_load
from .config import ScdConfig


BUCKET_COL = "_scd_bucket"


def _release_intermediates(result: DataFrame) -> None:
    """Unpersist the merge intermediates an operator attached to its result
    (see ``scd2_incremental``).  Call only after the result has been
    materialized: persisted entries released early just recompute, but the
    salted chain's entries are CHECKPOINTED (lineage truncated), so the
    result DataFrame must not be re-executed after this call — both sinks
    satisfy that by writing first and re-reading from disk."""
    for df in getattr(result, "_scd_intermediates", []):
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped


class ScdTable:
    """An SCD-materialized table over a parquet directory.

    At cluster scale the same orchestration targets a catalog table
    (``saveAsTable``) or Delta; the parquet-directory sink keeps round-1
    dependency-free while preserving atomicity (tmp write + rename swap).

    ``partition_buckets=N`` is the 100-TB write path: the table is
    partitioned by a stable hash bucket of the business key, and an
    incremental run merges + rewrites ONLY the bucket partitions the batch's
    keys touch (dynamic partition overwrite) — write amplification drops
    from O(table) to O(affected buckets), and the unaffected partitions are
    never read either (partition pruning on the bucket filter).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        cfg: ScdConfig,
        partition_buckets: int | None = None,
    ):
        self.spark = spark
        self.path = path
        self.cfg = cfg.validate()
        self.partition_buckets = partition_buckets
        # Driver-side phase timings of the last incremental merge (e.g.
        # "list_affected"), for scale instrumentation (scripts/scale_proof).
        self.last_phase_times: dict[str, float] = {}

    # -- state ----------------------------------------------------------

    MATERIALIZATION = "scd"

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.path, "_SUCCESS"))

    def _meta_path(self) -> str:
        return os.path.join(self.path, "_scd_meta.json")

    # -- partition manifest ----------------------------------------------
    #
    # The in-repo stand-in for a table format's commit log (Delta/Iceberg,
    # which this environment cannot install): a tiny JSON file mapping
    # bucket id -> {files, rows} plus the on-disk data schema, rewritten
    # ATOMICALLY (tmp + os.replace) at every swap.  Without it, an
    # incremental merge's target-slice read (`spark.read.parquet(table)`)
    # pays a full InMemoryFileIndex listing of EVERY bucket partition —
    # with fixed ~50k-row buckets that listing grows O(table size) while
    # the data work is O(affected buckets), and at 100 TB the metadata
    # term dominates the merge (measured at s40: ~2.3 s of a ~11 s merge,
    # growing).  With the manifest, a merge resolves its affected buckets'
    # file paths with one driver-side JSON read — O(batch), not O(table).
    #
    # Crash safety: the manifest is advisory, never authoritative.  Every
    # read verifies the listed files still exist; a bucket whose entry is
    # stale (crash between partition swap and manifest write) or missing
    # falls back to an os.listdir of THAT bucket directory only — still
    # O(affected).  A wrong manifest can therefore cost a re-list, never
    # wrong data.

    def _manifest_path(self) -> str:
        return os.path.join(self.path, "_scd_manifest.json")

    def _read_manifest(self) -> dict | None:
        try:
            with open(self._manifest_path()) as f:
                m = json.load(f)
            return m if isinstance(m.get("buckets"), dict) else None
        except (OSError, ValueError):
            return None

    def _write_manifest(self, manifest: dict) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path())

    @staticmethod
    def _scan_bucket_dir(part_dir: str) -> dict | None:
        """{files, rows} for one bucket partition directory (None if the
        partition does not exist).  Row counts come from parquet footers
        (driver-local metadata reads, O(files in this bucket))."""
        try:
            names = sorted(
                n for n in os.listdir(part_dir)
                if n.endswith(".parquet") and not n.startswith((".", "_"))
            )
        except OSError:
            return None
        rows = 0
        try:
            import pyarrow.parquet as pq

            for n in names:
                rows += pq.ParquetFile(os.path.join(part_dir, n)).metadata.num_rows
        except Exception:
            rows = -1  # unknown; files list is still valid
        return {"files": names, "rows": rows}

    def _scan_full_manifest(self, data_schema_json: str) -> dict:
        """Full-table scan building a fresh manifest.  Used only where a
        full listing is already proportional to the work just done (the
        initial/full-refresh write) or as a one-time migration for a
        pre-manifest table."""
        buckets: dict[str, dict] = {}
        for name in os.listdir(self.path):
            if not name.startswith(f"{BUCKET_COL}="):
                continue
            entry = self._scan_bucket_dir(os.path.join(self.path, name))
            if entry is not None:
                buckets[name.split("=", 1)[1]] = entry
        return {"buckets": buckets, "schema": data_schema_json}

    def _affected_files(
        self, manifest: dict | None, affected: list
    ) -> tuple[list[str], bool]:
        """(absolute data-file paths for the affected buckets, any_stale) —
        manifest-first with per-bucket verify-and-relist fallback (see class
        note above).  ``any_stale`` tells the caller the manifest is behind
        the disk state (crash between swap and commit), in which case its
        recorded SCHEMA must not be trusted either: the swapped-in files may
        carry a newer schema, and pinning the old one would silently drop
        columns — the one way an advisory manifest could yield wrong data
        rather than a re-list."""
        buckets = (manifest or {}).get("buckets", {})
        out: list[str] = []
        any_stale = False
        for b in affected:
            part_dir = os.path.join(self.path, f"{BUCKET_COL}={b}")
            entry = buckets.get(str(b))
            if entry is None:
                # No manifest entry: either a BRAND-NEW bucket (no
                # directory yet — normal growth, an empty slice, NOT
                # stale) or a crash left a directory the manifest never
                # learned about (stale).
                fresh = self._scan_bucket_dir(part_dir)
                if fresh is not None:
                    any_stale = True
                    out.extend(
                        os.path.join(part_dir, n) for n in fresh["files"]
                    )
                continue
            names = entry["files"]
            if not all(
                os.path.exists(os.path.join(part_dir, n)) for n in names
            ):
                # Stale entry (crash between swap and manifest write):
                # re-list this one directory.
                any_stale = True
                fresh = self._scan_bucket_dir(part_dir)
                names = fresh["files"] if fresh else []
            out.extend(os.path.join(part_dir, n) for n in names)
        return out, any_stale

    def _write_meta(self) -> None:
        """Record how this relation was built so the next run can apply the
        reference's materialization-match rule (is_incremental.sql:18-28:
        a relation last built by a DIFFERENT materialization forces a full
        rebuild rather than an incremental merge)."""
        import json

        with open(self._meta_path(), "w") as f:
            json.dump(
                {
                    "materialized": self.MATERIALIZATION,
                    "scd_type": self.cfg.scd_type,
                },
                f,
            )

    def _materialization_matches(self) -> bool:
        """is_incremental.sql:18-28's materialization-match leg.  A missing
        or unreadable metadata file means UNKNOWN provenance and counts as a
        MATCH (incremental), aligned with
        ``sources.incremental.is_incremental_run``'s ``None``-means-match
        rule: the destructive alternative (treat unknown as mismatch →
        initial load → ``_atomic_write`` replaces the table) would silently
        discard accumulated SCD2 history for any table built before the
        meta file existed, or whose meta file was lost.  Only an EXPLICIT
        record of a different materialization forces the rebuild — same as
        dbt replacing a ``table`` relation when the model switches to
        ``scd``.  ``_write_meta`` runs on every build, so unknown-provenance
        tables are backfilled after one incremental cycle."""
        import json

        try:
            with open(self._meta_path()) as f:
                meta = json.load(f)
        except (OSError, ValueError):
            return True
        # scd_type is recorded for observability but not matched on — the
        # reference's rule is materialization-granular (an scd_type change
        # re-merges under the new config, same as changing any other config).
        return meta.get("materialized") == self.MATERIALIZATION

    def read(self) -> DataFrame:
        if not self.partition_buckets:
            return self.spark.read.parquet(self.path)
        manifest = self._read_manifest()
        if not manifest or not manifest.get("schema"):
            # Pre-manifest table: recursive discovery (one-time; the next
            # build writes the manifest).
            return self.spark.read.parquet(self.path).drop(BUCKET_COL)
        # Manifest-backed full read: ONE root readdir (catches bucket dirs a
        # crashed swap created before its manifest commit) + per-bucket
        # verify-and-relist, instead of Spark's recursive stat walk over
        # every partition — the read-side twin of the merge path's listing
        # fix.  Data files never contain BUCKET_COL (a partition-dir
        # column), so reading leaf files directly needs no drop().
        from pyspark.sql.types import StructType

        disk_buckets = [
            n.split("=", 1)[1]
            for n in os.listdir(self.path)
            if n.startswith(f"{BUCKET_COL}=")
        ]
        files, stale = self._affected_files(manifest, disk_buckets)
        schema = StructType.fromJson(json.loads(manifest["schema"]))
        if not files:
            return self.spark.createDataFrame([], schema)
        if stale:
            # Crash-recovery path: don't pin the (possibly older) recorded
            # schema over just-swapped files — merge it from footers.
            return self.spark.read.option("mergeSchema", "true").parquet(*files)
        return self.spark.read.schema(schema).parquet(*files)

    def _bucket_expr(self, df: DataFrame):
        # Stable across runs and engines enough for partitioning: md5 of the
        # null-safe business key, low 15 hex chars → bucket id.
        from ..functions.hashing import surrogate_key

        return (
            F.conv(F.substring(surrogate_key(list(self.cfg.unique_key)), 1, 15), 16, 10)
            .cast("long") % self.partition_buckets
        ).cast("int")

    # -- lifecycle ------------------------------------------------------

    def build(self, model_df: DataFrame, full_refresh: bool = False) -> DataFrame:
        """Run one materialization cycle; returns the post-build table."""
        cfg = self.cfg
        # S5: single evaluation of the model ("temp table") — the plan
        # references the batch multiple times (new_records, dedup, redundant
        # check), exactly why the reference materializes it once.
        model_df = model_df.cache()
        cfg.validate_against_schema(model_df.schema)

        # scd_plan.sql:104 + is_incremental.sql:18-28: initial unless the
        # relation exists AND was built by this materialization AND the run
        # is not a full refresh.
        initial = (
            full_refresh
            or not self.exists()
            or not self._materialization_matches()
        )
        if self.partition_buckets and not initial and cfg.scd_type == 2:
            result = self._build_bucketed_incremental(model_df)
            model_df.unpersist()
            return self.read()

        if cfg.scd_type == 2:
            if initial:
                result = scd2_initial_load(model_df, cfg)
            else:
                result = scd2_incremental(self.read(), model_df, cfg)
        elif cfg.scd_type == 1:
            if initial:
                result = scd1_initial_load(model_df, cfg)
            else:
                result = scd1_incremental(self.read(), model_df, cfg)
        else:
            if initial:
                result = scd0_initial_load(model_df, cfg)
            else:
                result = scd0_incremental(self.read(), model_df, cfg)

        self._atomic_write(result)
        model_df.unpersist()  # S8: drop the temp relation
        return self.read()

    def _build_bucketed_incremental(self, batch: DataFrame) -> None:
        """Merge only the bucket partitions the batch touches, rewrite only
        those partitions.

        Durability: the merged slice is first written to a STAGING directory
        (a durable barrier — the merge plan reads the live table, so its
        output must be fully on disk before any live file is deleted; a
        cache/persist barrier is only best-effort and recomputes against
        deleted files on eviction or executor loss).  Each affected bucket
        partition is then swapped in via rename, the same story as
        ``_atomic_write``.  The displaced partition is parked under a
        DOT-prefixed name (``.<part>__old``): Spark's file listing ignores
        ``.``/``_``-prefixed paths, so a crash between the two renames
        leaves the live table readable (that partition absent, its data
        recoverable from the dot dir) rather than corrupting partition
        discovery with a bogus ``<part>__old`` partition value.  Any such
        remnants from a previous crash are swept before the swap.  On an
        object store this rename protocol would be replaced by a table
        format's commit (Delta/Iceberg), same as ``_atomic_write``.
        """
        # Sweep parked-partition remnants from a previous crashed swap —
        # they are invisible to Spark (dot prefix) but would collide with
        # this swap's parking renames.
        import glob

        for leftover in glob.glob(os.path.join(self.path, f".{BUCKET_COL}=*__old")):
            shutil.rmtree(leftover, ignore_errors=True)
        affected = [
            r[0]
            for r in batch.select(self._bucket_expr(batch).alias("b")).distinct().collect()
        ]
        if not affected:
            # Empty incremental batch (a realistic CDC input): no bucket is
            # touched, so the merge is a no-op — and `.repartition(0, ...)`
            # below would raise.  Keep provenance current and leave the
            # table untouched, same net effect as the vanilla path merging
            # an empty batch.
            self._write_meta()
            return
        # Resolve the target slice through the manifest: O(affected-bucket)
        # driver work instead of a full-table file listing.  Reading the
        # leaf files directly (no partition discovery) also skips footer
        # schema merging — the manifest carries the data schema.
        t0 = time.perf_counter()
        manifest = self._read_manifest()
        if manifest is None and any(
            n.startswith(f"{BUCKET_COL}=") for n in os.listdir(self.path)
        ):
            # Pre-manifest table: one-time migration listing (same cost the
            # old full-listing path paid EVERY merge).
            sample = self.spark.read.parquet(self.path).drop(BUCKET_COL)
            manifest = self._scan_full_manifest(sample.schema.json())
            self._write_manifest(manifest)
        files, stale = self._affected_files(manifest, affected)
        schema_json = (manifest or {}).get("schema")
        from pyspark.sql.types import StructType

        data_schema = (
            StructType.fromJson(json.loads(schema_json)) if schema_json else None
        )
        if files:
            reader = self.spark.read
            if data_schema is not None and not stale:
                reader = reader.schema(data_schema)
            elif stale:
                # Crash-recovery path: the relisted files may be newer than
                # the manifest's recorded schema — derive it from footers.
                reader = reader.option("mergeSchema", "true")
            target_slice = reader.parquet(*files)
        elif data_schema is not None:
            # All affected buckets are brand new — merge against an empty
            # target slice of the recorded schema.
            target_slice = self.spark.createDataFrame([], data_schema)
        else:
            # No files AND no recorded schema (legacy empty table): derive
            # the SCD output schema from the batch itself.
            target_slice = scd2_initial_load(batch.limit(0), self.cfg)
        self.last_phase_times = {"list_affected": time.perf_counter() - t0}
        t0 = time.perf_counter()
        merged = scd2_incremental(target_slice, batch, self.cfg)
        stage = self.path + "__stage"
        (
            merged.withColumn(BUCKET_COL, self._bucket_expr(merged))
            # One file per touched bucket partition (not one per shuffle
            # task per partition): without this co-location the swap-in
            # dirs inherit the task fan-out and the table's file count
            # grows ∝ writes × buckets — every later merge then pays a
            # full-listing of all of them (measured: the s40 bucketed
            # merge cost grew WITH the table until this fix).
            .repartition(len(affected), F.col(BUCKET_COL))
            .write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(stage)
        )
        self.last_phase_times["merge_and_stage"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        # Staging is durable; now swap each affected partition directory.
        for b in affected:
            part = f"{BUCKET_COL}={b}"
            src = os.path.join(stage, part)
            dst = os.path.join(self.path, part)
            old = os.path.join(self.path, f".{part}__old")
            if os.path.exists(dst):
                os.rename(dst, old)
            if os.path.exists(src):
                os.rename(src, dst)
            # else: the merge emptied this bucket — leave it deleted.
            shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(stage, ignore_errors=True)
        # Commit the manifest: only the affected buckets' entries change —
        # O(batch) scanning, not O(table).  A crash before this point
        # leaves stale entries that the next merge's verify-and-relist
        # fallback repairs per-bucket.
        manifest = manifest or {"buckets": {}}
        manifest["schema"] = merged.schema.json()
        for b in affected:
            entry = self._scan_bucket_dir(
                os.path.join(self.path, f"{BUCKET_COL}={b}")
            )
            if entry is None:
                manifest["buckets"].pop(str(b), None)
            else:
                manifest["buckets"][str(b)] = entry
        self._write_manifest(manifest)
        self._write_meta()
        self.last_phase_times["swap_and_commit"] = time.perf_counter() - t0
        # Release the merge's persisted intermediates BEFORE refreshing:
        # they were planned over leaf files the swap just deleted, and
        # refreshByPath would otherwise try to recache the dead plans
        # (re-listing deleted files).
        _release_intermediates(merged)
        self.spark.catalog.refreshByPath(self.path)

    def _atomic_write(self, df: DataFrame) -> None:
        tmp = self.path + "__tmp"
        result = df  # the operator output carrying _scd_intermediates
        data_schema_json = df.schema.json()
        writer = df.write.mode("overwrite")
        if self.partition_buckets:
            df = df.withColumn(BUCKET_COL, self._bucket_expr(df))
            # One ~50k-row file per bucket dir; without the co-locating
            # repartition the initial build writes up to tasks×buckets
            # small files and every incremental merge pays an O(files)
            # listing of the whole table (see _build_bucketed_incremental).
            df = df.repartition(self.partition_buckets, F.col(BUCKET_COL))
            writer = df.write.mode("overwrite").partitionBy(BUCKET_COL)
        writer.parquet(tmp)
        old = self.path + "__old"
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old, ignore_errors=True)
        if self.partition_buckets:
            # Seed the partition manifest.  The full listing here is
            # proportional to the write that just happened, not to future
            # merges — incremental runs only ever patch affected entries.
            self._write_manifest(self._scan_full_manifest(data_schema_json))
        self._write_meta()
        # Release the merge's persisted intermediates BEFORE refreshing —
        # same ordering as _build_bucketed_incremental: they were planned
        # over leaf files the swap just deleted, and refreshByPath would
        # otherwise recache the dead plans (re-listing deleted files on
        # every vanilla merge).
        _release_intermediates(result)
        # Invalidate cached file listings for readers of the swapped path.
        self.spark.catalog.refreshByPath(self.path)


def scd_build(
    spark: SparkSession,
    model_df: DataFrame,
    path: str,
    cfg: ScdConfig | None = None,
    full_refresh: bool = False,
    **config_kwargs,
) -> DataFrame:
    """One-shot functional entry point (≡ one ``dbt run`` of an scd model)."""
    if cfg is None:
        from .config import resolve_config

        cfg = resolve_config(**config_kwargs)
    return ScdTable(spark, path, cfg).build(model_df, full_refresh=full_refresh)
