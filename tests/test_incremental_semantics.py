"""is_incremental full conjunction (is_incremental.sql:18-28) and the
Delta merge-clause construction (get_incremental_scd2_sql.sql:238-268) —
shape coverage that runs without delta-spark installed."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from dbt_scd2_utils_spark.plans.build import ScdTable
from dbt_scd2_utils_spark.plans.config import resolve_config
from dbt_scd2_utils_spark.sources.delta_sink import (
    HAS_DELTA,
    build_merge_clauses,
    scd2_delta_merge,
)
from dbt_scd2_utils_spark.sources.incremental import is_incremental_run

CFG_KW = dict(
    unique_key=["k"],
    updated_at_column="_updated_at",
    scd_type=2,
)


def _feed(spark, rows):
    return spark.createDataFrame(rows, "k int, v string, _updated_at timestamp")


# ---- is_incremental_run (catalog leg) ------------------------------------


def test_is_incremental_run_requires_table(spark):
    spark.sql("drop view if exists v_probe")
    spark.range(3).createOrReplaceTempView("v_probe")
    # temp view: exists in the catalog but is not a table
    assert is_incremental_run(spark, "v_probe") is False
    assert is_incremental_run(spark, "no_such_relation_xyz") is False


def test_is_incremental_run_full_refresh_and_materialization(spark):
    spark.sql("drop table if exists t_probe")
    spark.range(3).write.saveAsTable("t_probe")
    try:
        assert is_incremental_run(spark, "t_probe") is True
        assert is_incremental_run(spark, "t_probe", full_refresh=True) is False
        assert (
            is_incremental_run(
                spark, "t_probe", existing_materialization="table"
            )
            is False
        )
        assert (
            is_incremental_run(spark, "t_probe", existing_materialization="scd")
            is True
        )
    finally:
        spark.sql("drop table if exists t_probe")


# ---- ScdTable materialization-match leg ----------------------------------


def test_unknown_provenance_defaults_to_incremental(spark, tmp_path):
    """A table whose _scd_meta.json is missing has UNKNOWN provenance and
    must NOT be silently replaced (that would destroy accumulated SCD2
    history): ``_materialization_matches`` aligns with
    ``is_incremental_run``'s None-means-match rule and merges
    incrementally, backfilling the meta file on the way out."""
    import datetime as dt

    path = str(tmp_path / "tbl")
    t0, t1 = dt.datetime(2020, 1, 1), dt.datetime(2020, 6, 1)
    tbl = ScdTable(spark, path, resolve_config(**CFG_KW))
    tbl.build(_feed(spark, [(1, "a", t0)]))
    # Simulate a pre-meta-era table (or a lost meta file).
    os.remove(os.path.join(path, "_scd_meta.json"))
    assert tbl.exists() and tbl._materialization_matches()
    out = tbl.build(_feed(spark, [(1, "b", t1)]))
    # Incremental, not a destructive rebuild: key 1 keeps both versions.
    assert out.filter(F.col("k") == 1).count() == 2
    meta = json.load(open(os.path.join(path, "_scd_meta.json")))
    assert meta["materialized"] == "scd" and meta["scd_type"] == 2


def test_explicit_foreign_materialization_forces_initial(spark, tmp_path):
    """Only an EXPLICIT record of a different materialization forces the
    initial rebuild (is_incremental.sql:18-28 — dbt replacing a ``table``
    relation when the model switches to ``scd``)."""
    import datetime as dt

    path = str(tmp_path / "tbl")
    t0 = dt.datetime(2020, 1, 1)
    _feed(spark, [(1, "a", t0)]).write.parquet(path)
    with open(os.path.join(path, "_scd_meta.json"), "w") as f:
        json.dump({"materialized": "table"}, f)
    tbl = ScdTable(spark, path, resolve_config(**CFG_KW))
    assert tbl.exists() and not tbl._materialization_matches()
    out = tbl.build(_feed(spark, [(1, "a", t0), (2, "b", t0)]))
    # Initial load semantics: the foreign contents were replaced, not
    # merged into.
    assert out.filter(F.col("_is_current")).count() == 2
    meta = json.load(open(os.path.join(path, "_scd_meta.json")))
    assert meta["materialized"] == "scd" and meta["scd_type"] == 2


def test_meta_written_and_incremental_on_second_build(spark, tmp_path):
    import datetime as dt

    path = str(tmp_path / "tbl")
    t0, t1 = dt.datetime(2020, 1, 1), dt.datetime(2020, 6, 1)
    tbl = ScdTable(spark, path, resolve_config(**CFG_KW))
    tbl.build(_feed(spark, [(1, "a", t0)]))
    assert tbl._materialization_matches()
    out = tbl.build(_feed(spark, [(1, "b", t1)]))
    # Incremental (not a rebuild): key 1 now has two versions.
    assert out.filter(F.col("k") == 1).count() == 2


# ---- Delta merge clause construction --------------------------------------


def test_delta_merge_clauses_shape():
    cfg = resolve_config(
        **CFG_KW, incremental_predicates=["d._is_current = true"]
    ).validate()
    clauses = build_merge_clauses(cfg, ["k", "v", "_updated_at"])
    assert clauses["on_predicates"] == ["d._is_current = true"]
    assert clauses["matched_delete_condition"] == "s._scd2_op = 'delete'"
    assert clauses["matched_update_condition"] == "s._scd2_op = 'upsert'"
    # UPDATE SET touches exactly the reference's matched-update column set
    # (audit columns + change-tracked), every value source-qualified.
    assert set(clauses["update_set"]) == set(cfg.merge_update_cols)
    assert all(v == f"s.{c}" for c, v in clauses["update_set"].items())
    # INSERT covers every business + audit column.
    assert set(clauses["insert_values"]) == {
        "k", "v", "_updated_at", *cfg.audit_columns
    }


def test_delta_merge_clauses_no_collapse_drops_delete_clause():
    cfg = resolve_config(**CFG_KW, collapse_redundant_versions=False).validate()
    clauses = build_merge_clauses(cfg, ["k", "v", "_updated_at"])
    assert clauses["matched_delete_condition"] is None


@pytest.mark.skipif(HAS_DELTA, reason="delta installed: real path available")
def test_delta_merge_raises_without_delta(spark):
    with pytest.raises(ImportError, match="delta-spark is not installed"):
        scd2_delta_merge(spark, "any", spark.range(1), resolve_config(**CFG_KW))
