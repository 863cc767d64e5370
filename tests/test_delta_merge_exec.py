"""End-to-end execution of the Delta MERGE path against a mock DeltaTable.

delta-spark is not installable in this container, so ``scd2_delta_merge``'s
``DeltaTable`` calls are captured by a fake that implements Delta's
DOCUMENTED merge semantics (clause order, first-matching-clause wins,
unmatched-by-source rows kept) as an independent DataFrame interpreter.
The merged result must be row-identical to the vanilla
``operators.scd2.scd2_incremental`` path on the same (target, batch) —
the equivalence claim in ``sources/delta_sink.py``'s module docstring,
mirroring the reference MERGE at
``get_incremental_scd2_sql.sql:238-268``.

This is deliberately NOT a re-run of scd2_incremental's own join plan: the
interpreter consumes only what scd2_delta_merge hands Delta — the ON
Column, the clause condition STRINGS, and the update/insert value maps —
so a wrong clause string or a mis-mapped column surfaces as a row diff.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_scd2_utils_spark.operators.scd2 import scd2_incremental, scd2_initial_load
from dbt_scd2_utils_spark.plans.config import resolve_config
from dbt_scd2_utils_spark.sources import delta_sink


class FakeMergeBuilder:
    """Interprets the builder-call sequence with Delta's merge semantics."""

    def __init__(self, fake_table, source, cond):
        self.fake_table = fake_table
        self.source = source  # already alias("s")-ed by the caller
        self.cond = cond
        self.clauses = []  # (kind, condition, mapping) in call order

    def whenMatchedDelete(self, condition=None):
        self.clauses.append(("delete", condition, None))
        return self

    def whenMatchedUpdate(self, condition=None, set=None):
        self.clauses.append(("update", condition, set))
        return self

    def whenNotMatchedInsert(self, condition=None, values=None):
        self.clauses.append(("insert", condition, values))
        return self

    def execute(self):
        d = self.fake_table.df.alias(self.fake_table.alias_name)
        s = self.source
        out_cols = self.fake_table.df.columns
        d_side = [F.col(f"{self.fake_table.alias_name}.{c}").alias(c) for c in out_cols]

        matched = d.join(s, self.cond, "inner")
        unmatched_targets = d.join(s, self.cond, "left_anti").select(*d_side)
        unmatched_source = s.join(d, self.cond, "left_anti")

        # Matched rows: first matching when-matched clause wins; a matched
        # row satisfying no clause is kept unchanged.
        remaining = matched
        kept_pieces = [unmatched_targets]
        for kind, condition, mapping in self.clauses:
            if kind == "insert":
                continue
            pred = F.expr(condition) if condition else F.lit(True)
            hit = remaining.filter(pred)
            remaining = remaining.filter(~F.coalesce(pred, F.lit(False)))
            if kind == "update":
                kept_pieces.append(
                    hit.select(
                        *[
                            (
                                F.expr(mapping[c]).alias(c)
                                if c in mapping
                                else F.col(f"{self.fake_table.alias_name}.{c}").alias(c)
                            )
                            for c in out_cols
                        ]
                    )
                )
            # kind == "delete": hit rows are dropped.
        kept_pieces.append(remaining.select(*d_side))

        for kind, condition, mapping in self.clauses:
            if kind != "insert":
                continue
            pred = F.expr(condition) if condition else F.lit(True)
            kept_pieces.append(
                unmatched_source.filter(pred).select(
                    *[F.expr(mapping[c]).alias(c) for c in out_cols]
                )
            )

        result = kept_pieces[0]
        for piece in kept_pieces[1:]:
            result = result.unionByName(piece)
        self.fake_table.result = result


class FakeDeltaTable:
    instances: list = []

    def __init__(self, spark, name):
        self.df = spark.table(name)
        self.alias_name = None
        self.result = None

    @classmethod
    def forName(cls, spark, name):
        inst = cls(spark, name)
        cls.instances.append(inst)
        return inst

    def alias(self, a):
        self.alias_name = a
        return self

    def merge(self, source, cond):
        return FakeMergeBuilder(self, source, cond)


CFG_KW = dict(
    unique_key=["user_id"],
    updated_at_column="_updated_at",
    deleted_at_column="deleted_at",
    default_valid_to="2200-01-01 00:00:00",
)


def _feed(spark):
    rows = [
        # (user_id, event_type, value, deleted_at_flag, ts)
        (1, "view", 10.0, False, "2024-01-02 00:00:00"),
        (1, "purchase", 20.0, False, "2024-01-05 00:00:00"),
        (2, "view", 5.0, False, "2024-01-03 00:00:00"),
        (3, "view", 7.0, False, "2024-01-04 00:00:00"),
        # batch 2 (after the split)
        (1, "purchase", 20.0, False, "2024-01-20 00:00:00"),  # redundant version
        (2, "error", 5.0, True, "2024-01-21 00:00:00"),  # soft delete
        (3, "click", 9.0, False, "2024-01-22 00:00:00"),  # real change
        (4, "signup", 1.0, False, "2024-01-23 00:00:00"),  # brand-new key
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, value double, del boolean, ts string"
    )
    return df.select(
        "user_id",
        "event_type",
        "value",
        F.when(F.col("del"), F.col("ts").cast("timestamp")).alias("deleted_at"),
        F.col("ts").cast("timestamp").alias("_updated_at"),
    )


def _split(feed):
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    return (
        feed.filter(F.col("_updated_at") <= cut),
        feed.filter(F.col("_updated_at") > cut),
    )


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(
        [tuple(str(r[c]) for c in cols) for r in df.collect()]
    )


@pytest.mark.parametrize("collapse", [True, False])
def test_delta_merge_execution_equals_vanilla_incremental(
    spark, monkeypatch, collapse
):
    cfg = resolve_config(**CFG_KW, collapse_redundant_versions=collapse).validate()
    b1, b2 = _split(_feed(spark))
    target = scd2_initial_load(b1, cfg).persist()
    view = f"delta_exec_target_{int(collapse)}"
    target.createOrReplaceTempView(view)

    monkeypatch.setattr(delta_sink, "DeltaTable", FakeDeltaTable)
    monkeypatch.setattr(delta_sink, "HAS_DELTA", True)
    FakeDeltaTable.instances.clear()

    delta_sink.scd2_delta_merge(spark, view, b2, cfg)

    assert len(FakeDeltaTable.instances) == 1
    got = FakeDeltaTable.instances[0].result
    assert got is not None, "merge.execute() never ran"

    expected = scd2_incremental(target, b2, cfg)
    assert sorted(got.columns) == sorted(expected.columns)
    assert _sorted_rows(got) == _sorted_rows(expected)

    # The merge must actually change the table: key 4 inserts, key 3 gets a
    # new version; key 1's unchanged batch row creates no version in either
    # mode (hash match → not a change; collapse only governs dropping rows a
    # later version made redundant).
    assert _sorted_rows(got) != _sorted_rows(target.select(*got.columns))
    n_versions = {
        r["user_id"]: r["n"]
        for r in got.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert n_versions[4] == 1
    assert n_versions[3] == 2
    assert n_versions[1] == 2
    target.unpersist()


def test_delta_merge_clause_call_order(spark, monkeypatch):
    """Delta evaluates matched clauses in the order they are chained — the
    delete clause must be registered BEFORE the update clause (a matched
    'delete' row satisfies neither update nor delete conditions ambiguously
    only if order is wrong)."""
    cfg = resolve_config(**CFG_KW).validate()
    b1, b2 = _split(_feed(spark))
    scd2_initial_load(b1, cfg).createOrReplaceTempView("delta_exec_order")

    recorded = []

    class RecordingBuilder(FakeMergeBuilder):
        def execute(self):
            recorded.extend(kind for kind, _, _ in self.clauses)
            super().execute()

    class RecordingTable(FakeDeltaTable):
        def merge(self, source, cond):
            return RecordingBuilder(self, source, cond)

    monkeypatch.setattr(delta_sink, "DeltaTable", RecordingTable)
    monkeypatch.setattr(delta_sink, "HAS_DELTA", True)
    RecordingTable.instances.clear()
    delta_sink.scd2_delta_merge(spark, "delta_exec_order", b2, cfg)
    assert recorded == ["delete", "update", "insert"]
