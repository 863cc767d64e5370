"""Temporal (as-of interval) join over N SCD2 tables on a shared spine.

Re-expression of ``macros/joins/scd2_join.sql:21-66``:

1. ``distinct_updates`` — union-DISTINCT of each relation's
   ``(join_keys, _valid_from)`` instants (only valid_from is needed: every
   valid_to equals some valid_from or the open-end default — lines 27-32).
2. ``temporal_spine`` — re-derive ``_is_current/_valid_from/_valid_to`` over
   the instants with the same audit-column windows (lines 35-42).
3. N left joins with interval containment
   ``spine.key = r.key AND spine.vf >= r.vf AND spine.vt <= r.vt``
   (lines 58-63) — Catalyst plans sort-merge/shuffled-hash on the equi keys
   with the range predicates as join-time filters.
4. Zero-width spine segments dropped (``spine.vf < spine.vt``, line 65).

Faithful caveat carried over (SURVEY.md §3.2): two relations sharing a
non-key business column name collide; we disambiguate by suffixing the
*later* relation's duplicate with its position (the reference would emit
ambiguous SQL — our behavior is strictly more permissive).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.audit import is_current_expr, valid_from_expr, valid_to_expr

AUDIT_NAMES = {"_VALID_FROM", "_VALID_TO", "_IS_CURRENT", "_UPDATED_AT", "_CHANGE_TYPE"}


def scd2_join(
    relations: Sequence[DataFrame],
    join_keys: Sequence[str],
    default_valid_to: str = "2999-12-31 23:59:59",
    valid_from_column: str = "_valid_from",
    valid_to_column: str = "_valid_to",
) -> DataFrame:
    """Join SCD2 tables on a temporal spine; returns one row per
    (key, spine window) with each relation's attributes as of that window."""
    if not relations:
        raise ValueError("scd2_join requires at least one relation")
    keys = list(join_keys)

    # 1. distinct_updates: union (distinct) of valid_from instants.
    instants = reduce(
        DataFrame.unionByName,
        [
            r.select(
                *[F.col(k) for k in keys],
                F.col(valid_from_column).cast("timestamp").alias("_updated_at"),
            )
            for r in relations
        ],
    ).distinct()

    # 2. temporal_spine: re-derive the windows over the instants.
    spine = instants.select(
        *keys,
        is_current_expr(keys, "_updated_at").alias("_is_current"),
        valid_from_expr(keys, "_updated_at").alias("_valid_from"),
        valid_to_expr(keys, "_updated_at", default_valid_to).alias("_valid_to"),
    )

    # 3. N interval-containment left joins.
    out = spine.alias("spine")
    seen_cols = {c.upper() for c in keys}
    payload_cols: list[str] = []
    for i, rel in enumerate(relations):
        alias = f"r{i}"
        cond = F.lit(True)
        for k in keys:
            cond = cond & (F.col(f"spine.{k}") == F.col(f"{alias}.{k}"))
        cond = (
            cond
            & (F.col("spine._valid_from") >= F.col(f"{alias}.{valid_from_column}"))
            & (F.col("spine._valid_to") <= F.col(f"{alias}.{valid_to_column}"))
        )
        # Project away join keys + audit columns (scd2_join.sql:44-55).
        rel_payload = [
            c
            for c in rel.columns
            if c.upper() not in {k.upper() for k in keys}
            and c.upper() not in AUDIT_NAMES
            and c.upper() != valid_from_column.upper()
            and c.upper() != valid_to_column.upper()
        ]
        renames = {}
        for c in rel_payload:
            name = c if c.upper() not in seen_cols else f"{c}_{i}"
            seen_cols.add(name.upper())
            renames[c] = name
        out = out.join(rel.alias(alias), cond, "left")
        payload_cols += [
            F.col(f"{alias}.{c}").alias(n) for c, n in renames.items()
        ]

    result = out.select(
        *[F.col(f"spine.{k}") for k in keys],
        *payload_cols,
        F.col("spine._is_current").alias("_is_current"),
        F.col("spine._valid_from").alias("_valid_from"),
        F.col("spine._valid_to").alias("_valid_to"),
    )

    # 4. Drop zero/negative-width spine windows.
    return result.filter(F.col("_valid_from") < F.col("_valid_to"))


def snapshot_at(
    table: DataFrame,
    as_of: str,
    valid_from_column: str = "_valid_from",
    valid_to_column: str = "_valid_to",
) -> DataFrame:
    """Point-in-time (time-travel) read of an SCD2 table: the rows whose
    half-open validity window contains ``as_of`` — the generalization of
    the reference's current-snapshot read path (``_is_current`` is just
    ``snapshot_at(now)``).  One row per key that existed at that instant;
    keys born later (or deleted-and-collapsed before it) are absent.

    Scale: a pure filter — pushes to the parquet scan on both window
    columns (min/max row-group stats skip history segments entirely when
    the table is written sorted/partitioned by validity), no shuffle, no
    window re-derivation."""
    ts = F.lit(as_of).cast("timestamp")
    return table.filter(
        (F.col(valid_from_column) <= ts) & (F.col(valid_to_column) > ts)
    )


def scd2_diff(
    table: DataFrame,
    from_ts: str,
    to_ts: str,
    unique_key: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    valid_from_column: str = "_valid_from",
    valid_to_column: str = "_valid_to",
) -> DataFrame:
    """CDC read over an SCD2 table: per key, what changed between two
    instants — ``'I'`` (key exists at ``to_ts`` only), ``'D'`` (at
    ``from_ts`` only), ``'U'`` (both, with any ``compare_cols``
    difference); unchanged keys are absent.  This is the incremental
    EXPORT surface: a downstream consumer holding the ``from_ts``
    snapshot applies exactly these rows to reach the ``to_ts`` snapshot
    — the read-side complement of the engine's merge.

    Shape: TWO filtered scans of the table (verified — the differing
    snapshot predicates preclude exchange reuse), each pruned by its own
    validity predicate, so against a materialized table sorted or
    partitioned by validity each side reads only the row groups covering
    its instant — NOT the full history twice.  Then a single full-outer
    key join with null-safe column comparison; at most one row per key
    per side (the SCD2 invariant) makes the join 1:1 — no fan-out, cost
    ∝ live keys, not history length.  Callers diffing an UNMATERIALIZED
    lineage should persist it first or the upstream plan executes twice.
    """
    keys = list(unique_key)
    audit = {valid_from_column, valid_to_column} | {
        "_is_current", "_updated_at", "_change_type", "_loaded_at", "_written_at"
    }
    if compare_cols is None:
        compare_cols = [
            c for c in table.columns if c not in keys and c not in audit
        ]
    payload = list(compare_cols)

    a = snapshot_at(table, from_ts, valid_from_column, valid_to_column).alias("a")
    b = snapshot_at(table, to_ts, valid_from_column, valid_to_column).alias("b")
    cond = F.lit(True)
    for k in keys:
        cond = cond & F.col(f"a.{k}").eqNullSafe(F.col(f"b.{k}"))
    joined = a.join(b, cond, "full_outer")

    # Side presence via the never-null validity column — key columns can
    # be legitimately NULL (composite null-bearing keys), so key
    # null-checks cannot detect the absent side of the full outer join.
    in_a = F.col(f"a.{valid_from_column}").isNotNull()
    in_b = F.col(f"b.{valid_from_column}").isNotNull()
    same = F.lit(True)
    for c in payload:
        same = same & F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
    change = (
        F.when(in_a & in_b & ~same, F.lit("U"))
        .when(in_b & ~in_a, F.lit("I"))
        .when(in_a & ~in_b, F.lit("D"))
    )
    # Internal name first: the table's own _change_type audit column exists
    # on BOTH join sides, so writing the output column under that name
    # directly would be an ambiguous reference.
    return (
        joined.withColumn("__diff_type", change)
        .filter(F.col("__diff_type").isNotNull())
        .select(
            *[F.coalesce(F.col(f"b.{k}"), F.col(f"a.{k}")).alias(k) for k in keys],
            F.col("__diff_type").alias("_change_type"),
            *[F.col(f"b.{c}").alias(c) for c in payload],
        )
    )
