"""SCD Type 0 and Type 1 operators: one row per key, constant audit columns.

Reference:
* SCD1 initial  ≡ ``.../type_1/get_initial_load_scd1_sql.sql:26-70`` (latest row per key)
* SCD1 merge    ≡ ``.../type_1/get_incremental_scd1_sql.sql:36-93`` (overwrite business cols)
* SCD0 initial  ≡ ``.../type_0/get_initial_load_scd0_sql.sql:27-69`` (earliest row per key)
* SCD0 merge    ≡ ``.../type_0/get_incremental_scd0_sql.sql:31-83`` (insert-only)

Deliberate reference asymmetry preserved (SURVEY.md §2.3 J7): the 0/1 merge
matches on RAW per-column equality of the business key (NOT null-safe), so a
NULL-bearing key never matches and re-inserts — exactly like the generated
Snowflake MERGE.

Determinism deviation (documented): equal ``updated_at`` ties in the per-key
dedup are broken by the business column values (the reference's ordering is
unstable on ties — ``get_incremental_scd1_sql.sql:66``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..plans.config import ScdConfig
from .scd2 import _orderable


def _dedup_latest_or_earliest(
    df: DataFrame, cfg: ScdConfig, business_cols: Sequence[str], latest: bool
) -> DataFrame:
    u = cfg.updated_at_column
    first = F.col(u).desc_nulls_last() if latest else F.col(u).asc_nulls_last()
    tiebreak: list[Column] = [
        F.col(c).asc_nulls_last()
        for c in _orderable(df, [c for c in business_cols if c.lower() != u.lower()])
    ]
    w = Window.partitionBy(*cfg.unique_key).orderBy(first, *tiebreak)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _scd01_audit(df: DataFrame, cfg: ScdConfig, business_cols: Sequence[str]) -> DataFrame:
    """Constant audit columns shared by types 0 and 1: always current, window
    [coalesce(created_at, updated_at), default_valid_to), change_type 'I'."""
    u = cfg.updated_at_column
    if cfg.created_at_column is not None:
        vf = F.coalesce(
            F.col(cfg.created_at_column).cast("timestamp"),
            F.col(u).cast("timestamp"),
        )
    else:
        vf = F.col(u).cast("timestamp")
    return df.select(
        *[F.col(c) for c in business_cols],
        F.lit(True).alias(cfg.is_current_column),
        vf.alias(cfg.valid_from_column),
        F.lit(cfg.default_valid_to).cast("timestamp").alias(cfg.valid_to_column),
        F.lit("I").alias(cfg.change_type_column),
    )


def _initial_load(df: DataFrame, cfg: ScdConfig, latest: bool) -> DataFrame:
    cfg.validate().validate_against_schema(df.schema)
    business_cols = cfg.business_columns(df.columns)
    deduped = _dedup_latest_or_earliest(
        df.select(*business_cols), cfg, business_cols, latest=latest
    )
    return _scd01_audit(deduped, cfg, business_cols)


def scd1_initial_load(df: DataFrame, cfg: ScdConfig) -> DataFrame:
    """One always-current row per key, LATEST version wins."""
    return _initial_load(df, cfg.with_overrides(scd_type=1), latest=True)


def scd0_initial_load(df: DataFrame, cfg: ScdConfig) -> DataFrame:
    """One immutable row per key, EARLIEST (original) version wins."""
    return _initial_load(df, cfg.with_overrides(scd_type=0), latest=False)


def _raw_key_join_cond(keys: Sequence[str]) -> Column:
    """Raw (non-null-safe) per-column equality — J7 parity."""
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"d.{k}") == F.col(f"s.{k}"))
    return cond


def scd1_incremental(
    target: DataFrame, batch: DataFrame, cfg: ScdConfig,
    broadcast_source: bool = True,
) -> DataFrame:
    """SCD1 merge: matched → overwrite business (non-key) columns, keep audit
    columns untouched (first-seen _valid_from survives); not matched → insert.

    Schema evolution matches the SCD2 merge (``align_evolved_schemas``,
    applied AFTER the loud config validation of the raw batch): an added
    column is NULL on rows the batch doesn't overwrite, a dropped column
    overwrites to NULL on matched keys and survives on unmatched ones."""
    from .scd2 import align_evolved_schemas

    cfg = cfg.with_overrides(scd_type=1)
    cfg.validate().validate_against_schema(batch.schema)
    target, batch = align_evolved_schemas(target, batch, cfg)
    business_cols = cfg.business_columns(batch.columns)
    source = _scd01_audit(
        _dedup_latest_or_earliest(
            batch.select(*business_cols), cfg, business_cols, latest=True
        ),
        cfg,
        business_cols,
    )
    return _apply_scd01_merge(
        target, source, cfg, business_cols,
        update_business=True, broadcast_source=broadcast_source,
    )


def scd0_incremental(
    target: DataFrame, batch: DataFrame, cfg: ScdConfig,
    broadcast_source: bool = True,
) -> DataFrame:
    """SCD0 merge: insert-only — existing keys retained untouched.

    Schema evolution as in SCD1/SCD2: insert-only semantics mean an added
    column is NULL on every pre-evolution row (type 0 never rewrites) and
    a dropped column is NULL only on post-evolution inserts."""
    from .scd2 import align_evolved_schemas

    cfg = cfg.with_overrides(scd_type=0)
    cfg.validate().validate_against_schema(batch.schema)
    target, batch = align_evolved_schemas(target, batch, cfg)
    business_cols = cfg.business_columns(batch.columns)
    source = _scd01_audit(
        _dedup_latest_or_earliest(
            batch.select(*business_cols), cfg, business_cols, latest=False
        ),
        cfg,
        business_cols,
    )
    return _apply_scd01_merge(
        target, source, cfg, business_cols,
        update_business=False, broadcast_source=broadcast_source,
    )


def _apply_scd01_merge(
    target: DataFrame,
    source: DataFrame,
    cfg: ScdConfig,
    business_cols: Sequence[str],
    update_business: bool,
    broadcast_source: bool,
) -> DataFrame:
    """Vanilla-Spark MERGE for types 0/1: broadcast left join from the target
    (big side streams, no shuffle) + anti-join inserts.

    update set excludes key columns (``get_incremental_scd1_sql.sql:55-60``);
    for type 0 nothing updates at all.
    """
    all_cols = list(business_cols) + cfg.audit_columns
    keys_lower = {k.lower() for k in cfg.unique_key}
    update_cols = (
        {c.lower() for c in business_cols if c.lower() not in keys_lower}
        if update_business
        else set()
    )

    src = F.broadcast(source) if broadcast_source else source
    joined = target.alias("d").join(src.alias("s"), _raw_key_join_cond(cfg.unique_key), "left")
    matched = F.col(f"s.{cfg.is_current_column}").isNotNull()

    resolved = joined.select(
        *[
            F.when(matched & F.lit(c.lower() in update_cols), F.col(f"s.{c}"))
            .otherwise(F.col(f"d.{c}"))
            .alias(c)
            for c in all_cols
        ]
    )

    # Inserts: raw-equality anti join — a NULL-bearing key never matches, so
    # it re-inserts every run (reference parity, not a bug here).  To avoid
    # shuffling the (huge) target for a small-vs-big anti join, first shrink
    # the target to the matched key set via a broadcast semi-join (target
    # streams), then anti-join source against that small set.
    src_keys = source.select(*cfg.unique_key).distinct()
    matched_keys = (
        target.alias("d")
        .join(F.broadcast(src_keys).alias("s"), _raw_key_join_cond(cfg.unique_key), "left_semi")
        .select(*cfg.unique_key)
        .distinct()
    )
    inserts = source.alias("s").join(
        F.broadcast(matched_keys).alias("d"),
        _raw_key_join_cond(cfg.unique_key),
        "left_anti",
    ).select(*[F.col(c) for c in all_cols])

    return resolved.unionByName(inserts)
