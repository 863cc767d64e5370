"""Driver-contract query surface: paired (Spark DataFrame, DuckDB oracle SQL)
builders for every operator the engine exposes (SURVEY.md §2 inventory).

Each ``queries()`` entry is an idiomatic-Spark pipeline built from the
engine's operators over the driver testdata; each ``oracle_sql()`` entry is
the independently-derived DuckDB twin from ``plans.oracles``.  Column names
are aliased identically on both sides (the driver's compare sorts columns by
name before value-hashing).

The canonical SCD change feed is derived from the ``events`` table:
``user_id`` = business key, ``ts`` = ``_updated_at``, ``event_type='error'``
⇒ soft-delete (``deleted_at = ts``), remaining columns tracked
(FIXTURES.md "Mapping onto driver testdata").
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.invariants import no_validity_overlaps, one_current_per_key
from .operators.scd01 import (
    scd0_incremental,
    scd0_initial_load,
    scd1_incremental,
    scd1_initial_load,
)
from .operators.scd2 import scd2_incremental, scd2_initial_load
from .operators.temporal_join import scd2_join
from .plans.config import ScdConfig
from .plans.oracles import (
    OracleSpec,
    scd0_initial_load_sql,
    scd1_incremental_sql,
    scd1_initial_load_sql,
    scd2_current_snapshot_sql,
    scd2_incremental_no_collapse_sql,
    scd2_initial_load_sql,
    scd2_join_sql,
)
from .session import prepare
from .sources.incremental import high_water_mark
from .sources.tables import load_table

# Mid-month split for the staged (initial + one incremental batch) queries —
# the events tables span 2024-01-01 .. 2024-01-31 at every scale factor.
SPLIT = "2024-01-16 00:00:00"

# The reference default open-end marker (2999-12-31) overflows pandas'
# nanosecond datetime64 when results are collected; the driver-facing query
# surface pins an in-range marker instead (engine default stays faithful).
VALID_TO = "2200-01-01 00:00:00"

FEED_COLS = ["user_id", "event_type", "value", "props", "deleted_at", "_updated_at"]

SCD2_CFG = ScdConfig(
    unique_key=("user_id",), deleted_at_column="deleted_at",
    default_valid_to=VALID_TO,
)
SCD01_CFG = ScdConfig(unique_key=("user_id",), default_valid_to=VALID_TO)

SCD2_SPEC = OracleSpec(
    keys=("user_id",),
    business_cols=tuple(FEED_COLS),
    updated_at="_updated_at",
    check_cols=("event_type", "value", "props", "deleted_at"),
    deleted_at="deleted_at",
    default_valid_to=VALID_TO,
)
SCD01_SPEC = OracleSpec(
    keys=("user_id",),
    business_cols=tuple(c for c in FEED_COLS if c != "deleted_at"),
    updated_at="_updated_at",
    check_cols=("event_type", "value", "props"),
    default_valid_to=VALID_TO,
)

FEED_SQL = """
select user_id, event_type, value, props,
       case when event_type = 'error' then ts end as deleted_at,
       ts as _updated_at
from events
"""

FEED01_SQL = """
select user_id, event_type, value, props, ts as _updated_at
from events
"""


def change_feed(spark: SparkSession, sf_dir: str, with_deletes: bool = True) -> DataFrame:
    """The Spark twin of FEED_SQL."""
    events = load_table(spark, sf_dir, "events")
    cols = [
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
        F.col("props"),
    ]
    if with_deletes:
        cols.append(
            F.when(F.col("event_type") == "error", F.col("ts")).alias("deleted_at")
        )
    cols.append(F.col("ts").alias("_updated_at"))
    return events.select(*cols)


def _split(feed: DataFrame) -> tuple[DataFrame, DataFrame]:
    cut = F.lit(SPLIT).cast("timestamp")
    return (
        feed.filter(F.col("_updated_at") <= cut),
        feed.filter(F.col("_updated_at") > cut),
    )


def _b1_sql(feed_sql: str) -> str:
    return f"select * from ({feed_sql}) where _updated_at <= timestamp '{SPLIT}'"


def _b2_sql(feed_sql: str) -> str:
    return f"select * from ({feed_sql}) where _updated_at > timestamp '{SPLIT}'"


# --------------------------------------------------------------------------
# Spark query callables (spark, sf_dir) -> DataFrame
# --------------------------------------------------------------------------


def q_scd2_initial_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    return scd2_initial_load(change_feed(spark, sf_dir), SCD2_CFG)


def q_scd2_current_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    out = scd2_initial_load(change_feed(spark, sf_dir), SCD2_CFG)
    return out.filter(F.col("_is_current")).select(*FEED_COLS)


def q_scd2_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Initial load on the first half, one incremental merge of the second —
    with collapse_redundant_versions the result must equal a full refresh
    (the oracle IS the full-refresh SQL: the reference's equivalence claim,
    README.md:178, is the correctness gate here)."""
    prepare(spark)
    b1, b2 = _split(change_feed(spark, sf_dir))
    return scd2_incremental(scd2_initial_load(b1, SCD2_CFG), b2, SCD2_CFG)


def q_scd2_incremental_no_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-previous branch: persisted versions are never dropped; the
    oracle re-derives the staged pipeline CTE-for-CTE."""
    prepare(spark)
    cfg = SCD2_CFG.with_overrides(collapse_redundant_versions=False)
    b1, b2 = _split(change_feed(spark, sf_dir))
    return scd2_incremental(scd2_initial_load(b1, cfg), b2, cfg)


def q_scd1_initial_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    return scd1_initial_load(change_feed(spark, sf_dir, with_deletes=False), SCD01_CFG)


def q_scd1_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    b1, b2 = _split(change_feed(spark, sf_dir, with_deletes=False))
    return scd1_incremental(scd1_initial_load(b1, SCD01_CFG), b2, SCD01_CFG)


def q_scd0_initial_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    return scd0_initial_load(change_feed(spark, sf_dir, with_deletes=False), SCD01_CFG)


def q_scd0_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Insert-only merge; batches are time-ordered, so the staged result
    equals the earliest-row full load (the oracle)."""
    prepare(spark)
    b1, b2 = _split(change_feed(spark, sf_dir, with_deletes=False))
    return scd0_incremental(scd0_initial_load(b1, SCD01_CFG), b2, SCD01_CFG)


def _view_purchase_rels(spark: SparkSession, sf_dir: str) -> list[DataFrame]:
    events = load_table(spark, sf_dir, "events")
    cfg = ScdConfig(unique_key=("user_id",), default_valid_to=VALID_TO)
    view = events.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("value").alias("view_value"),
        F.col("props").alias("view_props"),
        F.col("ts").alias("_updated_at"),
    )
    purch = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("value").alias("purch_value"),
        F.col("props").alias("purch_props"),
        F.col("ts").alias("_updated_at"),
    )
    return [scd2_initial_load(view, cfg), scd2_initial_load(purch, cfg)]


def q_scd2_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal spine join of two SCD2-ified event streams (J4/SO3/P9)."""
    prepare(spark)
    rels = _view_purchase_rels(spark, sf_dir)
    out = scd2_join(rels, ["user_id"], default_valid_to=VALID_TO)
    # scd2_join carries each relation's _updated_at-sibling payload; project
    # to the oracle's fixed column list.
    return out.select(
        "user_id", "view_value", "view_props", "purch_value", "purch_props",
        "_is_current", "_valid_from", "_valid_to",
    )


def q_incremental_source_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: high-water-mark scan — rows newer than the target's max(ts)."""
    prepare(spark)
    events = load_table(spark, sf_dir, "events")
    target = events.filter(F.col("ts") <= F.lit(SPLIT).cast("timestamp"))
    hwm = high_water_mark(target, "ts")
    return events.filter(F.col("ts") > F.lit(hwm))


def q_invariant_one_current_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    built = scd2_initial_load(change_feed(spark, sf_dir), SCD2_CFG)
    return one_current_per_key(built, ["user_id"])


def q_invariant_no_validity_overlaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    built = scd2_initial_load(change_feed(spark, sf_dir), SCD2_CFG)
    return no_validity_overlaps(built, ["user_id"])


# --------------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "scd2_initial_load": q_scd2_initial_load,
        "scd2_current_snapshot": q_scd2_current_snapshot,
        "scd2_incremental_merge": q_scd2_incremental_merge,
        "scd2_incremental_no_collapse": q_scd2_incremental_no_collapse,
        "scd1_initial_load": q_scd1_initial_load,
        "scd1_incremental_merge": q_scd1_incremental_merge,
        "scd0_initial_load": q_scd0_initial_load,
        "scd0_incremental_merge": q_scd0_incremental_merge,
        "scd2_temporal_join": q_scd2_temporal_join,
        "incremental_source_watermark": q_incremental_source_watermark,
        "invariant_one_current_per_key": q_invariant_one_current_per_key,
        "invariant_no_validity_overlaps": q_invariant_no_validity_overlaps,
    }


def oracle_sql() -> dict[str, str]:
    scd2_built = scd2_initial_load_sql(FEED_SQL, SCD2_SPEC)
    rel_sql = lambda et, v, p: scd2_initial_load_sql(  # noqa: E731
        f"select user_id, value as {v}, props as {p}, ts as _updated_at "
        f"from events where event_type = '{et}'",
        OracleSpec(
            keys=("user_id",),
            business_cols=("user_id", v, p, "_updated_at"),
            updated_at="_updated_at",
            check_cols=(v, p),
            default_valid_to=VALID_TO,
        ),
    )
    return {
        "scd2_initial_load": scd2_built,
        "scd2_current_snapshot": scd2_current_snapshot_sql(FEED_SQL, SCD2_SPEC),
        # collapse ⇒ incremental ≡ full refresh: the oracle is the
        # full-refresh derivation (independent path through the semantics).
        "scd2_incremental_merge": scd2_built,
        "scd2_incremental_no_collapse": scd2_incremental_no_collapse_sql(
            _b1_sql(FEED_SQL), _b2_sql(FEED_SQL), SCD2_SPEC
        ),
        "scd1_initial_load": scd1_initial_load_sql(FEED01_SQL, SCD01_SPEC),
        "scd1_incremental_merge": scd1_incremental_sql(
            _b1_sql(FEED01_SQL), _b2_sql(FEED01_SQL), SCD01_SPEC
        ),
        "scd0_initial_load": scd0_initial_load_sql(FEED01_SQL, SCD01_SPEC),
        # time-ordered batches ⇒ staged scd0 ≡ earliest-row full load.
        "scd0_incremental_merge": scd0_initial_load_sql(FEED01_SQL, SCD01_SPEC),
        "scd2_temporal_join": scd2_join_sql(
            [
                rel_sql("view", "view_value", "view_props"),
                rel_sql("purchase", "purch_value", "purch_props"),
            ],
            [["view_value", "view_props"], ["purch_value", "purch_props"]],
            ["user_id"],
            default_valid_to=VALID_TO,
        ),
        "incremental_source_watermark": f"""
            select * from events
            where ts > (
                select coalesce(max(ts), timestamp '1900-01-01 00:00:00')
                from events where ts <= timestamp '{SPLIT}'
            )
        """,
        "invariant_one_current_per_key": f"""
            select user_id, count(*) as current_record_count
            from ({scd2_built})
            where _is_current = true
            group by user_id
            having count(*) != 1
        """,
        "invariant_no_validity_overlaps": f"""
            with m as ({scd2_built})
            select a.user_id,
                   a._valid_from as a_valid_from, a._valid_to as a_valid_to,
                   b._valid_from as b_valid_from, b._valid_to as b_valid_to
            from m a join m b
              on a.user_id = b.user_id and a._valid_from != b._valid_from
            where a._valid_from < b._valid_to and b._valid_from < a._valid_to
        """,
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the SCD2 dimension from the sf0.001 events change
    feed (the reference's core materialization, end-to-end)."""
    prepare(spark)
    return q_scd2_initial_load(spark, "/root/testdata/sf0.001")
