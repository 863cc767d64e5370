"""Parquet table loading for the driver testdata (and general scans).

Maps the reference's S1/S2 scans (``builtin_overrides/source.sql:34``,
dbt seed loading) onto ``spark.read.parquet``.  Two wrinkles handled here:

- nanosecond timestamps (``timestamp[ns]``), which Spark's reader rejects
  outright ([PARQUET_TYPE_ILLEGAL]): flip the
  ``spark.sql.legacy.parquet.nanosAsLong`` escape hatch and rebuild a
  proper TimestampType column (microsecond truncation — the data is
  second-granular);
- tz-naive microsecond timestamps (``timestamp[us]``,
  ``isAdjustedToUTC=false``), which Spark reads as TIMESTAMP_NTZ: cast to
  the session-local TimestampType, interpreting the wall clock in the
  session timezone (pinned UTC by ``session.get_spark``), which is the
  same instant the ns-rebuild produced and the same value DuckDB reads —
  so every downstream operator and oracle sees one canonical temporal
  type regardless of how the files were written.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _nanos_ts_columns(path: str) -> list[str]:
    """Columns stored as timestamp[ns] in the parquet footer."""
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        return [
            name
            for name, typ in zip(schema.names, schema.types)
            if str(typ) == "timestamp[ns]"
        ]
    except Exception:
        return []


def _epoch_micros(spark: SparkSession, ts) -> int:
    """Microseconds since the Unix epoch for ``ts``, interpreting a naive
    datetime in the SESSION timezone (``spark.sql.session.timeZone``) —
    the same rule Spark applies to naive TimestampType literals — so the
    pushed-down raw-long comparison matches what a post-rebuild timestamp
    comparison would have selected, regardless of session tz."""
    from datetime import datetime, timedelta, timezone

    if ts.tzinfo is None:
        tzname = spark.conf.get("spark.sql.session.timeZone")
        try:
            from zoneinfo import ZoneInfo

            tz = ZoneInfo(tzname)
        except Exception:
            # Spark also accepts fixed offsets like "+08:00" / "GMT+08:00".
            import re

            m = re.fullmatch(r"(?:GMT|UTC)?([+-])(\d{2}):?(\d{2})", tzname)
            if not m:
                raise ValueError(
                    f"unrecognized spark.sql.session.timeZone {tzname!r}"
                )
            sign = 1 if m.group(1) == "+" else -1
            tz = timezone(
                sign * timedelta(hours=int(m.group(2)), minutes=int(m.group(3)))
            )
        ts = ts.replace(tzinfo=tz)
    epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
    return (ts - epoch) // timedelta(microseconds=1)


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    newer_than: tuple[str, "datetime"] | None = None,
) -> DataFrame:
    """Read one testdata table; nanosecond timestamps come back as proper
    TimestampType (values truncated ns → µs, matching DuckDB's read).

    ``newer_than=(col, ts)`` applies the incremental watermark predicate
    ``col > ts`` *before* the nanos rebuild, against the raw long column —
    a filter written after the rebuild sits behind the
    ``timestamp_micros(x div 1000)`` expression, which Catalyst cannot
    invert, so only ``IsNotNull`` reaches the scan and every row group is
    read.  On the raw long the comparison pushes down
    (``PushedFilters: [GreaterThanOrEqual(col, …)]``) and parquet min/max
    statistics skip row groups — the difference between scanning the delta
    and scanning 100 TB.  An incremental load always knows its high-water
    mark before the scan (it comes from the target), so the cutoff can be
    part of the read."""
    from pyspark.sql.types import TimestampNTZType

    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols = _nanos_ts_columns(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    ntz_cols = [
        f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)
    ]
    if newer_than is not None:
        c, ts = newer_than
        if c in ns_cols:
            # Exact integer cutoff: rebuilt-ts > ts  ⇔  raw_nanos div 1000
            # > micros(ts)  ⇔  raw_nanos >= (micros(ts)+1) * 1000.
            # (datetime subtraction, not float .timestamp() — float seconds
            # round away sub-µs precision at current epochs.)
            #
            # The raw long is an absolute epoch instant, but a NAIVE cutoff
            # datetime means "wall clock in the session timezone" (that is
            # how Spark interprets a naive TimestampType literal on the
            # non-nanos branch below).  Resolve it through the session tz
            # explicitly rather than assuming UTC — a user running with
            # spark.sql.session.timeZone=America/New_York would otherwise
            # get a cutoff shifted by the offset, silently dropping or
            # double-reading delta rows.
            micros = _epoch_micros(spark, ts)
            df = df.filter(F.col(c) >= F.lit((micros + 1) * 1000))
        elif c in ntz_cols:
            # Filter BEFORE the LTZ cast so the comparison sits directly on
            # the scanned column and pushes down; an NTZ literal keeps it a
            # pure wall-clock comparison (no session-tz involvement), which
            # is what a naive cutoff datetime means.
            df = df.filter(F.col(c) > F.lit(ts).cast("timestamp_ntz"))
        else:
            df = df.filter(F.col(c) > F.lit(ts))
    for c in ns_cols:
        # Integer `div` (not `/`): epoch-nanos exceed double's 53-bit mantissa,
        # so float division would corrupt the low microseconds.  Truncation
        # toward zero matches DuckDB's ns→µs read of the same files.
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    for c in ntz_cols:
        # Session tz is pinned UTC (session.get_spark), so this is the same
        # instant the ns rebuild produced for the same wall-clock value.
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def write_bucketed_table(
    df: DataFrame,
    name: str,
    keys: tuple[str, ...] | list[str],
    buckets: int = 8,
) -> None:
    """Persist a (typically SCD2) table hash-bucketed AND sorted by its
    business key in the session catalog.

    Bucketing is the shuffle-avoidance deployment for key-equality joins:
    two tables bucketed the same way join with NO Exchange on either side
    (the temporal spine join's containment predicates ride on the
    key-equality SortMergeJoin), and single-table window chains over the
    key can likewise reuse the layout.  At 100 TB this turns the spine
    join from two full shuffles into a co-located merge."""
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    # Idempotent under session-local catalogs: the in-memory catalog forgets
    # tables across sessions while the warehouse directory persists, so
    # mode("overwrite") alone hits LOCATION_ALREADY_EXISTS on a re-run.
    # Drop the catalog entry AND sweep any orphaned location.
    spark.sql(f"drop table if exists `{name}`")
    wh = spark.conf.get("spark.sql.warehouse.dir")
    wh_path = urlparse(wh).path or wh
    shutil.rmtree(os.path.join(wh_path, name.lower()), ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, *keys)
        .sortBy(*keys)
        .format("parquet")
        .saveAsTable(name)
    )
