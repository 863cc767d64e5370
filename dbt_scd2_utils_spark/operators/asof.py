"""Generic as-of (point-in-time) join: for each left row, the single
latest right row with ``right_ts <= left_ts`` per key.

This is the point-lookup twin of the interval-containment join the
reference builds for SCD2 tables (``macros/joins/scd2_join.sql:21-66``,
see operators/temporal_join.py): where ``scd2_join`` needs materialized
``[_valid_from, _valid_to)`` windows, ``asof_join`` works directly
against any versioned/event stream — the validity window is implicit
("until the next version").

Scale design — union + window, NOT a join
-----------------------------------------
The naive plan (equi-join on key + ``l.ts >= r.ts`` + keep the max) makes
Catalyst emit every (left, right) key pair *before* the inequality
filters and the per-key max prune: O(L_k x R_k) intermediate rows per
key, which detonates on hot keys at 100 TB.  Instead we union both
sides, sort each key ONCE by time, and carry the most recent right
payload forward with ``last(..., ignorenulls=True)`` over
``rowsBetween(unboundedPreceding, currentRow)``:

- exactly ONE shuffle (on the key), no join operator at all;
- per-key cost is O(L_k + R_k) — linear, not quadratic;
- the window frame is running (rows-based), so Spark evaluates it in a
  single streaming pass per partition, no frame re-scan.

NULL keys never match (DuckDB ``ASOF JOIN`` equality semantics: NULL =
NULL is not a match): right rows with any NULL key column are dropped
before the union, so a NULL-key left row's running ``last()`` sees only
NULLs and emits a no-match row.  Left rows are always preserved.

Equal instants: a right row AT the left row's timestamp matches
(inclusive, same as DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``), enforced
by sorting right rows before left rows within a timestamp.  Right-side
duplicates on (key, ts) are resolved by ``right_order``: the LAST row in
that order wins — pass a deterministic tiebreak (or pre-aggregate) for
reproducible output.

``tolerance`` (seconds) nulls the carried payload when the matched right
row is older than ``left_ts - tolerance`` — the pandas ``merge_asof``
semantics — without a second pass: the right timestamp rides inside the
carried struct.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ts_us(col: Column) -> Column:
    # TIMESTAMP_NTZ-tolerant epoch micros (see operators/sessions.py).
    return F.unix_micros(col.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str] | None = None,
    right_order: Sequence[str] = (),
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left rows + the latest right payload as of ``left_ts`` (inclusive).

    Output = every ``left`` column, then each ``right_payload`` column
    (NULL when no right row is at-or-before the left timestamp, or when
    the match is older than ``tolerance_seconds``).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_payload is None:
        right_payload = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    payload = list(right_payload)
    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(
            f"right_payload collides with left columns: {sorted(overlap)}"
        )

    # One unioned relation; _side orders right (0) before left (1) at an
    # equal instant so inclusive matches see the same-timestamp version.
    carried = F.struct(
        F.col(right_ts).cast("timestamp").alias("__rts"),
        *[F.col(c) for c in payload],
    )
    # NULL join keys never match (SQL equality): a NULL-key right row
    # could only ever be seen by NULL-key left rows via partitionBy's
    # NULL-groups-together behavior — drop them so those left rows
    # fall through as no-match instead.
    for k in keys:
        right = right.filter(F.col(k).isNotNull())
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).cast("timestamp").alias("__ts"),
        *[F.col(c).alias(f"__ord_{i}") for i, c in enumerate(right_order)],
        F.lit(0).alias("__side"),
        carried.alias("__carry"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).cast("timestamp").alias("__ts"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__ord_{i}")
            for i, c in enumerate(right_order)
        ],
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__carry"].dataType).alias("__carry"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    # (__ts, __side, right_order...): at an equal instant every right row
    # (side 0) precedes the left row (side 1), so the left row's running
    # last() sees the same-timestamp version (inclusive match); among
    # equal-instant right rows the LAST in right_order wins.  Left rows'
    # all-NULL ord columns only order left vs left, where the carried
    # value is already identical.
    order = [F.col("__ts").asc(), F.col("__side").asc()] + [
        F.col(f"__ord_{i}").asc_nulls_first() for i in range(len(right_order))
    ]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = r.unionByName(l).withColumn(
        "__match", F.last("__carry", ignorenulls=True).over(w)
    )
    out = matched.filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        fresh = (
            _ts_us(F.col("__ts")) - _ts_us(F.col("__match.__rts"))
            <= int(tolerance_seconds) * 1_000_000
        )
        out = out.withColumn(
            "__match", F.when(fresh, F.col("__match"))
        )
    return out.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(c) for c in payload],
    )
