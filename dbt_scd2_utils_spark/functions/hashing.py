"""Null-safe surrogate-key hashing.

Re-implements the hash contract the reference package relies on everywhere:
dbt_utils 1.3.0 ``generate_surrogate_key`` (pinned at
``/root/reference/integration_tests/package-lock.yml:4-6``), i.e.::

    md5( concat( coalesce(cast(c1 as varchar), '_dbt_utils_surrogate_key_null_'),
                 '-', coalesce(cast(c2 as varchar), ...), ... ) )

Call sites in the reference:
``macros/materializations/scd/types/type_2/get_incremental_scd2_sql.sql:84-87``
(``_scd2_key`` / ``_scd2_business_key`` / ``_scd2_hash``) and
``macros/materializations/scd/types/type_2/get_initial_load_scd2_sql.sql:55-56``.

Only *within-engine stability* is required (the engine compares its own
hashes batch-over-batch); cross-engine hash equality with Snowflake is not a
goal.  Cast-to-string formatting therefore just needs to be injective and
stable, which Spark's ``cast(x as string)`` is.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# Exactly dbt_utils' default placeholder so null semantics match the
# reference: NULL in any key/check column hashes like this marker string.
SURROGATE_KEY_NULL = "_dbt_utils_surrogate_key_null_"


def _as_col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def surrogate_key(cols: Sequence[str | Column]) -> Column:
    """Null-safe md5 surrogate key over ``cols``.

    Matches dbt_utils.generate_surrogate_key semantics: each column is cast
    to string, NULLs replaced by the sentinel, joined with ``-``, md5-hashed.
    An empty column list hashes the empty string (reference passes
    ``scd_check_columns | list`` which can legitimately be empty when every
    column is excluded).
    """
    if not cols:
        return F.md5(F.lit(""))
    parts = [
        F.coalesce(_as_col(c).cast("string"), F.lit(SURROGATE_KEY_NULL))
        for c in cols
    ]
    return F.md5(F.concat_ws("-", *parts))


def surrogate_key_sql(cols: Sequence[str], dialect: str = "duckdb") -> str:
    """ANSI/DuckDB SQL rendering of :func:`surrogate_key`.

    Used to build the DuckDB oracle twins for the driver's correctness gate.
    The *hash values* differ from Spark's only if cast-to-string formatting
    differs; both engines are injective per-engine, which is all the SCD
    semantics need (hash equality is only ever tested within one engine).
    """
    if not cols:
        return "md5('')"
    parts = [
        f"coalesce(cast({c} as varchar), '{SURROGATE_KEY_NULL}')" for c in cols
    ]
    joined = ", ".join(parts)
    return f"md5(concat_ws('-', {joined}))"
