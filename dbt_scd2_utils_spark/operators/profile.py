"""Single-pass column profiling: the data-quality reconnaissance step
before any pipeline decision (partition strategy, null handling, key
candidacy).

One aggregation job computes, per requested column: non-null count,
exact distinct count, min and max (stringified so heterogeneous columns
stack into one relation), plus the table row count — then a ``stack``
pivots the single aggregate row into one row per column.

Scale notes:

- ONE scan of the table regardless of column count; all measures ride
  the same partial-aggregation shuffle.
- Exact multi-column ``count(distinct)`` makes Catalyst plan an Expand
  (input multiplied by #profiled columns before the partial agg).  That
  is the price of exactness and the oracle gate; at 100 TB swap in
  ``approx_count_distinct`` (HyperLogLog, one pass, no Expand) — the
  operator takes ``exact=False`` for exactly that.
- min/max are cast to string AFTER aggregation (two values per column,
  not per row).  Profile integral/string/timestamp columns; double
  min/max stringification is engine-specific (Java vs C++ float repr),
  so keep doubles out of oracle-gated profiles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: Sequence[str], exact: bool = True
) -> DataFrame:
    """One row per column: (column_name, n_rows, n_non_null, n_distinct,
    min_value, max_value)."""
    from ..functions.partitioning import parallelize_narrow

    cols = list(cols)
    if not cols:
        raise ValueError("profile_columns requires at least one column")
    # The Expand multiplies every input row by #cols BEFORE the partial
    # agg — on a local single-file scan (few partitions) that CPU burn
    # runs nearly single-core; spread narrow inputs first (no-op on
    # cluster-partitioned input).
    df = parallelize_narrow(df)
    distinct = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact
        else (lambda c: F.approx_count_distinct(c))
    )
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__cnt_{c}"),
            distinct(c).alias(f"__dst_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    row = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    stack_args = ", ".join(
        f"'{c}', `__cnt_{c}`, `__dst_{c}`, `__min_{c}`, `__max_{c}`" for c in cols
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) as "
            "(column_name, n_non_null, n_distinct, min_value, max_value)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "column_name", "n_rows", "n_non_null", "n_distinct",
        "min_value", "max_value",
    )


def profile_columns_sql(source_sql: str, cols: Sequence[str]) -> str:
    """DuckDB twin: per-column aggregate selects unioned (the oracle may
    scan N times; the engine's one-pass shape is the point)."""
    parts = [
        f"""
        select '{c}' as column_name,
               cast(count(*) as bigint) as n_rows,
               cast(count({c}) as bigint) as n_non_null,
               cast(count(distinct {c}) as bigint) as n_distinct,
               cast(min({c}) as varchar) as min_value,
               cast(max({c}) as varchar) as max_value
        from ({source_sql})
        """
        for c in cols
    ]
    return " union all ".join(parts)


def numeric_quantiles(
    df: DataFrame,
    cols: Sequence[str],
    q_bps: Sequence[int] = (2500, 5000, 7500, 9000),
) -> DataFrame:
    """Exact DISCRETE quantiles per column: one row per (column, q_bp)
    with the actual data value at 0-based rank ``(q_bp · (n-1)) div
    10000`` over the non-null ascending order.  No interpolation and no
    float arithmetic anywhere — the result is a value that EXISTS in the
    column, selected by pure integer rank, so the DuckDB twin
    (:func:`numeric_quantiles_sql`, same rank formula) matches
    bit-for-bit even on doubles.  (Spark's ``percentile``/DuckDB's
    ``quantile_cont`` interpolate in engine-specific float code —
    exactly the divergence this formulation removes.)

    Scale shape, per column: groupBy(value) with map-side partials →
    running-count window over the AGGREGATED distinct-value table
    (distinct values ≪ rows for real numeric columns; for near-unique
    doubles this window is the cost — use ``profile_columns`` +
    approx_percentile reconnaissance first if that's your shape).
    Columns are independent unioned branches of one job."""
    from pyspark.sql import Window

    q_bps = list(q_bps)
    spark = df.sparkSession
    qdf = F.broadcast(
        spark.createDataFrame([(int(q),) for q in q_bps], "q_bp long")
    )
    out = None
    for c in cols:
        vals = df.select(F.col(c).cast("double").alias("v")).filter(
            F.col("v").isNotNull()
        )
        counts = vals.groupBy("v").agg(F.count(F.lit(1)).alias("cnt"))
        w = Window.orderBy("v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        cum = counts.withColumn("cum", F.sum("cnt").over(w)).crossJoin(
            F.broadcast(vals.agg(F.count(F.lit(1)).alias("n")))
        )
        # rank k is 0-based; the quantile is the MIN value whose
        # cumulative count exceeds k — all requested quantiles resolve
        # in ONE aggregation over the broadcast-joined rank table (a
        # per-(column, q) filter+limit was 4× the jobs for the same
        # answer)
        picked = (
            cum.join(qdf, F.expr("cum > (q_bp * (n - 1)) div 10000"))
            .groupBy("q_bp")
            .agg(F.min("v").alias("value"))
            .select(
                F.lit(c).alias("column_name"),
                F.col("q_bp"),
                "value",
            )
        )
        out = picked if out is None else out.unionByName(picked)
    return out


def numeric_quantiles_sql(
    source_sql: str,
    cols: Sequence[str],
    q_bps: Sequence[int] = (2500, 5000, 7500, 9000),
) -> str:
    """DuckDB twin of :func:`numeric_quantiles` (identical rank math)."""
    qvals = ", ".join(f"({int(q)})" for q in q_bps)
    branches = []
    for c in cols:
        branches.append(f"""
select '{c}' as column_name, cast(q.q_bp as bigint) as q_bp,
       min(v) as value
from (
  select v, sum(cnt) over (order by v
           rows between unbounded preceding and current row) as cum, n
  from (
    select v, count(*) as cnt from (
      select cast({c} as double) as v from ({source_sql})
      where {c} is not null
    ) group by v
  ), (
    select count(*) as n from ({source_sql}) where {c} is not null
  )
), (values {qvals}) as q(q_bp)
where cum > (q.q_bp * (n - 1)) // 10000
group by q.q_bp
""")
    return "\nunion all\n".join(f"({b})" for b in branches)


def dataset_card(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
) -> DataFrame:
    """One-row dataset datasheet: corpus size, token mass, slice counts,
    exact-duplicate share, and the mean model-quality score — the
    numbers a dataset card quotes, computed in one pass plus one
    content-hash aggregate.  All values exact integers
    (``exact_dup_bp`` = share of rows whose content is not the first
    occurrence; ``mean_quality_micro`` = integer-div mean of the
    quality classifier's p_micro).

    Scale shape: one map-side-combined global aggregate over the
    narrow quality/token projection + one groupBy on the content hash;
    nothing driver-side."""
    from .text import quality_classifier

    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
    q = quality_classifier(df, id_col=id_col, text_col=text_col).select(
        F.col(id_col), "p_micro"
    )
    base = df.select(
        F.col(id_col),
        toks.alias("_nt"),
        F.col(lang_col).alias("_lang"),
        F.col(source_col).alias("_src"),
        F.md5(F.col(text_col)).alias("_h"),
    ).join(q, id_col)
    agg = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_nt").alias("n_tokens"),
        F.countDistinct("_lang").alias("n_langs"),
        F.countDistinct("_src").alias("n_sources"),
        F.countDistinct("_h").alias("_dh"),
        F.sum("p_micro").alias("_psum"),
    )
    return agg.select(
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_langs").cast("long").alias("n_langs"),
        F.col("n_sources").cast("long").alias("n_sources"),
        F.expr(
            "(n_docs - _dh) * 10000 div greatest(n_docs, 1)"
        ).alias("exact_dup_bp"),
        F.expr("_psum div greatest(n_docs, 1)").alias("mean_quality_micro"),
    )


def dataset_card_sql(
    source_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
) -> str:
    """DuckDB twin of :func:`dataset_card`."""
    from .text import quality_classifier_sql

    q = quality_classifier_sql(source_sql, id_col=id_col, text_col=text_col)
    return f"""
with q as ({q}),
base as (
  select s.{id_col},
         len(string_split_regex(trim(s.{text_col}), '\\s+')) as nt,
         s.{lang_col} as lang, s.{source_col} as src,
         md5(s.{text_col}) as h,
         q.p_micro
  from ({source_sql}) s join q using ({id_col})
)
select cast(count(*) as bigint) as n_docs,
       cast(sum(nt) as bigint) as n_tokens,
       cast(count(distinct lang) as bigint) as n_langs,
       cast(count(distinct src) as bigint) as n_sources,
       cast((count(*) - count(distinct h)) * 10000
            // greatest(count(*), 1) as bigint) as exact_dup_bp,
       cast(sum(p_micro) // greatest(count(*), 1) as bigint)
         as mean_quality_micro
from base
"""
