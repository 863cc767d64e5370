"""Dataset assembly operators: deterministic splits and token-budget
sharding for training-data pipelines.

Beyond-reference surface (BASELINE.json north-star).  Both operators are
pure codegen built-ins (md5 + integer arithmetic + one per-bucket window)
with DuckDB oracle twins:

* ``hash_split`` — stable train/val/test assignment by hashed id.  A row's
  split never changes as the corpus grows (the classic modulo-space
  property), no shuffle at all — the assignment is a projection.
* ``shard_by_token_budget`` — pack documents into shards of roughly
  ``budget`` tokens.  A single GLOBAL running sum would serialize the
  corpus through one partition, so documents are first hash-bucketed and
  the running sum is per-bucket (parallel across buckets; one shuffle on
  the bucket id).  Shard boundaries use the shard-START offset, so a
  document larger than the budget still lands in its own shard instead of
  being lost.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# (label, basis points) — integer weights out of 10_000 for cross-engine
# exactness (float thresholds differ at shortest-repr boundaries).
DEFAULT_WEIGHTS: tuple[tuple[str, int], ...] = (
    ("train", 9000),
    ("val", 500),
    ("test", 500),
)


def _hash_bp(id_col: str, salt: str, modulus: int):
    """First 8 md5 hex chars of (salt|id) as an integer in [0, modulus)."""
    h = F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % modulus)


def _hash_bp_sql(id_col: str, salt: str, modulus: int) -> str:
    return (
        f"cast(concat('0x', substring(md5('{salt}' || '|' || "
        f"cast({id_col} as varchar)), 1, 8)) as bigint) % {modulus}"
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "split",
    weights: Sequence[tuple[str, int]] = DEFAULT_WEIGHTS,
) -> DataFrame:
    """(id, split_bp, split): deterministic weighted split assignment."""
    total = sum(w for _, w in weights)
    if total != 10_000:
        raise ValueError(f"split weights must total 10000 bp, got {total}")
    bp = _hash_bp(id_col, salt, 10_000)
    expr, cum = None, 0
    for label, w in weights[:-1]:
        cum += w
        cond = bp < cum
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    last = weights[-1][0]
    split = F.lit(last) if expr is None else expr.otherwise(last)
    return df.select(
        F.col(id_col),
        bp.alias("split_bp"),
        split.alias("split"),
    )


def hash_split_sql(
    source_sql: str,
    id_col: str = "doc_id",
    salt: str = "split",
    weights: Sequence[tuple[str, int]] = DEFAULT_WEIGHTS,
) -> str:
    bp = _hash_bp_sql(id_col, salt, 10_000)
    cases, cum = [], 0
    for label, w in list(weights)[:-1]:
        cum += w
        cases.append(f"when split_bp < {cum} then '{label}'")
    last = list(weights)[-1][0]
    case = "case " + " ".join(cases) + f" else '{last}' end" if cases else f"'{last}'"
    return f"""
select {id_col}, split_bp, {case} as split
from (select {id_col}, {bp} as split_bp from ({source_sql}))
"""


def shard_by_token_budget(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 4096,
    buckets: int = 64,
    salt: str = "shard",
) -> DataFrame:
    """(id, n_tokens, bucket, shard): greedy sequential packing of documents
    (ordered by id within their hash bucket) into ~``budget``-token shards.

    shard = start-offset div budget, where start-offset is the running token
    total BEFORE this document — so shard k covers offsets
    [k*budget, (k+1)*budget) and an oversized document occupies its shard
    alone.  ``(bucket, shard)`` is the physical shard key."""
    bucket = _hash_bp(id_col, salt, buckets).cast("int")
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_bucket = df.select(
        F.col(id_col),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        bucket.alias("bucket"),
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    # Exact long arithmetic (start is non-negative): (start - start % b) / b
    # is an exact multiple, so the double division cannot round — avoids
    # engine-specific floor(double) edge cases for non-power-of-2 budgets.
    shard = ((start - start % budget) / budget).cast("long")
    return with_bucket.select(
        id_col,
        "n_tokens",
        "bucket",
        shard.alias("shard"),
    )


def shard_by_token_budget_sql(
    source_sql: str,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 4096,
    buckets: int = 64,
    salt: str = "shard",
) -> str:
    bucket = _hash_bp_sql(id_col, salt, buckets)
    return f"""
with b as (
  select {id_col}, cast({tokens_col} as bigint) as n_tokens,
         cast({bucket} as int) as bucket
  from ({source_sql})
)
select {id_col}, n_tokens, bucket,
       cast((start_tok - start_tok % {budget}) / {budget} as bigint) as shard
from (
  select {id_col}, n_tokens, bucket,
         sum(n_tokens) over (
           partition by bucket order by {id_col} asc
           rows between unbounded preceding and current row
         ) - n_tokens as start_tok
  from b
)
"""


def weighted_repeat(
    df: DataFrame,
    id_col: str = "doc_id",
    weight: float = 1.0,
    salt: str = "epoch",
) -> DataFrame:
    """(id, copy): each row repeated ``floor(weight)`` times, plus one more
    copy for the hash-selected ``frac(weight)`` fraction of ids — the
    deterministic form of fractional-epoch dataset mixing (e.g. weight 1.3
    ⇒ every document once, a stable 30% twice).

    The expansion is a narrow generator (sequence + explode, no shuffle);
    repeat decisions are stable under corpus growth like ``hash_split``."""
    if weight < 0:
        raise ValueError(f"weight must be >= 0, got {weight}")
    base = int(weight)
    frac_bp = round((weight - base) * 10_000)
    copies = (
        F.lit(base)
        + (_hash_bp(id_col, salt, 10_000) < frac_bp).cast("int")
    )
    seq = F.when(copies >= 1, F.sequence(F.lit(1), copies)).otherwise(
        F.array().cast("array<int>")
    )
    return df.select(
        F.col(id_col),
        F.explode(seq).alias("copy"),
    )


def weighted_repeat_sql(
    source_sql: str,
    id_col: str = "doc_id",
    weight: float = 1.0,
    salt: str = "epoch",
) -> str:
    base = int(weight)
    frac_bp = round((weight - base) * 10_000)
    bp = _hash_bp_sql(id_col, salt, 10_000)
    return f"""
with c as (
  select {id_col},
         {base} + cast(({bp}) < {frac_bp} as int) as copies
  from ({source_sql})
)
select {id_col}, cast(unnest(generate_series(1, copies)) as int) as copy
from c
"""


DEFAULT_MIXTURE: tuple[tuple[str, int], ...] = (
    ("src0", 10_000),
    ("src1", 5_000),
    ("src2", 2_500),
)


def mixture_sample(
    df: DataFrame,
    rates: Sequence[tuple[str, int]] = DEFAULT_MIXTURE,
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
    default_bp: int = 1_000,
) -> DataFrame:
    """Deterministic per-domain subsampling to target mixture rates.

    ``rates`` maps a domain to its keep-rate in basis points (10000 = keep
    all); unlisted domains fall back to ``default_bp``.  The keep decision
    is the same hashed-id Bernoulli as :func:`hash_split` — stable under
    corpus growth (a kept document stays kept as new data arrives, so
    downstream shards/caches don't churn), reproducible across engines, and
    a pure projection+filter: zero shuffle at any scale.  This is the
    standard knob for re-weighting web/code/reference domains in a training
    mix without materializing per-domain tables.

    Returns kept rows only: (id, domain, mix_bp)."""
    for _, bp in rates:
        if not 0 <= bp <= 10_000:
            raise ValueError(f"mixture rate must be in [0, 10000] bp, got {bp}")
    if not 0 <= default_bp <= 10_000:
        raise ValueError(f"default_bp must be in [0, 10000], got {default_bp}")
    bp = _hash_bp(id_col, salt, 10_000)
    rate = None
    for dom, r in rates:
        cond = F.col(domain_col) == dom
        rate = F.when(cond, r) if rate is None else rate.when(cond, r)
    rate = F.lit(default_bp) if rate is None else rate.otherwise(default_bp)
    return (
        df.select(
            F.col(id_col),
            F.col(domain_col).alias("domain"),
            bp.alias("mix_bp"),
            rate.alias("keep_bp"),
        )
        .filter(F.col("mix_bp") < F.col("keep_bp"))
        .select(id_col, "domain", "mix_bp")
    )


def mixture_sample_sql(
    source_sql: str,
    rates: Sequence[tuple[str, int]] = DEFAULT_MIXTURE,
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
    default_bp: int = 1_000,
) -> str:
    bp = _hash_bp_sql(id_col, salt, 10_000)
    whens = " ".join(f"when {domain_col} = '{d}' then {r}" for d, r in rates)
    case = f"case {whens} else {default_bp} end" if whens else str(default_bp)
    return f"""
select {id_col}, domain, mix_bp
from (
  select {id_col}, {domain_col} as domain, {bp} as mix_bp, {case} as keep_bp
  from ({source_sql})
)
where mix_bp < keep_bp
"""


# Shared keep-rate expression for temperature mixture sampling — ONE format
# string rendered into both engines so the double tree is identical (all
# fractional literals exponent-form DOUBLE; see operators/search.py for the
# DECIMAL-literal divergence this avoids).  Inputs n_d/total/sum_pow are
# exact integers/doubles from counts.
#   w_d      = n_d^alpha / sum_pow          (temperature-flattened weight)
#   keep_d   = target_frac * total * w_d / n_d
#   keep_bp  = clamp(round(1e4 * keep_d), 0, 10000)
_TEMP_KEEP_BP = (
    "least(10000, greatest(0, cast(round("
    "1.0e4 * {tf} * total * power(cast(n_d as double), {a}) / (sum_pow * n_d)"
    ") as int)))"
)


def temperature_mixture_sample(
    df: DataFrame,
    alpha: float = 0.5,
    target_frac_bp: int = 3_000,
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Temperature-based mixture sampling: per-domain keep rates computed
    IN-PLAN from domain sizes, p_d ∝ n_d^alpha (alpha<1 flattens the
    mixture toward small domains — the multilingual/low-resource
    upweighting scheme), scaled so the expected kept total is
    ``target_frac_bp`` of the corpus.  A rate clamping at 10000 bp means
    "keep the whole domain" (no oversampling here — compose
    :func:`epoch_weighted_repeat` for fractional epochs above 1.0).

    Unlike :func:`mixture_sample` the rates are data-derived: one
    domain-count aggregate (map-side combined), a 1-row scalar agg, a
    broadcast rate join — no driver collect, no shuffle of the corpus —
    then the same stable hashed-id Bernoulli keep as ``hash_split``.

    Returns kept rows: (id, domain, mix_bp, keep_bp)."""
    if not 0 <= target_frac_bp <= 10_000:
        raise ValueError(f"target_frac_bp must be in [0, 10000], got {target_frac_bp}")
    sizes = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_d")
    )
    totals = sizes.agg(
        F.sum("n_d").alias("total"),
        F.sum(F.expr(f"power(cast(n_d as double), {_sql_dbl(alpha)})")).alias(
            "sum_pow"
        ),
    )
    keep_bp = _TEMP_KEEP_BP.format(
        tf=f"(cast({target_frac_bp} as double) / 1.0e4)", a=_sql_dbl(alpha)
    )
    rates = (
        sizes.crossJoin(F.broadcast(totals))
        .select("domain", F.expr(keep_bp).alias("keep_bp"))
    )
    bp = _hash_bp(id_col, salt, 10_000)
    return (
        df.select(
            F.col(id_col), F.col(domain_col).alias("domain"), bp.alias("mix_bp")
        )
        .join(F.broadcast(rates), "domain")
        .filter(F.col("mix_bp") < F.col("keep_bp"))
        .select(id_col, "domain", "mix_bp", "keep_bp")
    )


def _sql_dbl(x: float) -> str:
    return f"cast({float(x)!r} as double)"


def temperature_mixture_sample_sql(
    source_sql: str,
    alpha: float = 0.5,
    target_frac_bp: int = 3_000,
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> str:
    bp = _hash_bp_sql(id_col, salt, 10_000)
    keep_bp = _TEMP_KEEP_BP.format(
        tf=f"(cast({target_frac_bp} as double) / 1.0e4)", a=_sql_dbl(alpha)
    )
    return f"""
with sizes as (
  select {domain_col} as domain, count(*) as n_d from ({source_sql}) group by 1
),
totals as (
  select sum(n_d) as total,
         sum(power(cast(n_d as double), {_sql_dbl(alpha)})) as sum_pow
  from sizes
),
rates as (select domain, {keep_bp} as keep_bp from sizes, totals)
select {id_col}, domain, mix_bp, keep_bp
from (
  select {id_col}, {domain_col} as domain, {bp} as mix_bp from ({source_sql})
) join rates using (domain)
where mix_bp < keep_bp
"""


def per_group_cap(
    df: DataFrame,
    group_col: str,
    order_col: str,
    k: int,
) -> DataFrame:
    """Keep at most ``k`` rows per group, chosen by the smallest
    ``order_col`` (a total (order, group) order — deterministic under any
    ties in practice because order_col is an id).  The generic cap behind
    cluster-balanced sampling (≤k documents per semantic/near-dup cluster,
    DataComp-style) and per-domain document caps.  One shuffle on the
    group key; rank is a single streaming window pass per group."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy(group_col).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("grp_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("grp_rank") <= k)
    )


def per_group_cap_sql(source_sql: str, group_col: str, order_col: str, k: int) -> str:
    return f"""
select *, cast(row_number() over (
  partition by {group_col} order by {order_col} asc
) as bigint) as grp_rank
from ({source_sql})
qualify grp_rank <= {k}
"""


# ---------------------------------------------------------------------------
# Mixture report: the planning table a mixture sampler consumes
# ---------------------------------------------------------------------------


def mixture_report(
    df: DataFrame,
    group_cols: Sequence[str] = ("lang", "source"),
    text_col: str = "text",
) -> DataFrame:
    """Per-group corpus composition: ``(group_cols…, n_docs, n_tokens,
    token_share_bp, cum_share_bp, token_rank)`` — the table you read
    before deciding mixture weights (what share of the training mix is
    each (language, domain) cell, and how concentrated is the corpus).

    Exact integers throughout: shares in basis points via integer
    division (``div``, truncating in BOTH engines), cumulative share by
    an integer running sum over the deterministic (n_tokens desc,
    group_cols asc) total order.

    Scale shape: one map-side-combined groupBy over (group_cols) — token
    counts reduce before the shuffle; the windowed cumulative runs over
    the AGGREGATED table (rows = distinct groups, thousands at most), so
    the single-partition window is deliberate and cheap."""
    gcols = [F.col(c) for c in group_cols]
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
    agg = df.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks).alias("n_tokens"),
    )
    total = agg.agg(F.sum("n_tokens").alias("_total"))
    order = [F.col("n_tokens").desc()] + [F.col(c).asc() for c in group_cols]
    w = Window.orderBy(*order)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        agg.crossJoin(F.broadcast(total))
        .withColumn(
            "token_share_bp", F.expr("n_tokens * 10000 div _total")
        )
        .withColumn("_cum", F.sum("n_tokens").over(wsum))
        .withColumn("cum_share_bp", F.expr("_cum * 10000 div _total"))
        .withColumn("token_rank", F.row_number().over(w).cast("long"))
        .select(
            *group_cols,
            "n_docs",
            "n_tokens",
            "token_share_bp",
            "cum_share_bp",
            "token_rank",
        )
    )


def mixture_report_sql(
    source_sql: str,
    group_cols: Sequence[str] = ("lang", "source"),
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`mixture_report`."""
    gl = ", ".join(group_cols)
    order = "n_tokens desc, " + ", ".join(f"{c} asc" for c in group_cols)
    return f"""
with agg as (
  select {gl}, count(*) as n_docs,
         sum(len(string_split_regex(trim({text_col}), '\\s+'))) as n_tokens
  from ({source_sql})
  group by {gl}
),
tot as (select sum(n_tokens) as _total from agg)
select {gl},
  cast(n_docs as bigint) as n_docs,
  cast(n_tokens as bigint) as n_tokens,
  cast(n_tokens * 10000 // _total as bigint) as token_share_bp,
  cast(sum(n_tokens) over (order by {order}
       rows between unbounded preceding and current row)
       * 10000 // _total as bigint) as cum_share_bp,
  cast(row_number() over (order by {order}) as bigint) as token_rank
from agg, tot
"""


# ---------------------------------------------------------------------------
# Deterministic global training order (epoch shuffle)
# ---------------------------------------------------------------------------


def training_order(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "epoch-0",
    shards: int = 32,
) -> DataFrame:
    """Assign every row a GLOBAL pseudo-random permutation index —
    ``(id, shard, shuffle_rank)`` with shuffle_rank a 0-based dense
    enumeration of the md5(seed|id) order — the epoch-shuffle step that
    fixes a training data order reproducibly (new seed → new
    permutation, no RNG state anywhere).

    Scale shape (the part worth copying): a naive global
    ``row_number() over (order by key)`` collapses onto ONE partition.
    Instead the key's 32-bit prefix RANGE-partitions rows into
    ``shards`` (prefix ranges preserve the lexicographic key order), the
    rank is computed per shard, and tiny per-shard counts (``shards``
    rows, broadcast) convert local ranks to global ones:
    global = offset(shard) + local − 1.  One shuffle on the shard key,
    never a single-partition sort — the DuckDB twin computes the naive
    global row_number and the driver gate proves the decomposition
    equal."""
    key = F.md5(
        F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string"))
    )
    pv = F.conv(F.substring(key, 1, 8), 16, 10).cast("long")
    # prefix-RANGE sharding (not modulo): shard boundaries respect the
    # lexicographic key order, so per-shard ranks concatenate into the
    # global order.  Exact integer arithmetic: pv*shards < 2^37, and the
    # divisor is a power of two — `div` matches DuckDB's `//`.
    with_key = df.select(
        F.col(id_col),
        key.alias("_key"),
        (pv * shards - (pv * shards) % 4294967296)
        .cast("long")
        .alias("_num"),
    ).withColumn("shard", (F.col("_num") / 4294967296).cast("long"))
    w = Window.partitionBy("shard").orderBy("_key", id_col)
    local = with_key.withColumn("_local", F.row_number().over(w))
    counts = (
        local.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_cnt").over(
                    Window.orderBy("shard").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("shard", "_offset")
    )
    return (
        local.join(F.broadcast(counts), "shard")
        .select(
            id_col,
            F.col("shard").cast("long").alias("shard"),
            (F.col("_offset") + F.col("_local") - 1)
            .cast("long")
            .alias("shuffle_rank"),
        )
    )


def training_order_sql(
    source_sql: str,
    id_col: str = "doc_id",
    seed: str = "epoch-0",
    shards: int = 32,
) -> str:
    """DuckDB twin of :func:`training_order` — the NAIVE global
    row_number over the same key order (single-node has no partition
    problem), which is exactly what the decomposed engine plan must
    reproduce."""
    key = (
        f"md5('{seed}' || '|' || cast({id_col} as varchar))"
    )
    pv = (
        f"cast(concat('0x', substring({key}, 1, 8)) as bigint)"
    )
    return f"""
select {id_col},
       cast({pv} * {shards} // 4294967296 as bigint) as shard,
       cast(row_number() over (order by {key}, {id_col}) - 1 as bigint)
         as shuffle_rank
from ({source_sql})
"""


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 4096,
    buckets: int = 64,
    salt: str = "shard",
) -> DataFrame:
    """Materialize the packed-sequence MANIFEST: one row per
    (bucket, shard) with the ordered document ids, their token counts,
    the packed total, and the fill ratio in basis points — what the
    training loader actually consumes (which documents concatenate into
    each context window, in which order), where
    :func:`shard_by_token_budget` only labels rows.

    ``fill_bp`` may exceed 10000: an oversized single document owns its
    shard (the packing contract) and overflows the budget by design.

    Scale shape: inherits the bucketed packing's parallelism; the
    manifest aggregation is one groupBy on (bucket, shard) whose group
    size is ~budget/avg_doc_tokens rows — bounded by construction."""
    sharded = shard_by_token_budget(
        df, id_col, tokens_col, budget, buckets, salt
    )
    packed = sharded.groupBy("bucket", "shard").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(id_col, "n_tokens"))),
            lambda s: s[id_col],
        ).alias("doc_ids"),
        F.transform(
            F.array_sort(F.collect_list(F.struct(id_col, "n_tokens"))),
            lambda s: s["n_tokens"],
        ).alias("token_counts"),
        F.sum("n_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return packed.select(
        "bucket",
        "shard",
        "doc_ids",
        "token_counts",
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.expr(f"total_tokens * 10000 div {budget}").alias("fill_bp"),
    )


def pack_sequences_sql(
    source_sql: str,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 4096,
    buckets: int = 64,
    salt: str = "shard",
) -> str:
    """DuckDB twin of :func:`pack_sequences`."""
    inner = shard_by_token_budget_sql(
        source_sql, id_col, tokens_col, budget, buckets, salt
    )
    return f"""
with sharded as ({inner})
select bucket, shard,
       list({id_col} order by {id_col}) as doc_ids,
       list(n_tokens order by {id_col}) as token_counts,
       cast(sum(n_tokens) as bigint) as total_tokens,
       cast(count(*) as bigint) as n_docs,
       cast(sum(n_tokens) * 10000 // {budget} as bigint) as fill_bp
from sharded
group by bucket, shard
"""
