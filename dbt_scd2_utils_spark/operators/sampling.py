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
