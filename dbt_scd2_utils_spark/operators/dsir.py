"""DSIR-style data selection: importance resampling over hashed n-gram
features (Xie et al., "Data Selection for Language Models via Importance
Resampling", NeurIPS 2023 — public method, no reference-repo analogue;
this is part of the beyond-reference LLM-pipeline surface).

Given a RAW corpus and a (much smaller) TARGET corpus that exemplifies
the desired distribution, score every raw document by the log importance
ratio of two bag-of-hashed-ngram language models,

    log w(x) = Σ_{g ∈ grams(x)}  ln p̂_target(h(g)) − ln p̂_raw(h(g)),

then resample without replacement via deterministic Gumbel top-k over
``log w``.  Hashing n-grams into a FIXED number of buckets is the trick
that makes the method corpus-size-free: both "models" are one
``buckets``-row table regardless of scale.

Exactness discipline (same as operators/search.py BM25/LM): every
per-bucket log-ratio is quantized to integer micros BEFORE any
aggregation, all fractional literals are exponent-form DOUBLEs so the
expression trees are IEEE-identical in Spark and DuckDB, and the hash is
the first-8-md5-hex integer used by every other cross-engine sampler in
this package (operators/sampling.py::_hash_bp).

Scale shape (the 100 TB argument):

* features: one explode → ``groupBy(doc, bucket)`` with map-side
  combine; rows ∝ documents × distinct-buckets-per-doc (bounded by
  ``buckets``), never positions.
* models: re-aggregate THAT table — one shuffle each on a key with at
  most ``buckets`` distinct values, partials absorb all skew.
* the ratio table is ≤ ``buckets`` rows (a constant hyperparameter) —
  broadcast unconditionally; the scoring join never shuffles the corpus.
* resample: global top-k via sort-limit (TakeOrderedAndProject — a
  per-partition heap + driver merge of k·partitions rows, no full sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.caching import barrier as _barrier
from ..functions.partitioning import parallelize_narrow
from .search import _DUCK_TOKENS, _SPARK_TOKENS, _dbl

__all__ = [
    "dsir_logratio",
    "dsir_logratio_sql",
    "dsir_ratio",
    "dsir_resample",
    "dsir_resample_sql",
    "dsir_score",
]

_SALT = "dsir"

# Per-bucket log importance ratio, micro-quantized once (add-alpha
# smoothing on both models; tc/qc/t_tot/q_tot are exact integers).
_DELTA = (
    "cast(round(1.0e6 * ("
    "ln((tc + {a}) / (t_tot + {a} * {B})) - "
    "ln((qc + {a}) / (q_tot + {a} * {B}))"
    ")) as bigint)"
)

# Deterministic Gumbel noise from the package's hashed-uniform grain:
# u = (bp + 0.5) / 10000 ∈ (0, 1), g = -ln(-ln u), micro-quantized.
_GUMBEL = (
    "cast(round(1.0e6 * (-ln(-ln((gbp + 0.5e0) / 1.0e4)))) as bigint)"
)


def _grams_expr(text_col: str) -> str:
    """Spark SQL array of unigrams + space-joined bigrams (empty tokens
    dropped before gram formation; mirrors :func:`_grams_sql`)."""
    tok = _SPARK_TOKENS.format(col=text_col)
    f = f"filter({tok}, t -> t <> '')"
    return (
        f"concat({f}, case when size({f}) >= 2 then "
        f"zip_with(slice({f}, 1, size({f}) - 1), "
        f"slice({f}, 2, size({f}) - 1), "
        f"(a, b) -> concat(a, ' ', b)) else array() end)"
    )


def _grams_sql(text_col: str) -> str:
    tok = _DUCK_TOKENS.format(col=text_col)
    f = f"list_filter({tok}, t -> t <> '')"
    return (
        f"list_concat({f}, case when len({f}) >= 2 then "
        f"list_transform(range(1, len({f})), "
        f"i -> {f}[i] || ' ' || {f}[i + 1]) else [] end)"
    )


def _bucket(col: str, buckets: int) -> Column:
    h = F.md5(F.concat_ws("|", F.lit(_SALT), F.col(col)))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets)


def _bucket_sql(col: str, buckets: int) -> str:
    return (
        f"cast(concat('0x', substring(md5('{_SALT}' || '|' || {col}), 1, 8)) "
        f"as bigint) % {buckets}"
    )


def _features(
    df: DataFrame, id_col: str, text_col: str, buckets: int
) -> DataFrame:
    """(doc_id, b, tf): per-document hashed-ngram bucket counts."""
    src = parallelize_narrow(df)
    return (
        src.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.expr(_grams_expr(text_col))).alias("g"),
        )
        .select("doc_id", _bucket("g", buckets).alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def dsir_logratio(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-raw-document DSIR importance score.

    Returns one row per raw document: ``(doc_id, n_grams,
    logratio_micro)`` where ``logratio_micro`` = Σ grams
    round_micro(ln p̂_target − ln p̂_raw) — exact integers, positive for
    documents that look like the target distribution.  Documents with no
    grams score (0, 0).
    """
    # The raw feature table feeds BOTH the raw model counts and the
    # scoring join — persist so the explode+combine pass runs once.
    raw_feat = _barrier(_features(raw, id_col, text_col, buckets))
    tgt_cnt = (
        _features(target, id_col, text_col, buckets)
        .groupBy("b")
        .agg(F.sum("tf").alias("tc"))
    )
    raw_cnt = raw_feat.groupBy("b").agg(F.sum("tf").alias("qc"))
    ratio = _ratio_table(raw_cnt, tgt_cnt, buckets, alpha)
    return _score_features(raw, raw_feat, ratio, id_col)


def _ratio_table(
    raw_cnt: DataFrame, tgt_cnt: DataFrame, buckets: int, alpha: float
) -> DataFrame:
    """(b, delta_micro) from (b, qc) raw counts and (b, tc) target counts.
    Every scored bucket occurs in raw (qc >= 1); absent target buckets
    smooth to alpha.  <= `buckets` rows — broadcast is unconditionally
    safe (constant-size hyperparameter, not corpus)."""
    tgt_tot = tgt_cnt.agg(F.coalesce(F.sum("tc"), F.lit(0)).alias("t_tot"))
    raw_tot = raw_cnt.agg(F.coalesce(F.sum("qc"), F.lit(0)).alias("q_tot"))
    delta = _DELTA.format(a=_dbl(alpha), B=buckets)
    return (
        raw_cnt.join(tgt_cnt, "b", "left")
        .withColumn("tc", F.coalesce("tc", F.lit(0)))
        .crossJoin(F.broadcast(tgt_tot))
        .crossJoin(F.broadcast(raw_tot))
        .select("b", F.expr(delta).alias("delta_micro"))
    )


def _score_features(
    docs: DataFrame, feat: DataFrame, ratio: DataFrame, id_col: str
) -> DataFrame:
    scored = (
        feat.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_grams"),
            F.sum(F.col("tf") * F.col("delta_micro")).alias("logratio_micro"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("logratio_micro", F.lit(0))
            .cast("long")
            .alias("logratio_micro"),
        )
    )


def dsir_ratio(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    alpha: float = 0.5,
) -> DataFrame:
    """The BUILD step split out for build-once/score-many deployments
    (streaming gates, cross-corpus scoring): train the two hashed-ngram
    LMs on (raw, target) once and return the ≤ ``buckets``-row
    ``(b, delta_micro)`` scoring table.  ``dsir_score(raw, ratio)`` is
    provably identical to ``dsir_logratio(raw, target)`` (pinned by
    test) — the ratio table is the whole model state, so persisting it
    is the streaming twin of save_codebooks/save_bm25_index."""
    raw_cnt = (
        _features(raw, id_col, text_col, buckets)
        .groupBy("b")
        .agg(F.sum("tf").alias("qc"))
    )
    tgt_cnt = (
        _features(target, id_col, text_col, buckets)
        .groupBy("b")
        .agg(F.sum("tf").alias("tc"))
    )
    # Carry the trained modulus with the model state: scoring with a
    # DIFFERENT buckets value would hash grams into buckets the table
    # never saw (silently dropped by the inner join) and join the rest
    # against deltas computed under another modulus — numerically wrong
    # with no error.  dsir_score reads/validates this.  The value rides
    # in the column's schema METADATA (driver-side, zero jobs to read,
    # survives a 0-row table); the column itself keeps the value visible
    # in persisted copies.
    return _ratio_table(raw_cnt, tgt_cnt, buckets, alpha).withColumn(
        "_buckets",
        F.lit(buckets).alias("_buckets", metadata={"trained_buckets": buckets}),
    )


def dsir_score(
    docs: DataFrame,
    ratio: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int | None = None,
) -> DataFrame:
    """Score ``docs`` against a FIXED :func:`dsir_ratio` table — per-row
    narrow work (explode grams → bucket → broadcast-join the ratio →
    per-doc sum), so scoring is batch-boundary-invariant: a drained
    stream of micro-batches equals one batch call exactly.  Grams whose
    bucket is absent from the trained table contribute nothing (can only
    happen when ``docs`` extends beyond the training raw corpus —
    with a real corpus every bucket is populated).

    ``buckets`` defaults to the modulus recorded in the ratio table's
    ``_buckets`` column (written by :func:`dsir_ratio`); passing an
    explicit value that contradicts it raises instead of silently
    hashing grams under the wrong modulus.  A hand-built table without
    the column requires an explicit ``buckets``."""
    trained = None
    if "_buckets" in ratio.columns:
        # Schema metadata first (no Spark job); fall back to reading a
        # row only for hand-built tables that attached the column
        # without metadata.
        md = ratio.schema["_buckets"].metadata or {}
        trained = md.get("trained_buckets")
        if trained is None:
            row = ratio.select("_buckets").first()
            trained = row[0] if row else None
        ratio = ratio.drop("_buckets")
    if trained is not None and buckets is not None and buckets != trained:
        raise ValueError(
            f"dsir_score(buckets={buckets}) contradicts the ratio table's "
            f"trained modulus (_buckets={trained})"
        )
    buckets = trained if trained is not None else buckets
    if buckets is None:
        raise ValueError(
            "dsir_score needs the trained modulus: pass buckets= or use a "
            "ratio table built by dsir_ratio (which records _buckets)"
        )
    feat = _features(docs, id_col, text_col, buckets)
    return _score_features(docs, feat, ratio, id_col)


def dsir_logratio_sql(
    raw_sql: str,
    target_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    alpha: float = 0.5,
) -> str:
    """DuckDB twin of :func:`dsir_logratio` (identical micro rounding)."""
    delta = _DELTA.format(a=_dbl(alpha), B=buckets)
    b = _bucket_sql("g", buckets)

    def feats(src: str) -> str:
        return f"""
  select doc_id, {b} as b, count(*) as tf from (
    select {id_col} as doc_id, unnest({_grams_sql(text_col)}) as g
    from ({src})
  ) group by 1, 2
"""

    return f"""
with raw_feat as ({feats(raw_sql)}),
tgt_feat as ({feats(target_sql)}),
tgt_cnt as (select b, sum(tf) as tc from tgt_feat group by 1),
raw_cnt as (select b, sum(tf) as qc from raw_feat group by 1),
tgt_tot as (select coalesce(sum(tc), 0) as t_tot from tgt_cnt),
raw_tot as (select coalesce(sum(qc), 0) as q_tot from raw_cnt),
ratio as (
  select r.b, {delta} as delta_micro
  from (select b, qc, coalesce(tc, 0) as tc
        from raw_cnt left join tgt_cnt using (b)) r, tgt_tot, raw_tot
),
scored as (
  select doc_id, sum(tf) as n_grams,
         sum(tf * delta_micro) as logratio_micro
  from raw_feat join ratio using (b) group by 1
)
select d.doc_id,
       cast(coalesce(s.n_grams, 0) as bigint) as n_grams,
       cast(coalesce(s.logratio_micro, 0) as bigint) as logratio_micro
from (select {id_col} as doc_id from ({raw_sql})) d
left join scored s using (doc_id)
"""


def dsir_resample(
    scored: DataFrame,
    k: int,
    id_col: str = "doc_id",
    score_col: str = "logratio_micro",
    salt: str = "dsir-resample",
) -> DataFrame:
    """Gumbel top-``k`` resampling without replacement: keep the ``k``
    documents maximizing ``score + Gumbel(hash(id))`` — the exact
    without-replacement sampler DSIR prescribes, made deterministic by
    drawing the uniform from the package's hashed-id grain (stable under
    corpus growth, engine-exact).  Returns (rank, doc_id, score, key).
    """
    from .sampling import _hash_bp

    key = (
        F.col(score_col).cast("long")
        + F.expr(_GUMBEL)
    ).alias("key_micro")
    top = (
        scored.select(
            F.col(id_col).alias("doc_id"),
            F.col(score_col).cast("long").alias(score_col),
            _hash_bp(id_col, salt, 10_000).alias("gbp"),
        )
        .select("doc_id", score_col, key)
        # sort-limit → TakeOrderedAndProject: per-partition heap, no
        # global sort; ties broken by id for a total order.
        .orderBy(F.col("key_micro").desc(), F.col("doc_id").asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("key_micro").desc(), F.col("doc_id").asc())
    # row_number over k rows only (post-limit) — not a corpus-wide window.
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id",
        score_col,
        "key_micro",
    )


def dsir_resample_sql(
    scored_sql: str,
    k: int,
    id_col: str = "doc_id",
    score_col: str = "logratio_micro",
    salt: str = "dsir-resample",
) -> str:
    """DuckDB twin of :func:`dsir_resample`."""
    from .sampling import _hash_bp_sql

    gbp = _hash_bp_sql(id_col, salt, 10_000)
    return f"""
with keyed as (
  select {id_col} as doc_id,
         cast({score_col} as bigint) as {score_col},
         cast({score_col} as bigint) + {_GUMBEL.replace('gbp', f'({gbp})')}
           as key_micro
  from ({scored_sql})
)
select cast(row_number() over (order by key_micro desc, doc_id asc) as bigint)
         as rank,
       doc_id, {score_col}, key_micro
from keyed
order by key_micro desc, doc_id asc
limit {k}
"""

def save_dsir_ratio(ratio: DataFrame, path: str) -> None:
    """Persist a :func:`dsir_ratio` scoring table as parquet — the DSIR
    build-once artifact's externalization, completing the family symmetry
    with ``similarity.save_codebooks`` / ``search.save_bm25_index``:
    ≤ ``buckets`` rows (a few KB regardless of corpus size), broadcast at
    score time.  The trained modulus travels in the ``_buckets`` column
    AND its schema metadata; Spark round-trips column metadata through the
    parquet footer, and :func:`load_dsir_ratio` re-attaches it from the
    column value as a belt-and-braces guard, so a loaded table validates
    the modulus exactly like an in-session one (``dsir_score`` refuses a
    contradicting ``buckets=``).  No append/refresh gate by design: the
    model is rebuilt-once (two tiny groupBys over (raw, target)), unlike
    the index families whose corpus side grows."""
    cols = ["b", "delta_micro"] + (
        ["_buckets"] if "_buckets" in ratio.columns else []
    )
    ratio.select(*cols).coalesce(1).write.mode("overwrite").parquet(path)


def load_dsir_ratio(spark, path: str) -> DataFrame:
    """Load a :func:`save_dsir_ratio` artifact for :func:`dsir_score` /
    streaming gates.  If the parquet round-trip lost the ``_buckets``
    schema metadata (e.g. the file was rewritten by another engine), it is
    restored from the column's value with one bounded read of a ≤4096-row
    table, so downstream scoring never silently guesses the modulus."""
    df = spark.read.parquet(path)
    if "_buckets" not in df.columns:
        return df
    md = df.schema["_buckets"].metadata or {}
    if md.get("trained_buckets") is None:
        row = df.select("_buckets").first()
        if row is not None:
            df = df.withColumn(
                "_buckets",
                F.lit(int(row[0])).alias(
                    "_buckets", metadata={"trained_buckets": int(row[0])}
                ),
            )
    return df
