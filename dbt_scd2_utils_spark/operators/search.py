"""Keyword search and statistical language-model scoring over a document
corpus — the retrieval half of a training-data curation stack (find
eval-set leaks by keyword, rank documents for a topic mix, CCNet-style
LM-quality gating).

Engine extension beyond the reference surface (the reference is an SCD
compiler; these operators serve the same ``documents`` corpus the dedup /
decontamination family curates).  Both operators follow the repo-wide
cross-engine exactness rule: every floating-point SCORE is quantized to
integer micro-units PER TERM before any aggregation, so sums are
order-independent integer arithmetic and the DuckDB oracle twin matches
hash-for-hash (same trick as text.py's basis points; see
``text_stats``).  The only cross-engine float risk left is a <=1-ulp
``ln`` difference landing exactly on a .5 micro boundary — measure-zero
in practice.

Scale design (100 TB corpus):
- tokenize → one (doc, term) explode; tf/df/dl all derive from ONE
  map-side-combined groupBy of that explode (no second corpus pass).
- corpus scalars (N docs, total token count, vocabulary size) ride a
  broadcast 1-row cross join — never a driver collect.
- the query side of BM25 is broadcast (queries ≪ corpus); candidate rows
  per query = Σ df(term) over its terms, bounded by ``max_df_frac``
  stopword pruning (a term in more than that fraction of documents
  scores ~0 anyway — its idf → ln(1+ε) — but its posting list is the
  entire corpus: pruning it is the difference between top-k in seconds
  and a full-corpus join).
- per-query top-k is one row_number window over a total order
  (score desc, doc_id asc) — deterministic under ties (duplicate
  documents score exactly equal and tiebreak by id in both engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.caching import barrier as _barrier
from ..functions.partitioning import parallelize_narrow

# Same whitespace tokenization as operators/text.py (TOKEN_SPLIT), plus
# case folding: keyword retrieval is conventionally case-insensitive.
_SPARK_TOKENS = "split(lower(trim({col})), '\\\\s+')"
_DUCK_TOKENS = "string_split_regex(lower(trim({col})), '\\s+')"

# Salt fan-out for the static-pruning top-K (phase 1 of the two-phase
# window in _bm25_from_tf): bounds any single sort task at ~df/32 rows.
_PRUNE_SALTS = 32


def _search_tokens(col: str) -> Column:
    return F.split(F.lower(F.trim(F.col(col))), r"\s+")


# BM25 (Okapi, Robertson idf with the +1 floor so idf is always positive):
#   idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
#   tfn     = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl * N / total_len))
# dl/avgdl is expressed as dl * N / total_len so every input is an exact
# integer and the double expression tree is IDENTICAL in both engines.
# Every fractional literal is exponent-form (1.0e0): a bare `0.5` types as
# DECIMAL in BOTH engines, and their DECIMAL division-scale rules differ —
# measured ~1e-8 relative divergence, enough to flip ~2% of micro
# roundings.  Exponent literals are DOUBLE everywhere, so the whole tree
# is IEEE arithmetic.
_CONTRIB = (
    "cast(round(1.0e6 * "
    "ln(1.0e0 + (({N} - df + 0.5e0) / (df + 0.5e0))) * "
    "(tf * ({k1} + 1.0e0)) / "
    "(tf + {k1} * (1.0e0 - {b} + {b} * dl * {N} / {total_len}))"
    ") as bigint)"
)


def _dbl(x: float) -> str:
    """Render a Python float as a DOUBLE-typed SQL literal (see _CONTRIB)."""
    return f"cast({float(x)!r} as double)"


def bm25_index(
    docs: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_frac: float | None = 0.5,
    max_postings_per_term: int | None = None,
) -> DataFrame:
    """The BM25 inverted index: one row per (term, doc) posting carrying
    the precomputed query-independent impact ``contrib_micro`` =
    round(idf·tfn·1e6).  Build once, persist/save, probe many times via
    ``bm25_topk(index=...)`` — at corpus scale this is the postings
    table you would materialize anyway, and the probe never re-reads
    the raw text.  ``max_postings_per_term`` applies WAND-style static
    pruning at BUILD time (see :func:`bm25_topk`)."""
    # persist: tf is the inverted index every downstream piece reads (dl,
    # df, corpus scalars, the postings join) — without the barrier the
    # tokenize+combine pass re-runs four times.
    tf = _barrier(_bm25_tf(docs, id_col, text_col))
    return _bm25_from_tf(tf, k1, b, max_df_frac, max_postings_per_term)


def _bm25_tf(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The tokenize pass: (doc_id, term, tf) — the only stage that reads
    raw text, and the only per-row state the index needs (everything
    else re-derives from it by aggregation)."""
    return (
        parallelize_narrow(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(_search_tokens(text_col)).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _bm25_from_tf(
    tf: DataFrame,
    k1: float,
    b: float,
    max_df_frac: float | None,
    max_postings_per_term: int | None,
    attach_impact: bool = True,
) -> DataFrame:
    """Derive dl/df/corpus scalars and the per-posting impact from a tf
    table — aggregations over postings only, no text access.
    ``attach_impact=False`` leaves the raw statistic columns in place
    (the one-shot probe path computes the impact AFTER the query-term
    join so only matched postings pay for it); static pruning requires
    the impact and forces it on."""
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scalars = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_len")
    )

    postings = (
        tf.join(dl, "doc_id")
        .join(dft, "term")
        .crossJoin(F.broadcast(scalars))
    )
    if max_df_frac is not None:
        postings = postings.filter(
            F.expr(f"cast(df as double) <= {_dbl(max_df_frac)} * n_docs")
        )

    # the impact is query-INDEPENDENT, so it attaches to the index, not
    # the probe — this is also what static pruning truncates on
    if not attach_impact and max_postings_per_term is None:
        return postings
    contrib = _CONTRIB.format(
        N="n_docs", total_len="total_len", k1=_dbl(k1), b=_dbl(b)
    )
    postings = postings.withColumn("contrib_micro", F.expr(contrib))
    if max_postings_per_term is not None:
        # Two-phase SALTED top-K: a plain row_number window partitioned
        # by term sorts each hot term's whole posting list in ONE task —
        # Zipf head terms (df ∝ n) serialize the build at corpus scale
        # (measured: the s10 scale-proof hybrid_index_build spent its
        # 2nd-decade superlinearity here).  Phase 1 ranks within
        # (term, salt) — 32-way balanced — and keeps each salt's top-K;
        # phase 2 ranks the ≤ 32·K survivors per term.  EXACT: the
        # per-term order (contrib desc, doc_id asc) is total, so any
        # global-top-K row is also top-K within its salt group; phase 2
        # then sees every row that could outrank it (pinned equal to the
        # single-window plan by test).
        salt = F.pmod(F.xxhash64("doc_id"), F.lit(_PRUNE_SALTS))
        order = (F.col("contrib_micro").desc(), F.col("doc_id").asc())
        w1 = Window.partitionBy("term", "_salt").orderBy(*order)
        w2 = Window.partitionBy("term").orderBy(*order)
        postings = (
            postings.withColumn("_salt", salt)
            .withColumn("_imp_rank", F.row_number().over(w1))
            .filter(F.col("_imp_rank") <= max_postings_per_term)
            .withColumn("_imp_rank", F.row_number().over(w2))
            .filter(F.col("_imp_rank") <= max_postings_per_term)
            .drop("_imp_rank", "_salt")
        )
    return postings


def bm25_index_append(
    index: DataFrame,
    new_docs: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_frac: float | None = None,
    max_postings_per_term: int | None = None,
) -> DataFrame:
    """Incremental index maintenance: tokenize ONLY the appended
    documents, union their (doc, term, tf) rows with the stored index's,
    and re-derive df/dl/scalars/impacts by aggregation — exactly equal
    to rebuilding from old ∪ new (pinned by test), at the cost of one
    pass over the NEW text plus postings-table aggregations.  At 100 TB
    the tokenize pass is the dominant build cost, so a 0.1% daily append
    costs ~0.1% of a rebuild's text scan (BM25 stats are corpus-global:
    impacts must re-derive — but from postings, never from text).

    The supplied ``index`` must be UNPRUNED — built with
    ``max_df_frac=None`` AND ``max_postings_per_term=None`` (the
    maintained copy keeps every tf row; prune when deriving the PROBE
    copy from it): any pruning has lost tf rows, which would silently
    skew dl/total_len/df after append.  For the same reason this
    function's OWN defaults are unpruned (unlike :func:`bm25_index`) —
    its default result is itself a valid maintained copy, so chained
    all-defaults appends stay exact."""
    old_tf = index.select("doc_id", "term", "tf")
    new_tf = _bm25_tf(new_docs, id_col, text_col)
    merged = _barrier(old_tf.unionByName(new_tf))
    return _bm25_from_tf(merged, k1, b, max_df_frac, max_postings_per_term)


# term_bucket count is a constant of the on-disk format: probe and save
# must derive the same bucket for a term without any side-channel state
_BM25_INDEX_BUCKETS = 256


def save_bm25_index(index: DataFrame, path: str) -> None:
    """Persist a :func:`bm25_index` as parquet partitioned by a
    term-hash bucket (NOT by raw term — a Heaps-scale vocabulary would
    explode into millions of tiny directories).  A probe that joins on
    (term_bucket, term) lets dynamic partition pruning read only the
    buckets the query's terms hash into — at 100 TB the probe touches
    O(query terms) buckets of the postings, never the whole index."""
    (
        index.withColumn(
            "term_bucket",
            F.pmod(F.xxhash64("term"), F.lit(_BM25_INDEX_BUCKETS)),
        )
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(path)
    )


def load_bm25_index(spark, path: str) -> DataFrame:
    """Read a :func:`save_bm25_index` back for ``bm25_topk(index=)``.
    The bucket column rides along; the probe join keys on it so the
    scan prunes to the query terms' buckets."""
    return spark.read.parquet(path)


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_col: str = "query_text",
    max_df_frac: float | None = 0.5,
    max_postings_per_term: int | None = None,
    index: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` documents per query under BM25, scored in integer micros.

    Returns (query_id, rank, doc_id, score_micro): ``score_micro`` is the
    sum over the query's matched terms of round(idf·tfn · 1e6) — exact
    integers, so the DuckDB twin (:func:`bm25_topk_sql`) is
    value-identical.  ``max_df_frac`` drops terms present in more than
    that fraction of documents (stopword pruning; see module docstring) —
    pass None to rank with every term.

    ``max_postings_per_term`` enables WAND-style STATIC index pruning
    (Carmel et al., SIGIR'01): each term's posting list is truncated to
    its top-N entries by the query-independent impact round(idf·tfn·1e6)
    — per-query scoring work becomes O(terms · N) instead of O(terms ·
    df), which is what holds a Zipfian corpus's common-term posting
    lists (df ∝ corpus size) off the probe's critical path at 100 TB.
    Approximate by design (a document can miss the final top-k only if
    it ranks below N on EVERY query term); default None = exact.

    ``index``: a prebuilt :func:`bm25_index` result — the deployment
    shape: build + persist the postings once, probe many times without
    re-tokenizing the corpus (build parameters travel with the index;
    the scoring ones here are ignored when it is supplied).
    """
    if index is not None:
        postings = index
    else:
        # one-shot path: defer the impact expression past the query-term
        # join (only matched postings evaluate it); pruning needs the
        # impact at build time and forces it on
        postings = _bm25_from_tf(
            _barrier(_bm25_tf(docs, id_col, text_col)),
            k1,
            b,
            max_df_frac,
            max_postings_per_term,
            attach_impact=max_postings_per_term is not None,
        )

    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(_search_tokens(query_col)).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )

    # a loaded on-disk index carries term_bucket as its partition column:
    # joining on it too lets dynamic partition pruning skip every bucket
    # no query term hashes into
    join_keys = ["term"]
    if "term_bucket" in postings.columns:
        qterms = qterms.withColumn(
            "term_bucket",
            F.pmod(F.xxhash64("term"), F.lit(_BM25_INDEX_BUCKETS)),
        )
        join_keys = ["term_bucket", "term"]

    joined = postings.join(F.broadcast(qterms), join_keys)
    if "contrib_micro" not in postings.columns:
        contrib = _CONTRIB.format(
            N="n_docs", total_len="total_len", k1=_dbl(k1), b=_dbl(b)
        )
        joined = joined.withColumn("contrib_micro", F.expr(contrib))
    scored = (
        joined.groupBy("query_id", "doc_id")
        .agg(F.sum("contrib_micro").alias("score_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score_micro")
    )


def bm25_topk_sql(
    docs_sql: str,
    queries_sql: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_col: str = "query_text",
    max_df_frac: float | None = 0.5,
    max_postings_per_term: int | None = None,
) -> str:
    """DuckDB twin of :func:`bm25_topk` (identical expression tree,
    including the static-pruning truncation when enabled)."""
    dtoks = _DUCK_TOKENS.format(col=text_col)
    qtoks = _DUCK_TOKENS.format(col=query_col)
    df_filter = (
        f"where cast(df as double) <= {_dbl(max_df_frac)} * n_docs"
        if max_df_frac is not None
        else ""
    )
    contrib = _CONTRIB.format(
        N="n_docs", total_len="total_len", k1=_dbl(k1), b=_dbl(b)
    )
    prune = (
        f"""qualify row_number() over (
    partition by term order by contrib_micro desc, doc_id asc
  ) <= {max_postings_per_term}"""
        if max_postings_per_term is not None
        else ""
    )
    return f"""
with toks as (
  select doc_id, term from (
    select {id_col} as doc_id, unnest({dtoks}) as term from ({docs_sql})
  ) where term <> ''
),
tf as (select doc_id, term, count(*) as tf from toks group by 1, 2),
dl as (select doc_id, sum(tf) as dl from tf group by 1),
dft as (select term, count(*) as df from tf group by 1),
scalars as (select count(*) as n_docs, sum(dl) as total_len from dl),
postings as (
  select *, {contrib} as contrib_micro
  from tf join dl using (doc_id) join dft using (term), scalars
  {df_filter}
  {prune}
),
qterms as (
  select distinct query_id, term from (
    select {query_id_col} as query_id, unnest({qtoks}) as term
    from ({queries_sql})
  ) where term <> ''
),
scored as (
  -- cast: DuckDB sum(BIGINT) is HUGEINT, which pandas floats — the
  -- engine side is int64
  select query_id, doc_id, cast(sum(contrib_micro) as bigint) as score_micro
  from postings join qterms using (term)
  group by 1, 2
)
select query_id,
       cast(row_number() over (
         partition by query_id order by score_micro desc, doc_id asc
       ) as bigint) as rank,
       doc_id, score_micro
from scored
qualify rank <= {k}
"""


# Bigram LM: P(w2 | w1) = (c(w1,w2) + a) / (c(w1·) + a·V), add-a smoothing
# over the corpus's own bigram counts; per-position negative log likelihood
# quantized to micros.  c(w1·) sums bigram counts by prefix (NOT the
# unigram count: the last token of a document has no successor), V = corpus
# vocabulary size, so probabilities sum to 1 over the vocabulary.
_NLL = (
    "cast(round(-1.0e6 * "
    "ln((c2 + {a}) / (c1 + {a} * vocab))"
    ") as bigint)"
)


def ngram_lm_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """CCNet-style LM quality signal: per-document negative log likelihood
    under an add-``alpha`` bigram model trained on the corpus itself
    (boilerplate and in-distribution text scores low, gibberish and
    outlier text high — the standard perplexity-bucket gate, with the
    corpus standing in for the reference LM since external model files
    are out of scope).

    Returns one row per document: (doc_id, n_bigrams,
    nll_micro = Σ positions round(-ln P · 1e6),
    avg_nll_micro = nll_micro / n_bigrams floor-divided) — all exact
    integers.  Documents with fewer than two tokens score (0, 0, 0).

    Scale: one explode → groupBy(doc, w1, w2) with map-side combine;
    corpus bigram and prefix counts re-aggregate THAT result (rows ∝
    distinct bigrams, not positions).  The (w1, w2)-keyed join is
    shuffle-combinable; prefix-key hot spots ("the …") arrive
    pre-aggregated per document, and AQE skew-splitting covers the rest.
    """
    # zip_with over two slices, NOT transform(sequence, i -> ws[i]): an
    # array expression referenced INSIDE an index lambda re-evaluates per
    # element (the regex split ran O(tokens²) per document — measured
    # 9.3 s vs 0.9 s at sf0.1); slices keep the split per-row.
    tok = _SPARK_TOKENS.format(col=text_col)
    pairs = F.expr(
        f"case when size({tok}) >= 2 then "
        f"zip_with(slice({tok}, 1, size({tok}) - 1), "
        f"slice({tok}, 2, size({tok}) - 1), "
        f"(a, b) -> struct(a as w1, b as w2)) "
        f"else array() end"
    )

    src = parallelize_narrow(docs)
    base = src.select(F.col(id_col).alias("doc_id"), F.explode(pairs).alias("p"))
    # persist: the per-document bigram table feeds the corpus counts (c2,
    # and c1 through it) AND the scored join — the explode+combine pass
    # would otherwise run once per consumer.
    doc_bi = _barrier(
        base.select(
            "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
        )
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("tf"))
    )

    c2 = doc_bi.groupBy("w1", "w2").agg(F.sum("tf").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = (
        src.select(F.explode(_search_tokens(text_col)).alias("t"))
        .filter(F.col("t") != "")
        .agg(F.count_distinct("t").alias("vocab"))
    )

    nll = _NLL.format(a=_dbl(alpha))
    # c2/c1 joins stay UN-hinted: at 100 TB the distinct-bigram table can
    # be far too large to broadcast (the join must shuffle on its key),
    # while on small corpora AQE converts both to broadcast at runtime —
    # the adaptive plan is the right one at every scale.
    scored = (
        doc_bi.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn("nll_pos_micro", F.expr(nll))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.sum(F.col("tf") * F.col("nll_pos_micro")).alias("nll_micro"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("nll_micro", F.lit(0)).cast("long").alias("nll_micro"),
            # `div`: exact int64 division (a double round-trip could round
            # across the floor boundary at extreme magnitudes)
            F.coalesce(
                F.expr("nll_micro div n_bigrams"), F.lit(0)
            ).cast("long").alias("avg_nll_micro"),
        )
    )


def ngram_lm_score_sql(
    docs_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> str:
    """DuckDB twin of :func:`ngram_lm_score`."""
    toks = _DUCK_TOKENS.format(col=text_col)
    pairs = (
        f"case when len({toks}) >= 2 then "
        f"list_transform(range(1, len({toks})), "
        f"i -> struct_pack(w1 := {toks}[i], w2 := {toks}[i + 1])) "
        f"else [] end"
    )
    nll = _NLL.format(a=_dbl(alpha))
    return f"""
with base as (
  select doc_id, p.w1 as w1, p.w2 as w2 from (
    select {id_col} as doc_id, unnest({pairs}) as p from ({docs_sql})
  )
),
doc_bi as (select doc_id, w1, w2, count(*) as tf from base group by 1, 2, 3),
c2 as (select w1, w2, sum(tf) as c2 from doc_bi group by 1, 2),
c1 as (select w1, sum(c2) as c1 from c2 group by 1),
vocab as (
  select count(distinct t) as vocab from (
    select unnest({toks}) as t from ({docs_sql})
  ) where t <> ''
),
scored as (
  select doc_id, sum(tf) as n_bigrams,
         sum(tf * {nll}) as nll_micro
  from doc_bi join c2 using (w1, w2) join c1 using (w1), vocab
  group by 1
)
select d.doc_id,
       cast(coalesce(s.n_bigrams, 0) as bigint) as n_bigrams,
       cast(coalesce(s.nll_micro, 0) as bigint) as nll_micro,
       cast(coalesce(s.nll_micro // s.n_bigrams, 0) as bigint) as avg_nll_micro
from (select {id_col} as doc_id from ({docs_sql})) d
left join scored s using (doc_id)
"""


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of ranked lists
# ---------------------------------------------------------------------------


def rrf_fuse(
    ranked_lists: list[DataFrame],
    k: int = 10,
    k0: int = 60,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) of N ranked
    lists: score(q, d) = Σ_lists 1/(k0 + rank), re-ranked top-``k`` per
    query.  The standard way to combine keyword (BM25) and vector (ANN)
    retrieval without score calibration — ranks are comparable across
    retrievers even when raw scores are not.

    Each input must carry (query_id, doc_id, rank) with each (query,
    doc) appearing AT MOST ONCE per list (the output of any top-k
    retriever); a list that repeats a pair would double-count its
    contribution — RRF is defined over rankings, not multisets.
    Per-list contributions are quantized to round(1e6/(k0+rank)) BEFORE
    summation
    (exact integers from exact integer ranks → order-independent sums,
    hash-identical to the DuckDB twin :func:`rrf_fuse_sql`).

    Scale shape: union of top-k lists is tiny next to the corpora that
    produced them (≤ queries × k_list × n_lists rows) — one groupBy on
    (query, doc) with map-side partials, one per-query window.  The
    expensive work stays in the upstream retrievers, which keep their own
    scale paths (banded LSH / IVF for vectors, df-pruned postings for
    BM25)."""
    u = None
    for df in ranked_lists:
        part = df.select(
            F.col(query_id_col).alias("query_id"),
            F.col(id_col).alias("doc_id"),
            F.expr(
                f"cast(round(1.0e6 / ({k0} + {rank_col})) as bigint)"
            ).alias("contrib_micro"),
        )
        u = part if u is None else u.unionAll(part)
    scored = u.groupBy("query_id", "doc_id").agg(
        F.sum("contrib_micro").alias("rrf_micro"),
        F.count(F.lit(1)).cast("long").alias("n_lists"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_micro").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "rrf_micro", "n_lists")
    )


def rrf_fuse_sql(
    list_sqls: list[str],
    k: int = 10,
    k0: int = 60,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> str:
    """DuckDB twin of :func:`rrf_fuse` (identical micro quantization)."""
    union = "\n  union all\n".join(
        f"  select {query_id_col} as query_id, {id_col} as doc_id, "
        f"cast(round(1.0e6 / ({k0} + {rank_col})) as bigint) as contrib_micro "
        f"from (({s}))"
        for s in list_sqls
    )
    return f"""
with u as (
{union}
),
scored as (
  select query_id, doc_id,
         cast(sum(contrib_micro) as bigint) as rrf_micro,
         cast(count(*) as bigint) as n_lists
  from u group by 1, 2
)
select query_id,
       cast(row_number() over (
         partition by query_id order by rrf_micro desc, doc_id asc
       ) as bigint) as rank,
       doc_id, rrf_micro, n_lists
from scored
qualify rank <= {k}
"""
