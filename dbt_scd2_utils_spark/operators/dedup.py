"""Deduplication operators for large-scale corpus curation.

Beyond-reference surface (BASELINE.json north-star): exact dedup,
MinHash+LSH banding, SimHash, and n-gram Jaccard verification — each with a
DuckDB oracle twin (``*_sql``).

Cross-engine determinism design: every hash is md5 over explicit strings
(identical hex in any engine); "random" permutations are md5-keyed
(``min(md5(i || '-' || shingle))`` is a valid min-wise family with md5 as
the permutation), so MinHash signatures are bit-identical across engines.
All pipelines stay in built-in functions — shingling via
``split``/``sequence``/``slice``/``transform``, SimHash bit math via
``conv``/``shiftright`` — so the hot path is whole-stage-codegen JVM code,
no Python.  Scale shape: LSH banding turns the O(n²) pair space into
per-bucket self-joins keyed by (band, signature) — one shuffle on the band
key; exact verification touches candidate pairs only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.caching import barrier as _barrier
from .text import TOKEN_SPLIT

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Hash-groupBy exact dedup: one survivor (min id) per distinct content,
    with the duplicate count.

    groupBy (not a window): partial aggregation combines map-side, so a
    pathologically duplicated document (millions of copies of one text at
    corpus scale) reduces before the shuffle instead of collapsing into one
    hot window partition."""
    h = F.md5(F.col(text_col))
    return (
        df.select(F.col(id_col), h.alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select(id_col, "content_hash", "dup_count")
    )


def exact_dedup_sql(source_sql: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    return f"""
select min({id_col}) as {id_col}, md5({text_col}) as content_hash,
       count(*) as dup_count
from ({source_sql})
group by md5({text_col})
"""


# ---------------------------------------------------------------------------
# shingling + MinHash + LSH
# ---------------------------------------------------------------------------


def word_shingles(text_col: str | Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles via sequence/slice/transform
    (pure builtins).  Documents shorter than n words yield one whole-text
    shingle so they still participate."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    words = F.split(F.trim(c), TOKEN_SPLIT)
    ngrams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    return F.array_distinct(ngrams)


def word_shingles_sql(text_col: str, n: int = 3) -> str:
    words = f"string_split_regex(trim({text_col}), '\\s+')"
    return (
        f"list_distinct(list_transform("
        f"range(0, greatest(len({words}) - {n}, 0) + 1), "
        f"i -> array_to_string(list_slice({words}, i + 1, i + {n}), ' ')))"
    )


def _perm_hash(i: int):
    # NB: must return a ONE-argument lambda — Spark treats a two-parameter
    # transform lambda as (element, index) and would shadow the captured i.
    prefix = f"{i}-"
    return lambda s: F.md5(F.concat(F.lit(prefix), s))


def minhash_signature(shingles: Column, k: int = 12) -> Column:
    """k md5-keyed min-hashes (lexicographic min of md5 hex — engine-stable).

    Column-expression form; prefer :func:`minhash_signatures` (explode +
    aggregate) on large corpora — higher-order-function transforms run
    interpreted, outside whole-stage codegen."""
    return F.array(
        *[F.array_min(F.transform(shingles, _perm_hash(i))) for i in range(k)]
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    k: int = 12,
) -> DataFrame:
    """Scalable MinHash: explode shingles → k codegen'd md5 columns → map-side
    partial min aggregation keyed by document.  One shuffle of (id, k mins)
    partials; identical hash values to :func:`minhash_signature`.

    The shingle projection is an interpreted higher-order function —
    ``parallelize_narrow`` spreads a narrow (single-file local) input across
    cores before paying it (no-op on well-partitioned inputs)."""
    from ..functions.partitioning import parallelize_narrow

    exploded = parallelize_narrow(df).select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(text_col, shingle_n)).alias("s"),
    )
    hashed = exploded.select(
        "id",
        *[
            F.md5(F.concat(F.lit(f"{i}-"), F.col("s"))).alias(f"h{i}")
            for i in range(k)
        ],
    )
    return hashed.groupBy("id").agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(k)]
    )


def minhash_signature_sql(shingles_sql: str, k: int = 12) -> str:
    mins = ",\n    ".join(
        f"list_min(list_transform({shingles_sql}, s -> md5(concat('{i}-', s))))"
        for i in range(k)
    )
    return f"[{mins}]"


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    k: int = 12,
    bands: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash LSH banding.

    signature (k hashes) → `bands` bands of k/bands rows → bucket join on
    (band index, band signature) → candidate pairs (a < b), deduped.
    Shuffle is on the band-signature key; no O(n²) comparisons.

    ``max_bucket``: drop buckets larger than this BEFORE the self-join —
    the mega-bucket safety valve for web-scale corpora, where a
    boilerplate/exact-duplicate flood hashes a million documents into
    one bucket and the within-bucket join goes quadratic (10⁶ members →
    10¹² pairs).  Cost: one map-side-combined count over the banded
    table.  Recall: a pair is lost only if EVERY band it collides in is
    over the cap — and a flood cluster that big should have been
    collapsed by :func:`exact_dedup` / :func:`normalized_exact_dedup`
    upstream (the curation pipelines do exactly that); the cap is the
    guard for the corpus you haven't cleaned yet.  Default None keeps
    every bucket."""
    rows = k // bands
    # Signature table materialized once (persist = barrier): the banding and
    # both self-join sides reference it, and without the barrier Catalyst's
    # CollapseProject would inline the whole signature computation into every
    # reference (observed 30× slowdown).  At cluster scale this is the
    # signature table you'd persist anyway.
    with_sig = _barrier(minhash_signatures(df, id_col, text_col, shingle_n, k))
    banded = with_sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "|", *[F.col(f"h{b * rows + r}") for r in range(rows)]
                        ).alias("band_sig"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bs"),
    ).select("id", "bs.band", "bs.band_sig")
    if max_bucket is not None:
        small = (
            banded.groupBy("band", "band_sig")
            .agg(F.count(F.lit(1)).alias("_bn"))
            .filter(F.col("_bn") <= max_bucket)
            .select("band", "band_sig")
        )
        banded = banded.join(small, ["band", "band_sig"], "left_semi")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.id") < F.col("b.id")),
            "inner",
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return pairs


def minhash_lsh_pairs_sql(
    source_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    k: int = 12,
    bands: int = 4,
    max_bucket: int | None = None,
) -> str:
    rows = k // bands
    sig_sql = minhash_signature_sql(word_shingles_sql(text_col, shingle_n), k)
    band_selects = "\n  union all\n".join(
        f"  select id, {b} as band, "
        + " || '|' || ".join(f"sig[{b * rows + r + 1}]" for r in range(rows))
        + " as band_sig from sigs"
        for b in range(bands)
    )
    cap = (
        ""
        if max_bucket is None
        else f""",
kept as (
  select band, band_sig from banded
  group by 1, 2 having count(*) <= {max_bucket}
),
banded_capped as (
  select b.* from banded b join kept using (band, band_sig)
)"""
    )
    src = "banded" if max_bucket is None else "banded_capped"
    return f"""
with sigs as (
  select {id_col} as id, {sig_sql} as sig
  from ({source_sql})
),
banded as (
{band_selects}
){cap}
select distinct a.id as id_a, b.id as id_b
from {src} a join {src} b
  on a.band = b.band and a.band_sig = b.band_sig and a.id < b.id
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact verification of candidates, or full small-n dedup)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.7,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs ≥ threshold.

    With ``candidates`` (e.g. from minhash_lsh_pairs) only those pairs are
    verified — the 100-TB path: exact work ∝ candidates, not n².  Without,
    verifies all LSH candidates generated internally."""
    if candidates is None:
        candidates = minhash_lsh_pairs(df, id_col, text_col, shingle_n)
    # Persisted: consumed by both sides of the candidate join (and the
    # shingling is itself expensive to recompute).  parallelize_narrow
    # spreads the interpreted shingle projection across cores first.
    from ..functions.partitioning import parallelize_narrow

    sh = _barrier(
        parallelize_narrow(df).select(
            F.col(id_col).alias("id"),
            word_shingles(text_col, shingle_n).alias("sh"),
        )
    )
    joined = (
        candidates.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = F.round(inter.cast("double") / F.greatest(union, F.lit(1)), 6)
    return (
        joined.select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs_sql(
    source_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.7,
    k: int = 12,
    bands: int = 4,
) -> str:
    cand = minhash_lsh_pairs_sql(source_sql, id_col, text_col, shingle_n, k, bands)
    return f"""
with cand as ({cand}),
sh as (
  select {id_col} as id, {word_shingles_sql(text_col, shingle_n)} as sh
  from ({source_sql})
)
select c.id_a, c.id_b,
  round(cast(len(list_intersect(a.sh, b.sh)) as double) /
        greatest(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)), 1), 6) as jaccard
from cand c
join sh a on a.id = c.id_a
join sh b on b.id = c.id_b
where round(cast(len(list_intersect(a.sh, b.sh)) as double) /
        greatest(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)), 1), 6) >= {threshold}
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """32-bit SimHash over word tokens (md5-derived token hashes → per-bit
    ±1 vote sums → sign bits).  Explode + one aggregation by document —
    shuffle keyed on id, all bit math JVM-side.  parallelize_narrow spreads
    the map-side md5-vote work when the input is a single local file."""
    from ..functions.partitioning import parallelize_narrow

    df = parallelize_narrow(df)
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.col(text_col)), TOKEN_SPLIT)).alias("tok"),
    )
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    votes = toks.select(
        "id",
        *[
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1))
            .otherwise(F.lit(-1))
            .alias(f"b{b}")
            for b in range(SIMHASH_BITS)
        ],
    )
    agg = votes.groupBy("id").agg(
        *[F.sum(f"b{b}").alias(f"s{b}") for b in range(SIMHASH_BITS)]
    )
    hash_expr = None
    for b in range(SIMHASH_BITS):
        bit = F.when(F.col(f"s{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        hash_expr = bit if hash_expr is None else hash_expr + bit
    return agg.select(
        F.col("id").alias(id_col), hash_expr.cast("long").alias("simhash")
    )


def simhash_sql(source_sql: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    h = "cast(concat('0x', substring(md5(tok), 1, 8)) as bigint)"
    votes = ",\n    ".join(
        f"sum(case when (({h}) >> {b}) & 1 = 1 then 1 else -1 end) as s{b}"
        for b in range(SIMHASH_BITS)
    )
    recompose = " + ".join(
        f"case when s{b} > 0 then cast({2**b} as bigint) else 0 end"
        for b in range(SIMHASH_BITS)
    )
    return f"""
with toks as (
  select {id_col} as id, unnest(string_split_regex(trim({text_col}), '\\s+')) as tok
  from ({source_sql})
),
agg as (
  select id,
    {votes}
  from toks
  group by id
)
select id as {id_col}, cast({recompose} as bigint) as simhash
from agg
"""


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def ngram_decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 8,
) -> DataFrame:
    """Training-data decontamination: per document, how many of its distinct
    word ``n``-grams appear anywhere in the ``benchmark`` corpus, and a flag
    (the standard exact-overlap eval-contamination check — a doc sharing any
    13-gram with a benchmark is typically dropped; ``n`` is a parameter).

    Shape: explode both sides' distinct n-grams → equi-join on the gram →
    per-doc count → left join back to all documents.  The benchmark side is
    aggregated to DISTINCT grams first (benchmarks are small next to the
    corpus — Catalyst broadcasts it under the threshold; past it this is a
    plain shuffle equi-join on the gram key, never O(n·m))."""
    from ..functions.partitioning import parallelize_narrow

    bcol = bench_text_col or text_col
    doc_grams = parallelize_narrow(df).select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(text_col, n)).alias("g"),
    )
    bench_grams = parallelize_narrow(benchmark).select(
        F.explode(word_shingles(bcol, n)).alias("g")
    ).distinct()
    hits = (
        doc_grams.join(bench_grams, "g", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("contaminated_grams"))
    )
    return (
        df.select(F.col(id_col))
        .join(hits, F.col(id_col) == F.col("id"), "left")
        .select(
            id_col,
            F.coalesce(F.col("contaminated_grams"), F.lit(0))
            .cast("long")
            .alias("contaminated_grams"),
            (F.coalesce(F.col("contaminated_grams"), F.lit(0)) > 0).alias(
                "is_contaminated"
            ),
        )
    )


def ngram_decontaminate_prefiltered(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 8,
    bits_log2: int = 26,
) -> DataFrame:
    """:func:`ngram_decontaminate` with a broadcast BITMAP PREFILTER on the
    corpus-gram stream — identical output (the exact semi-join still
    decides), built for the 100 TB corpus where the doc-gram stream is the
    dominant shuffle.

    The benchmark's grams are packed into a k=1 Bloom filter held as a
    DataFrame: bucket = xxhash64(gram) & (2^bits_log2 - 1), grouped into
    64-bit words via ``bit_or(1 << (bucket & 63))`` → one (word_idx, bits)
    row per occupied word.  That table is at most |bench grams| rows
    (≤ 8 MiB of longs at bits_log2=26 even fully dense), so it BROADCASTS
    where the raw gram strings might not — and the corpus grams test
    membership with a broadcast equi-join + bit test, all codegen, no
    shuffle.  Only the survivors — true hits plus a |bench|/2^bits_log2
    false-positive trickle — enter the exact semi-join, so the shuffle
    carries ~the contamination volume instead of every gram in the corpus.

    (Spark's own runtime bloom-filter injection
    [spark.sql.optimizer.runtime.bloomFilter] targets the same pattern but
    only fires on shuffle joins past size thresholds; building the filter
    explicitly keeps the plan deterministic at every scale, and
    ``bloom_filter_agg`` is not in the public function registry.)
    """
    from ..functions.partitioning import parallelize_narrow

    bcol = bench_text_col or text_col
    mask = (1 << bits_log2) - 1
    # Low 6 bucket bits select the bit within the word, the rest the word;
    # mask's low bits are all ones so (bucket & 63) == (hash & 63).
    word_idx = F.shiftright(F.xxhash64(F.col("g")).bitwiseAND(F.lit(mask)), 6)
    one_hot = F.expr("shiftleft(cast(1 as bigint), cast(xxhash64(g) & 63 as int))")

    bench_grams = (
        parallelize_narrow(benchmark)
        .select(F.explode(word_shingles(bcol, n)).alias("g"))
        .distinct()
    )
    words = bench_grams.groupBy(word_idx.alias("word_idx")).agg(
        F.bit_or(one_hot).alias("bits")
    )

    doc_grams = parallelize_narrow(df).select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(text_col, n)).alias("g"),
    )
    survivors = (
        doc_grams.join(F.broadcast(words), word_idx == F.col("word_idx"))
        .filter(F.col("bits").bitwiseAND(one_hot) != 0)
        .select("id", "g")
    )
    hits = (
        survivors.join(bench_grams, "g", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("contaminated_grams"))
    )
    return (
        df.select(F.col(id_col))
        .join(hits, F.col(id_col) == F.col("id"), "left")
        .select(
            id_col,
            F.coalesce(F.col("contaminated_grams"), F.lit(0))
            .cast("long")
            .alias("contaminated_grams"),
            (F.coalesce(F.col("contaminated_grams"), F.lit(0)) > 0).alias(
                "is_contaminated"
            ),
        )
    )


def ngram_decontaminate_sql(
    source_sql: str,
    bench_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 8,
) -> str:
    bcol = bench_text_col or text_col
    return f"""
with dg as (
  select {id_col} as id, unnest({word_shingles_sql(text_col, n)}) as g
  from ({source_sql})
),
bg as (
  select distinct unnest({word_shingles_sql(bcol, n)}) as g
  from ({bench_sql})
),
hits as (
  select id, count(*) as contaminated_grams
  from (select distinct id, g from dg) d
  where g in (select g from bg)
  group by id
)
select s.{id_col},
  cast(coalesce(h.contaminated_grams, 0) as bigint) as contaminated_grams,
  coalesce(h.contaminated_grams, 0) > 0 as is_contaminated
from ({source_sql}) s left join hits h on s.{id_col} = h.id
"""


# ---------------------------------------------------------------------------
# Incremental corpus dedup (novelty check of a new batch vs an index)
# ---------------------------------------------------------------------------


def banded_minhash_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    k: int = 12,
    bands: int = 4,
) -> DataFrame:
    """(id, band, band_sig): the banded MinHash index relation — one row per
    document per band.  This is the table a deployment PERSISTS as its
    corpus dedup index (parquet partitioned by band); each ingest batch then
    joins it instead of re-signaturing 100 TB of history."""
    rows = k // bands
    with_sig = minhash_signatures(df, id_col, text_col, shingle_n, k)
    return with_sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "|", *[F.col(f"h{b * rows + r}") for r in range(rows)]
                        ).alias("band_sig"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bs"),
    ).select("id", "bs.band", "bs.band_sig")


def save_minhash_index(index: DataFrame, path: str) -> None:
    """Persist a :func:`banded_minhash_index` as parquet partitioned by band
    — the ingest-time dedup index.  Band-partitioning means a batch probe
    prunes to the band directories it actually touches."""
    index.select("id", "band", "band_sig").write.mode("overwrite").partitionBy(
        "band"
    ).parquet(path)


def load_minhash_index(spark, path: str) -> DataFrame:
    """Read a :func:`save_minhash_index` back for
    ``minhash_novelty(corpus_index=)`` — each ingest batch probes the stored
    index instead of re-signaturing the full corpus."""
    return spark.read.parquet(path).select(
        "id", F.col("band").cast("int").alias("band"), "band_sig"
    )


def minhash_novelty(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    k: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
    corpus_index: DataFrame | None = None,
) -> DataFrame:
    """Incremental corpus dedup: flag each NEW document as a near-duplicate
    of the existing corpus or novel.  One row per new doc:
    ``(id, n_dup_matches, is_novel)``.

    Scale shape: the corpus side is :func:`banded_minhash_index` (at
    deployment, read back from its persisted parquet rather than recomputed);
    the new batch computes its own (small) bands and equi-joins the index on
    (band, band_sig) — candidate work ∝ colliding buckets, never
    batch × corpus — then exact n-gram Jaccard verifies candidates only
    (the minhash_lsh_pairs / ngram_jaccard_pairs split, applied
    cross-corpus instead of self-join)."""
    from ..functions.partitioning import parallelize_narrow

    nb = banded_minhash_index(
        new_df, id_col, text_col, shingle_n, k, bands
    ).alias("n")
    cb = (
        corpus_index
        if corpus_index is not None
        else banded_minhash_index(corpus_df, id_col, text_col, shingle_n, k, bands)
    ).alias("c")
    cand = (
        nb.join(
            cb,
            (F.col("n.band") == F.col("c.band"))
            & (F.col("n.band_sig") == F.col("c.band_sig")),
            "inner",
        )
        .select(F.col("n.id").alias("new_id"), F.col("c.id").alias("corpus_id"))
        .distinct()
    )
    sh_new = parallelize_narrow(new_df).select(
        F.col(id_col).alias("new_id"),
        word_shingles(text_col, shingle_n).alias("sh_n"),
    )
    sh_cor = parallelize_narrow(corpus_df).select(
        F.col(id_col).alias("corpus_id"),
        word_shingles(text_col, shingle_n).alias("sh_c"),
    )
    inter = F.size(F.array_intersect("sh_n", "sh_c"))
    union = F.size("sh_n") + F.size("sh_c") - inter
    jac = F.round(inter.cast("double") / F.greatest(union, F.lit(1)), 6)
    dups = (
        cand.join(sh_new, "new_id")
        .join(sh_cor, "corpus_id")
        .select("new_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    counts = dups.groupBy("new_id").agg(
        F.count(F.lit(1)).alias("n_dup_matches")
    )
    return (
        new_df.select(F.col(id_col).alias("id"))
        .join(counts.withColumnRenamed("new_id", "id"), "id", "left")
        .select(
            "id",
            F.coalesce("n_dup_matches", F.lit(0))
            .cast("long")
            .alias("n_dup_matches"),
        )
        .withColumn("is_novel", F.col("n_dup_matches") == 0)
    )


def _banded_index_sql(
    source_sql: str,
    id_col: str,
    text_col: str,
    shingle_n: int,
    k: int,
    bands: int,
) -> str:
    rows = k // bands
    sig_sql = minhash_signature_sql(word_shingles_sql(text_col, shingle_n), k)
    band_selects = "\n  union all\n".join(
        f"  select id, {b} as band, "
        + " || '|' || ".join(f"sig[{b * rows + r + 1}]" for r in range(rows))
        + " as band_sig from sigs"
        for b in range(bands)
    )
    return f"""
with sigs as (
  select {id_col} as id, {sig_sql} as sig
  from ({source_sql})
)
{band_selects}
"""


def minhash_novelty_sql(
    new_sql: str,
    corpus_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    k: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
) -> str:
    nb = _banded_index_sql(new_sql, id_col, text_col, shingle_n, k, bands)
    cb = _banded_index_sql(corpus_sql, id_col, text_col, shingle_n, k, bands)
    sh = word_shingles_sql(text_col, shingle_n)
    return f"""
with nb as ({nb}),
cb as ({cb}),
cand as (
  select distinct nb.id as new_id, cb.id as corpus_id
  from nb join cb on nb.band = cb.band and nb.band_sig = cb.band_sig
),
shn as (
  select {id_col} as new_id, {sh} as sh_n from ({new_sql})
),
shc as (
  select {id_col} as corpus_id, {sh} as sh_c from ({corpus_sql})
),
dups as (
  select new_id
  from cand
  join shn using (new_id)
  join shc using (corpus_id)
  where round(cast(len(list_intersect(sh_n, sh_c)) as double) /
        greatest(len(sh_n) + len(sh_c) - len(list_intersect(sh_n, sh_c)), 1), 6)
        >= {threshold}
),
counts as (
  select new_id, count(*) as n_dup_matches from dups group by new_id
)
select s.{id_col} as id,
  cast(coalesce(c.n_dup_matches, 0) as bigint) as n_dup_matches,
  coalesce(c.n_dup_matches, 0) = 0 as is_novel
from ({new_sql}) s left join counts c on s.{id_col} = c.new_id
"""


def paragraph_dedup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    para_tokens: int = 16,
) -> DataFrame:
    """C4-style intra-corpus duplicate-paragraph measurement: split each
    document into fixed ``para_tokens``-token paragraphs
    (text.chunk_documents, no overlap), declare the corpus-wide FIRST
    occurrence of each distinct paragraph canonical, and report per
    document how much of it is duplicated text — the signal behind
    "remove documents that are mostly boilerplate" gates.

    Output: (id, n_paragraphs, n_duplicate, dup_bp) with dup_bp the
    duplicated fraction in integer basis points (exact in both engines).

    Canonical choice is total-ordered by a fixed-width (doc, idx) string
    key, so ties cannot differ across engines.  Shape: narrow chunking →
    ONE shuffle on the paragraph text (the dedup key; min-over-window) →
    map-side-combined per-doc rollup.  Paragraph-frequency skew (a
    boilerplate line appearing millions of times) lands on one task only
    for the tiny (text, min-key) pairs, not the documents themselves."""
    from .text import chunk_documents

    chunks = chunk_documents(
        df, id_col=id_col, text_col=text_col, max_tokens=para_tokens, overlap=0
    )
    okey = F.format_string("%010d:%010d", F.col(id_col), F.col("chunk_idx"))
    w = Window.partitionBy("chunk_text")
    tagged = chunks.withColumn("__okey", okey).withColumn(
        "__canon", F.min("__okey").over(w)
    )
    return (
        tagged.groupBy(F.col(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_paragraphs"),
            F.sum((F.col("__okey") != F.col("__canon")).cast("long")).alias(
                "n_duplicate"
            ),
        )
        .select(
            id_col,
            "n_paragraphs",
            "n_duplicate",
            # integer div in BOTH engines: double-division + cast would
            # TRUNCATE in Spark but ROUND in DuckDB at .5 boundaries
            F.expr("n_duplicate * 10000 div n_paragraphs").alias("dup_bp"),
        )
    )


def paragraph_dedup_stats_sql(
    source_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    para_tokens: int = 16,
) -> str:
    from .text import chunk_documents_sql

    inner = chunk_documents_sql(
        source_sql, id_col=id_col, text_col=text_col,
        max_tokens=para_tokens, overlap=0,
    )
    return f"""
with chunks as ({inner}),
tagged as (
  select {id_col},
    printf('%010d:%010d', {id_col}, chunk_idx) as okey,
    min(printf('%010d:%010d', {id_col}, chunk_idx))
      over (partition by chunk_text) as canon
  from chunks
)
select {id_col},
  cast(count(*) as bigint) as n_paragraphs,
  cast(sum(case when okey <> canon then 1 else 0 end) as bigint) as n_duplicate,
  cast(sum(case when okey <> canon then 1 else 0 end) * 10000 // count(*) as bigint) as dup_bp
from tagged
group by {id_col}
"""


# ---------------------------------------------------------------------------
# Containment decontamination (fuzzy benchmark-overlap removal)
# ---------------------------------------------------------------------------


def containment_decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str | None = None,
    bench_text_col: str | None = None,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 2000,
) -> DataFrame:
    """Fuzzy eval-set decontamination by n-gram CONTAINMENT, the semantics
    real decontamination pipelines use (GPT-3 App. C / PaLM-style overlap
    fraction): a corpus document is contaminated when it contains a large
    fraction of some benchmark item's distinct word ``shingle_n``-grams —
    |doc ∩ bench| / |bench|, NOT Jaccard, because a long training document
    that embeds a short eval item has near-zero Jaccard but containment ≈ 1.

    Output: one row per corpus document,
    ``(id, max_containment_micro, n_bench_hits, is_contaminated)`` —
    ``max_containment_micro`` = round(1e6 · best containment) as an exact
    integer (cross-engine hashable), ``n_bench_hits`` = #benchmark items
    with containment ≥ ``threshold``.

    Scale shape: inverted-index equi-join on the gram — per-gram work ∝ the
    gram's posting-list sizes, never corpus × benchmark.  ``max_df`` drops
    grams whose CORPUS document frequency exceeds it (boilerplate grams like
    'terms of service apply' would otherwise create quadratic hot posting
    lists); the containment denominator counts only the benchmark grams that
    survive pruning, so pruning never deflates the score — documented
    deviation: a benchmark item whose every gram is boilerplate (all pruned)
    can no longer be matched.  The DuckDB twin
    (:func:`containment_decontaminate_sql`) applies identical pruning.
    """
    from ..functions.partitioning import parallelize_narrow

    bid = bench_id_col or id_col
    bcol = bench_text_col or text_col

    doc_grams = parallelize_narrow(df).select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(text_col, shingle_n)).alias("g"),
    )
    if max_df is not None:
        keep = (
            doc_grams.groupBy("g")
            .agg(F.count(F.lit(1)).alias("gdf"))
            .filter(F.col("gdf") <= max_df)
            .select("g")
        )
        doc_grams = doc_grams.join(keep, "g", "left_semi")
        bench_grams = (
            parallelize_narrow(benchmark)
            .select(
                F.col(bid).alias("bench_id"),
                F.explode(word_shingles(bcol, shingle_n)).alias("g"),
            )
            .join(keep, "g", "left_semi")
        )
    else:
        bench_grams = parallelize_narrow(benchmark).select(
            F.col(bid).alias("bench_id"),
            F.explode(word_shingles(bcol, shingle_n)).alias("g"),
        )
    bench_sizes = bench_grams.groupBy("bench_id").agg(
        F.count(F.lit(1)).alias("bench_kept")
    )
    shared = (
        doc_grams.join(bench_grams, "g")
        .groupBy("id", "bench_id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    contain = shared.join(F.broadcast(bench_sizes), "bench_id").select(
        "id",
        "bench_id",
        F.expr(
            "cast(round(1.0e6 * shared / bench_kept) as bigint)"
        ).alias("containment_micro"),
    )
    thr_micro = int(round(threshold * 1_000_000))
    per_doc = contain.groupBy("id").agg(
        F.max("containment_micro").alias("max_containment_micro"),
        F.sum(
            (F.col("containment_micro") >= thr_micro).cast("long")
        ).alias("n_bench_hits"),
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc, F.col(id_col) == F.col("id"), "left")
        .select(
            id_col,
            F.coalesce("max_containment_micro", F.lit(0))
            .cast("long")
            .alias("max_containment_micro"),
            F.coalesce("n_bench_hits", F.lit(0)).cast("long").alias("n_bench_hits"),
            (F.coalesce("n_bench_hits", F.lit(0)) > 0).alias("is_contaminated"),
        )
    )


def containment_decontaminate_sql(
    source_sql: str,
    bench_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str | None = None,
    bench_text_col: str | None = None,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 2000,
) -> str:
    """DuckDB twin of :func:`containment_decontaminate` (identical pruning,
    identical integer-micro rounding)."""
    bid = bench_id_col or id_col
    bcol = bench_text_col or text_col
    thr_micro = int(round(threshold * 1_000_000))
    prune_keep = (
        f"keep as (select g from dg group by g having count(*) <= {max_df}),"
        if max_df is not None
        else "keep as (select distinct g from dg),"
    )
    return f"""
with dg as (
  select {id_col} as id, unnest({word_shingles_sql(text_col, shingle_n)}) as g
  from ({source_sql})
),
{prune_keep}
dgk as (select id, g from dg where g in (select g from keep)),
bg as (
  select {bid} as bench_id,
         unnest({word_shingles_sql(bcol, shingle_n)}) as g
  from ({bench_sql})
),
bgk as (select bench_id, g from bg where g in (select g from keep)),
bsz as (select bench_id, count(*) as bench_kept from bgk group by bench_id),
shared as (
  select d.id, b.bench_id, count(*) as shared
  from dgk d join bgk b using (g)
  group by d.id, b.bench_id
),
contain as (
  select id, s.bench_id,
    cast(round(1.0e6 * shared / bench_kept) as bigint) as containment_micro
  from shared s join bsz using (bench_id)
),
per_doc as (
  select id,
    max(containment_micro) as max_containment_micro,
    sum(case when containment_micro >= {thr_micro} then 1 else 0 end)
      as n_bench_hits
  from contain group by id
)
select s.{id_col},
  cast(coalesce(p.max_containment_micro, 0) as bigint) as max_containment_micro,
  cast(coalesce(p.n_bench_hits, 0) as bigint) as n_bench_hits,
  coalesce(p.n_bench_hits, 0) > 0 as is_contaminated
from ({source_sql}) s left join per_doc p on s.{id_col} = p.id
"""


# ---------------------------------------------------------------------------
# Normalized exact dedup (C4-style canonical-form hashing)
# ---------------------------------------------------------------------------

# lowercase → map every non-letter/digit/whitespace char to a SPACE (not
# the empty string: "déjà-vu" must stay two tokens, not fuse to "déjàvu")
# → collapse whitespace runs → trim.  Both engines run the same
# RE2/Java-compatible character classes, so canonical forms are
# byte-identical.
_NORM_STRIP = r"[^\p{L}\p{N}\s]"


def normalize_text(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(c), _NORM_STRIP, " "), r"\s+", " "
        )
    )


def normalize_text_sql(col: str) -> str:
    return (
        f"trim(regexp_replace(regexp_replace(lower({col}), "
        f"'{_NORM_STRIP}', ' ', 'g'), '\\s+', ' ', 'g'))"
    )


def normalized_exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup over the CANONICAL text form — lowercased, punctuation
    stripped, whitespace collapsed — so trivially-reformatted copies
    ("Hello, World!" vs "hello world") collapse into one group, the way
    C4's three-sentence-span dedup and most crawl pipelines canonicalize
    before hashing.  Output shape matches :func:`exact_dedup`:
    one survivor (min id) per canonical form with the duplicate count.

    Same scale shape as exact_dedup: the normalization chain is three
    codegen'd regexp passes in the scan projection; one map-side-combined
    groupBy on the md5 of the canonical form."""
    h = F.md5(normalize_text(text_col))
    return (
        df.select(F.col(id_col), h.alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select(id_col, "content_hash", "dup_count")
    )


def normalized_exact_dedup_sql(
    source_sql: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    h = f"md5({normalize_text_sql(text_col)})"
    return f"""
select min({id_col}) as {id_col}, {h} as content_hash, count(*) as dup_count
from ({source_sql})
group by {h}
"""


# ---------------------------------------------------------------------------
# Duplicate-span coverage (how much of each document is duplicated text)
# ---------------------------------------------------------------------------


def duplicate_span_coverage(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document duplicated-text coverage, the measurement behind
    "Deduplicating Training Data Makes Language Models Better" (Lee et
    al., ACL'22): slide a ``span_n``-token window over every position
    and report what fraction of windows also occur in ≥ ``min_docs``
    documents — ``(id, n_windows, n_dup_windows, dup_coverage_bp)``.
    An exact copy scores 10000 bp; a doc quoting one boilerplate
    paragraph scores the paragraph's share.  Unlike pair-based dedup
    this is a per-document severity SIGNAL — rank by it, sample the
    tail, decide thresholds.

    Windows are positional (NOT distinct — a phrase repeated inside one
    doc counts each time toward coverage, matching span semantics), but
    the document-frequency of a window counts distinct documents.

    Scale shape: one explode of n·L windows → distinct (gram, doc) for
    the df count (map-side combined) → semi-join positions against the
    ≥min_docs gram set → per-doc count.  Work ∝ corpus token count, the
    same budget class as exact decontamination."""
    from ..functions.partitioning import parallelize_narrow

    words = F.split(F.trim(F.col(text_col)), TOKEN_SPLIT)
    grams = F.when(
        F.size(words) >= span_n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - span_n),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, span_n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pos = parallelize_narrow(df).select(
        F.col(id_col).alias("id"), F.explode(grams).alias("g")
    )
    dup_grams = (
        pos.select("id", "g")
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("gdf"))
        .filter(F.col("gdf") >= min_docs)
        .select("g")
    )
    totals = pos.groupBy("id").agg(F.count(F.lit(1)).alias("n_windows"))
    dups = (
        pos.join(dup_grams, "g", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_dup_windows"))
    )
    return (
        df.select(F.col(id_col))
        .join(totals, F.col(id_col) == totals["id"], "left")
        .drop("id")
        .join(dups, F.col(id_col) == dups["id"], "left")
        .drop("id")
        .select(
            id_col,
            F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0))
            .cast("long")
            .alias("n_dup_windows"),
            F.expr(
                "coalesce(n_dup_windows, 0) * 10000 div "
                "greatest(coalesce(n_windows, 0), 1)"
            ).alias("dup_coverage_bp"),
        )
    )


def duplicate_span_coverage_sql(
    source_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_n: int = 8,
    min_docs: int = 2,
) -> str:
    """DuckDB twin of :func:`duplicate_span_coverage`."""
    words = f"string_split_regex(trim({text_col}), '\\s+')"
    grams = (
        f"case when len({words}) >= {span_n} then "
        f"list_transform(range(0, len({words}) - {span_n} + 1), "
        f"i -> array_to_string(list_slice({words}, i + 1, i + {span_n}), ' ')) "
        f"else [] end"
    )
    return f"""
with pos as (
  select {id_col} as id, unnest({grams}) as g from ({source_sql})
),
dup_grams as (
  select g from (select distinct id, g from pos)
  group by g having count(*) >= {min_docs}
),
totals as (select id, count(*) as n_windows from pos group by id),
dups as (
  select id, count(*) as n_dup_windows
  from pos where g in (select g from dup_grams)
  group by id
)
select s.{id_col},
  cast(coalesce(t.n_windows, 0) as bigint) as n_windows,
  cast(coalesce(d.n_dup_windows, 0) as bigint) as n_dup_windows,
  cast(coalesce(d.n_dup_windows, 0) * 10000
       // greatest(coalesce(t.n_windows, 0), 1) as bigint)
    as dup_coverage_bp
from ({source_sql}) s
left join totals t on s.{id_col} = t.id
left join dups d on s.{id_col} = d.id
"""


def exact_substring_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """The REMOVAL step of exact-substring deduplication ("Deduplicating
    Training Data Makes Language Models Better", Lee et al., ACL'22 —
    their ExactSubstr tool cuts every duplicated byte span; this is the
    token-granular Spark formulation, sharing
    :func:`duplicate_span_coverage`'s definition of "duplicated"): a
    ``span_n``-token window whose text occurs in ≥ ``min_docs`` distinct
    documents is a duplicated span, and every token covered by at least
    one duplicated span is cut from its document.

    DELIBERATE DIVERGENCE from Lee et al.'s ExactSubstr: their
    suffix-array tool counts OCCURRENCES, so a span repeated twice
    within one document is cut; here ``min_docs`` counts DISTINCT
    documents, so intra-document repeats alone never trigger a cut.
    This matches :func:`duplicate_span_coverage` (the detection twin)
    and is cross-engine-consistent with the DuckDB oracle — it is a
    definition choice, not an equivalence claim to the ACL'22 tool for
    self-repeating documents (use :func:`text.remove_repeated_lines`
    for those).  Overlapping spans
    merge naturally (a token is cut once no matter how many spans cover
    it), which reproduces ExactSubstr's maximal-span behavior without
    building a suffix array: the union of all duplicated fixed-length
    windows IS the set of maximal duplicated regions of length ≥ span_n.

    Output per input document: ``(id, n_tokens, n_removed_tokens,
    retained_hash)`` where ``retained_hash`` is md5 over the surviving
    tokens re-joined in original order (md5('') for a fully-duplicated
    document — filtering emptied docs is the caller's policy call, as in
    :func:`text.remove_repeated_lines`).

    Scale shape (the 100-TB budget is corpus TOKEN count, same class as
    exact decontamination): one explode of n·L windows → distinct
    (gram, doc) → map-side-combined document-frequency count; duplicated
    window starts fan out to ≤ span_n (id, token_idx) rows, distinct'd
    and folded to ONE sorted index array per affected document — every
    shuffle after the window explode is DUPLICATE-scale, not
    corpus-token-scale.  Counts and the retained text are then derived
    in-plan from the doc's token array and its covered-index array (one
    codegen'd filter over the array — no token explode, no anti-join,
    no per-token reconstruction shuffle).  No suffix array, no UDFs, no
    driver collect.

    ``base`` is deliberately NOT persisted even though two consumers read
    it: it holds the tokenized corpus (larger than the text itself), and
    at scale two narrow columnar scans of the text column are cheaper
    than pinning token arrays in executor storage — measured locally,
    the persist also evicted other queries' memoized artifacts in
    long-lived sessions."""
    from ..functions.partitioning import parallelize_narrow

    words = F.split(F.trim(F.col(text_col)), TOKEN_SPLIT)
    base = parallelize_narrow(df).select(
        F.col(id_col).alias("id"), words.alias("w")
    )
    grams = F.when(
        F.size("w") >= span_n,
        F.transform(
            F.sequence(F.lit(0), F.size("w") - span_n),
            lambda i: F.concat_ws(" ", F.slice("w", i + 1, span_n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    windows = base.select("id", F.posexplode(grams).alias("start", "g"))
    dup_grams = (
        windows.select("id", "g")
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("gdf"))
        .filter(F.col("gdf") >= min_docs)
        .select("g")
    )
    covered = (
        windows.join(dup_grams, "g", "left_semi")
        .select(
            "id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + span_n - 1)
            ).alias("idx"),
        )
        .distinct()
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("idx")).alias("cov"))
    )
    masked = F.filter(
        "w", lambda x, i: ~F.coalesce(F.array_contains("cov", i), F.lit(False))
    )
    return (
        base.join(covered, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.size("w").cast("long").alias("n_tokens"),
            F.coalesce(F.size("cov"), F.lit(0))
            .cast("long")
            .alias("n_removed_tokens"),
            F.md5(F.concat_ws(" ", masked)).alias("retained_hash"),
        )
    )


def exact_substring_dedup_sql(
    source_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_n: int = 8,
    min_docs: int = 2,
) -> str:
    """DuckDB twin of :func:`exact_substring_dedup`."""
    words = f"string_split_regex(trim({text_col}), '\\s+')"
    return f"""
with src as (
  select {id_col} as id, {words} as w from ({source_sql})
),
toks as (
  select id, unnest(range(0, len(w))) as idx, w from src
),
tok as (
  select id, idx, w[idx + 1] as tok from toks
),
starts as (
  select id, unnest(range(0, greatest(len(w) - {span_n} + 1, 0))) as start, w
  from src
),
windows as (
  select id, start,
         array_to_string(list_slice(w, start + 1, start + {span_n}), ' ') as g
  from starts
),
dup_grams as (
  select g from (select distinct id, g from windows)
  group by g having count(*) >= {min_docs}
),
covered as (
  select distinct id, idx from (
    select id, unnest(range(start, start + {span_n})) as idx
    from windows where g in (select g from dup_grams)
  )
),
totals as (select id, count(*) as n_tokens from tok group by id),
removed as (select id, count(*) as n_removed_tokens from covered group by id),
retained as (
  select t.id, md5(array_to_string(list(t.tok order by t.idx), ' '))
           as retained_hash
  from tok t anti join covered c on t.id = c.id and t.idx = c.idx
  group by t.id
)
select s.id as {id_col},
       cast(coalesce(tt.n_tokens, 0) as bigint) as n_tokens,
       cast(coalesce(r.n_removed_tokens, 0) as bigint) as n_removed_tokens,
       coalesce(re.retained_hash, md5('')) as retained_hash
from src s
left join totals tt on s.id = tt.id
left join removed r on s.id = r.id
left join retained re on s.id = re.id
"""
