"""Corpus-scale BPE merge learning (tokenizer training).

Beyond-reference surface: the byte-pair-encoding merge-table learner of
Sennrich et al., "Neural Machine Translation of Rare Words with Subword
Units" (ACL'16) — the algorithm behind GPT-2/RoBERTa-style tokenizers —
re-expressed as DataFrame ops.

The classical trick that makes this tractable at corpus scale is built
in: BPE statistics depend only on the WORD-FREQUENCY table, not the raw
token stream.  One corpus pass builds (word, freq); every merge
iteration then runs over the distinct-word vocabulary (Heaps' law:
vocab ≪ corpus, and it SHRINKS as merges fuse symbols) with the
frequency as a weight.  Per iteration: one map-side-combined pair count
over the exploded symbols, a 1-ROW driver collect for the argmax pair (a
scalar plan decision, same budget class as k-means' convergence check),
and one window pass to apply the merge.  State is localCheckpoint'ed per
round so the plan stays flat (same pattern as
clustering.connected_components).

Overlap semantics (pinned by tests and the oracle): merges apply
LEFTMOST-FIRST and non-overlapping — in a run of identical matching
pairs ('aaaa' under merge (a,a)) positions at even offset from the run
start merge: 'aaaa' → 'aa','aa'.  Expressed as a gap-islands window (run
grouping) + offset parity, identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

END_MARK = "</w>"

_CHARS = "concat(regexp_extract_all(w, '.', 0), array('</w>'))"


def _word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    words = (
        df.select(
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("w")
        )
        .filter(F.col("w") != "")
    )
    return words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))


def learn_bpe_merges(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges over the corpus:
    ``(merge_rank, left, right, pair_count)``, ranked in learning order;
    ``pair_count`` is the corpus-weighted frequency of the pair when it
    was chosen.  Ties break (count desc, left asc, right asc) — fully
    deterministic, so the DuckDB twin :func:`learn_bpe_merges_sql`
    reproduces the exact same table.

    Words are lowercased whitespace tokens; initial symbols are unicode
    characters plus a ``</w>`` end-of-word marker (so merges distinguish
    word-final units, as in the original algorithm)."""
    merges, _ = _learn(df, n_merges, text_col)
    return df.sparkSession.createDataFrame(
        merges,
        "merge_rank long, left string, right string, pair_count long",
    )


def _learn(
    df: DataFrame, n_merges: int, text_col: str
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Run the merge-learning loop; returns (merge list, final per-word
    symbol state) — the state IS the segmentation of every corpus word
    under the learned merges, which :func:`bpe_token_counts` reuses."""
    spark = df.sparkSession
    state = (
        _word_vocab(df, text_col)
        .select("w", "freq", F.expr(_CHARS).alias("syms"))
        .localCheckpoint()
    )
    wl = Window.partitionBy("w").orderBy("pos")
    wrun = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        # persisted: consumed twice per round (the argmax count and the
        # merge application) — without the barrier the explode+window
        # recomputes and each round costs ~2× its data pass
        ex = (
            state.select(
                "w", "freq", F.posexplode("syms").alias("pos", "sym")
            )
            .withColumn("nxt", F.lead("sym").over(wl))
            .persist()
        )
        best = (
            ex.filter(F.col("nxt").isNotNull())
            .groupBy("sym", "nxt")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("sym").asc(), F.col("nxt").asc())
            .limit(1)
            .collect()
        )
        if not best:
            ex.unpersist()
            break
        left, right, cnt = best[0]["sym"], best[0]["nxt"], int(best[0]["cnt"])
        merges.append((rank, left, right, cnt))
        t = (
            ex.withColumn(
                "m", (F.col("sym") == left) & (F.col("nxt") == right)
            )
            .withColumn("mcount", F.sum(F.col("m").cast("int")).over(wrun))
            .withColumn(
                "grp", F.when(F.col("m"), F.col("pos") - F.col("mcount"))
            )
        )
        wg = Window.partitionBy("w", "grp")
        t = (
            t.withColumn(
                "gmin", F.min(F.when(F.col("m"), F.col("pos"))).over(wg)
            )
            .withColumn(
                "merge_at",
                F.col("m") & (((F.col("pos") - F.col("gmin")) % 2) == 0),
            )
            .withColumn(
                "consumed",
                F.coalesce(F.lag("merge_at").over(wl), F.lit(False)),
            )
            .withColumn(
                "tok",
                F.when(F.col("merge_at"), F.concat("sym", "nxt")).otherwise(
                    F.when(~F.col("consumed"), F.col("sym"))
                ),
            )
        )
        state = (
            t.filter(F.col("tok").isNotNull())
            .groupBy("w", "freq")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ).alias("syms")
            )
            .localCheckpoint()
        )
        ex.unpersist()
    return merges, state


def bpe_token_counts(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    learned: tuple | None = None,
) -> DataFrame:
    """Tokenize the corpus under its own learned BPE merges and count:
    ``(id, n_words, n_bpe_tokens)`` per document — the sequence-length
    accounting a packing/budgeting pipeline needs under the REAL subword
    vocabulary instead of the whitespace proxy.

    Scale shape: the segmentation lives on the (small, shrinking) word
    vocabulary; documents join their words against it — one shuffle on
    the word key (or a broadcast when the vocab fits) — and aggregate
    map-side.  The raw text is never re-tokenized per merge round."""
    _, state = learned if learned is not None else _learn(
        df, n_merges, text_col
    )
    # piece count = symbol-list length; the </w> marker counts as a
    # symbol until a merge fuses it into the final subword — identical
    # accounting in the oracle (len(syms)).
    pieces = state.select("w", F.size("syms").alias("n_pieces"))
    words = (
        df.select(
            F.col(id_col),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    return (
        words.join(pieces, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_pieces").alias("n_bpe_tokens"),
        )
        .select(
            id_col,
            F.col("n_words").cast("long").alias("n_words"),
            F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
        )
    )


def bpe_token_counts_sql(
    source_sql: str,
    n_merges: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`bpe_token_counts` — reuses the learn
    chain's final state{N} (the segmented vocabulary)."""
    learn = learn_bpe_merges_sql(source_sql, n_merges, text_col)
    # strip the trailing merge-table select; keep the CTE chain
    chain = learn[: learn.rindex("\nselect cast(1 as bigint)")]
    return f"""{chain}
, pieces as (
  select w, len(syms) as n_pieces from state{n_merges}
),
docwords as (
  select {id_col}, w from (
    select {id_col},
           unnest(string_split_regex(lower(trim({text_col})), '\\s+')) as w
    from ({source_sql})
  ) where w <> ''
)
select d.{id_col},
       cast(count(*) as bigint) as n_words,
       cast(sum(p.n_pieces) as bigint) as n_bpe_tokens
from docwords d join pieces p using (w)
group by d.{id_col}
"""


def learn_bpe_merges_sql(
    source_sql: str,
    n_merges: int = 10,
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`learn_bpe_merges` — the same iteration
    unrolled as generated CTE chains (state{i} → pairs{i} → best{i});
    positions come from DuckDB's zipping parallel unnest."""
    sql = f"""
vocab as (
  select w, count(*) as freq from (
    select unnest(string_split_regex(lower(trim({text_col})), '\\s+')) as w
    from ({source_sql})
  ) where w <> ''
  group by w
),
state0 as materialized (
  select w, freq,
         list_concat(regexp_extract_all(w, '.'), ['</w>']) as syms
  from vocab
)"""
    for i in range(1, n_merges + 1):
        p = i - 1
        sql += f""",
ex{i} as materialized (
  select w, freq, pos, sym,
         lead(sym) over (partition by w order by pos) as nxt
  from (
    select w, freq,
           unnest(range(len(syms))) as pos,
           unnest(syms) as sym
    from state{p}
  )
),
best{i} as materialized (
  select sym as l, nxt as r, cast(sum(freq) as bigint) as cnt
  from ex{i} where nxt is not null
  group by sym, nxt
  order by cnt desc, l asc, r asc
  limit 1
),
marked{i} as materialized (
  select e.*,
         (e.sym = b.l and e.nxt = b.r) as m,
         sum(case when e.sym = b.l and e.nxt = b.r then 1 else 0 end)
           over (partition by e.w order by e.pos
                 rows between unbounded preceding and current row) as mcount
  from ex{i} e, best{i} b
),
grouped{i} as materialized (
  select *,
         case when m then pos - mcount end as grp
  from marked{i}
),
flagged{i} as materialized (
  select *,
         m and ((pos - min(case when m then pos end)
                   over (partition by w, grp)) % 2 = 0) as merge_at
  from grouped{i}
),
toks{i} as materialized (
  select w, freq, pos,
         case when merge_at then sym || nxt
              when coalesce(lag(merge_at) over (
                     partition by w order by pos), false) then null
              else sym end as tok
  from flagged{i}
),
state{i} as materialized (
  select w, freq, list(tok order by pos) as syms
  from toks{i} where tok is not null
  group by w, freq
)"""
    union = "\nunion all\n".join(
        f"select cast({i} as bigint) as merge_rank, l as \"left\", "
        f"r as \"right\", cnt as pair_count from best{i}"
        for i in range(1, n_merges + 1)
    )
    return f"with {sql}\n{union}"
