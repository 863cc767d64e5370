"""Duplicate-cluster resolution: candidate pairs → connected components →
one canonical document per cluster.

Beyond-reference surface (BASELINE.json north-star): the pair generators
(``dedup.minhash_lsh_pairs``, ``similarity.embedding_cosine_dedup``) emit
*edges*; a corpus-curation pipeline needs the transitive closure of those
edges — if A~B and B~C, exactly one of {A, B, C} survives — which is a
connected-components problem.

Algorithm: iterative min-label propagation entirely in DataFrame ops.  Each
round every node adopts the smallest component id among itself and its
neighbors (one equi-join shuffle + one groupBy shuffle, both keyed on node
id), so a round costs O(E) and the label table is re-checkpointed to keep
the plan flat.  Rounds needed = graph diameter.  Near-duplicate clusters
are dense (LSH buckets emit near-cliques), so diameters of 2-4 dominate
and the loop converges in a handful of rounds; for adversarially long path
graphs the alternating large-star/small-star formulation (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) converges in
O(log n) rounds — the loop structure below accepts that variant without
interface change.

Convergence detection is exact and cheap: labels only ever decrease, so the
label-sum (accumulated as decimal(38,0) — immune to 64-bit wrap at corpus
scale) strictly decreases until the fixpoint; one tiny agg job per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every node appearing in ``pairs``;
    ``component`` is the minimum node id in the node's connected component.

    ``max_iter`` bounds the worst case (path graphs); the loop exits as
    soon as a round changes nothing.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
        .persist()
    )
    # Every node seeds its own component.  localCheckpoint (eager) both
    # materializes the seed and truncates lineage — without it each round
    # appends a join+agg onto an ever-deeper plan and analysis cost grows
    # quadratically.  On a cluster with a checkpoint dir, checkpoint() gives
    # the same barrier with durability.
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(
        F.sum(F.col("component").cast("decimal(38,0)"))
    ).first()[0]
    for _ in range(max_iter):
        neighbor_min = (
            edges.alias("e")
            .join(labels.alias("l"), F.col("e.src") == F.col("l.id"))
            .groupBy(F.col("e.dst").alias("id"))
            .agg(F.min("l.component").alias("nmin"))
        )
        labels = (
            labels.alias("l")
            .join(neighbor_min.alias("n"), F.col("l.id") == F.col("n.id"), "left")
            .select(
                F.col("l.id").alias("id"),
                F.least(
                    F.col("l.component"),
                    F.coalesce(F.col("n.nmin"), F.col("l.component")),
                ).alias("component"),
            )
            .localCheckpoint()
        )
        new_sum = labels.agg(
            F.sum(F.col("component").cast("decimal(38,0)"))
        ).first()[0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    edges.unpersist()
    return labels


def connected_components_sql(
    pairs_sql: str, id_a: str = "id_a", id_b: str = "id_b"
) -> str:
    """DuckDB oracle: transitive closure by recursive CTE (fine at oracle
    scale; the Spark side exists precisely because this is O(V·E) and
    single-node)."""
    return f"""
with recursive edges as (
  select {id_a} as src, {id_b} as dst from ({pairs_sql})
  union all
  select {id_b} as src, {id_a} as dst from ({pairs_sql})
),
reach(src, dst) as (
  select distinct src, src as dst from edges
  union
  select r.src, e.dst from reach r join edges e on r.dst = e.src
)
select src as id, min(dst) as component from reach group by src
"""


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve candidate pairs into per-document survivorship:
    (id_col, cluster_rep, is_canonical) over the WHOLE corpus — documents in
    no pair are their own representative; exactly one document per cluster
    (the min id) has ``is_canonical = true``, so
    ``filter(is_canonical)`` is the deduplicated corpus.

    The component table is sized by documents-that-have-a-duplicate, not
    the corpus; the final left join shuffles on ``id_col`` (or broadcasts
    when the component table is small — left to AQE, which sees its
    post-checkpoint size exactly)."""
    cc = connected_components(pairs, id_a, id_b, max_iter)
    rep = F.coalesce(F.col("cc.component"), F.col(f"d.{id_col}"))
    return (
        df.alias("d")
        .join(cc.alias("cc"), F.col(f"d.{id_col}") == F.col("cc.id"), "left")
        .select(
            F.col(f"d.{id_col}").alias(id_col),
            rep.alias("cluster_rep"),
            (rep == F.col(f"d.{id_col}")).alias("is_canonical"),
        )
    )


def dedup_clusters_sql(
    source_sql: str,
    pairs_sql: str,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> str:
    cc_sql = connected_components_sql(pairs_sql, id_a, id_b)
    return f"""
with cc as ({cc_sql})
select d.{id_col} as {id_col},
       coalesce(cc.component, d.{id_col}) as cluster_rep,
       coalesce(cc.component, d.{id_col}) = d.{id_col} as is_canonical
from ({source_sql}) d left join cc on d.{id_col} = cc.id
"""


def dedup_survivors(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "quality",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Quality-aware survivorship: like :func:`dedup_clusters`, but the
    per-cluster survivor is the member with the HIGHEST ``quality_col``
    (tie → min id) instead of blindly the min id — the policy real
    curation pipelines want ("of N near-duplicate crawls keep the
    longest / highest-LM-scored one", cf. the best-copy selection in
    C4/RefinedWeb-style dedup).

    Output: ``(id_col, cluster_rep, quality_col, is_survivor)`` over the
    whole corpus; singletons survive trivially.  ``quality_col`` must be
    engine-exact (an integer count or micro-quantized score) for the
    cross-engine twin :func:`dedup_survivors_sql` to tiebreak
    identically.

    Scale shape: component resolution is :func:`connected_components`
    (rounds = cluster diameter); the survivor pick is ONE window over
    ``cluster_rep`` — cluster sizes are duplicate-group sizes (small by
    construction after LSH banding), so the window never sees a
    corpus-sized partition."""
    clustered = dedup_clusters(df, pairs, id_col, id_a, id_b, max_iter)
    joined = clustered.select(id_col, "cluster_rep").join(
        df.select(id_col, quality_col), id_col
    )
    w = Window.partitionBy("cluster_rep").orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    return joined.select(
        id_col,
        "cluster_rep",
        quality_col,
        (F.row_number().over(w) == 1).alias("is_survivor"),
    )


def dedup_survivors_sql(
    source_sql: str,
    pairs_sql: str,
    id_col: str = "doc_id",
    quality_col: str = "quality",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> str:
    """DuckDB twin of :func:`dedup_survivors`."""
    clusters = dedup_clusters_sql(source_sql, pairs_sql, id_col, id_a, id_b)
    return f"""
with clustered as ({clusters})
select s.{id_col}, c.cluster_rep, s.{quality_col},
       row_number() over (
         partition by c.cluster_rep
         order by s.{quality_col} desc, s.{id_col} asc
       ) = 1 as is_survivor
from clustered c join ({source_sql}) s on c.{id_col} = s.{id_col}
"""


def dup_rate_report(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "source",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Per-``group_col`` duplication observability: how much of each
    domain/source is near-duplicate mass — ``(group_col, n_docs,
    n_duplicates, dup_bp)`` where ``n_duplicates`` counts non-canonical
    cluster members and ``dup_bp`` is exact basis points (integer div,
    identical truncation in both engines).  The table that tells you
    WHICH crawls/domains to fix upstream, before paying to dedup them
    forever.

    Scale shape: :func:`dedup_clusters` resolution + one
    map-side-combined groupBy on the group key."""
    clustered = dedup_clusters(df, pairs, id_col, id_a, id_b)
    return (
        clustered.join(df.select(id_col, group_col), id_col)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((~F.col("is_canonical")).cast("long")).alias(
                "n_duplicates"
            ),
        )
        .select(
            group_col,
            "n_docs",
            "n_duplicates",
            F.expr("n_duplicates * 10000 div n_docs").alias("dup_bp"),
        )
    )


def dup_rate_report_sql(
    source_sql: str,
    pairs_sql: str,
    id_col: str = "doc_id",
    group_col: str = "source",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> str:
    """DuckDB twin of :func:`dup_rate_report`."""
    clusters = dedup_clusters_sql(source_sql, pairs_sql, id_col, id_a, id_b)
    return f"""
with clustered as ({clusters})
select s.{group_col},
       cast(count(*) as bigint) as n_docs,
       cast(sum(case when c.is_canonical then 0 else 1 end) as bigint)
         as n_duplicates,
       cast(sum(case when c.is_canonical then 0 else 1 end) * 10000
            // count(*) as bigint) as dup_bp
from clustered c join ({source_sql}) s on c.{id_col} = s.{id_col}
group by s.{group_col}
"""
