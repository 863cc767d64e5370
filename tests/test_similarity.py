"""Banded hyperplane LSH: plan shape (equi-join on (band, sig), no
nested-loop), recall on planted near-duplicates, and ANN candidate
containment in the brute-force ranking."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from dbt_scd2_utils_spark.operators.similarity import (
    banded_hyperplanes,
    brute_force_topk,
    embedding_cosine_dedup,
    lsh_ann_topk,
)

DIMS = 16


def _vec(seed: str) -> list[float]:
    return [
        int(hashlib.md5(f"{seed}-{d}".encode()).hexdigest()[:8], 16) / 2**31 - 1.0
        for d in range(DIMS)
    ]


@pytest.fixture(scope="module")
def corpus(spark):
    base = [(i, _vec(f"v{i}")) for i in range(40)]
    # planted near-duplicates: tiny perturbation of one coordinate
    dups = [
        (1000 + i, [v[0] + 0.01] + v[1:]) for i, v in base if i % 4 == 0
    ]
    return spark.createDataFrame(
        base + dups, "vec_id int, embedding array<double>"
    ).cache()


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_ann_plan_is_banded_equijoin(corpus):
    out = lsh_ann_topk(
        corpus, corpus.filter(F.col("vec_id") < 3), k=3, dims=DIMS
    )
    plan = _physical_plan(out)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the candidate join hashes on the band and signature columns
    m = re.search(
        r"(?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)(?:Exec)?"
        r" \[([^\]]*)\], \[([^\]]*)\]",
        plan,
    )
    assert m, f"no equi-join in plan:\n{plan}"
    assert "band" in m.group(1) and "sig" in m.group(1)


def test_dedup_plan_is_banded_equijoin(corpus):
    out = embedding_cosine_dedup(corpus, threshold=0.99, dims=DIMS)
    plan = _physical_plan(out)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    m = re.search(
        r"(?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)(?:Exec)?"
        r" \[([^\]]*)\], \[([^\]]*)\]",
        plan,
    )
    assert m, f"no equi-join in plan:\n{plan}"
    assert "band" in m.group(1) and "sig" in m.group(1)


def test_dedup_recall_on_planted_duplicates(corpus):
    """Banding (b=8, r=8) must recover planted near-dup pairs that the
    old single-band design missed; every reported pair must verify."""
    found = {
        (r["id_a"], r["id_b"])
        for r in embedding_cosine_dedup(corpus, threshold=0.99, dims=DIMS).collect()
    }
    planted = {(i, 1000 + i) for i in range(0, 40, 4)}
    recall = len(found & planted) / len(planted)
    assert recall >= 0.8, f"recall {recall}: {sorted(planted - found)}"
    # no false positives below threshold (verification is exact)
    for r in embedding_cosine_dedup(corpus, threshold=0.99, dims=DIMS).collect():
        assert r["cosine_sim"] >= 0.99


def test_ann_results_subset_of_bruteforce_candidates(corpus):
    """Every ANN hit must appear in the exact ranking with the same score
    (ANN ⊆ brute force, scores identical)."""
    q = corpus.filter(F.col("vec_id") < 3)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine_sim"]
        for r in brute_force_topk(corpus, q, k=10**6).collect()
    }
    for r in lsh_ann_topk(corpus, q, k=5, dims=DIMS).collect():
        key = (r["query_id"], r["neighbor_id"])
        assert key in exact
        assert exact[key] == r["cosine_sim"]


def test_numpy_sigs_exactly_match_hof_reference(corpus):
    """The vectorized numpy signature path (the engine hot path inside
    _banded) must produce EXACTLY the HOF reference's signatures — the
    quantized-integer dot guarantees this with no fold-order caveats.
    Checked on float32 input too (the real embeddings table is
    array<float>)."""
    from dbt_scd2_utils_spark.operators.similarity import (
        _banded,
        banded_hyperplanes,
        banded_sigs,
    )

    bhp = banded_hyperplanes(DIMS, bands=4, rows_per_band=6)
    for cast_to in ("array<double>", "array<float>"):
        df = corpus.select(
            "vec_id", F.col("embedding").cast(cast_to).alias("embedding")
        )
        hof = df.select(
            F.col("vec_id").alias("id"),
            F.posexplode(
                banded_sigs(
                    F.transform("embedding", lambda x: x.cast("double")), bhp
                )
            ).alias("band", "hof_sig"),
        )
        eng = _banded(df, "id", "v", "vec_id", "embedding", bhp).select(
            "id", "band", F.col("sig").alias("eng_sig")
        )
        joined = hof.join(eng, ["id", "band"], "full_outer")
        bad = joined.filter(
            F.col("hof_sig").isNull()
            | F.col("eng_sig").isNull()
            | (F.col("hof_sig") != F.col("eng_sig"))
        ).count()
        assert bad == 0, f"{cast_to}: {bad} (id, band) rows disagree"


def test_lsh_requires_query_side_and_release_caches(corpus):
    from dbt_scd2_utils_spark.operators import similarity

    with pytest.raises(ValueError, match="query side"):
        lsh_ann_topk(corpus)
    # query_ids path persists an intermediate; release_caches frees it.
    similarity.release_caches()
    lsh_ann_topk(corpus, query_ids=[0, 1], dims=DIMS).collect()
    assert similarity.release_caches() >= 1
    assert similarity.release_caches() == 0


def test_kmeans_centroids_deterministic_and_improving(spark):
    from dbt_scd2_utils_spark.operators.similarity import (
        _dist2,
        kmeans_centroids,
    )
    from dbt_scd2_utils_spark.sources.tables import load_table
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")

    def distortion(cents):
        pts = emb.select(
            F.col("vec_id").alias("pid"),
            F.transform("embedding", lambda x: x.cast("double")).alias("pv"),
        )
        d = pts.join(F.broadcast(cents)).select(
            "pid", _dist2(F.col("pv"), F.col("cv")).alias("d2")
        )
        w = Window.partitionBy("pid").orderBy("d2")
        best = d.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
        return best.agg(F.sum("d2")).first()[0]

    c0 = kmeans_centroids(emb, k=4, iters=0)
    c2 = kmeans_centroids(emb, k=4, iters=2)
    assert distortion(c2) < distortion(c0)
    # bit-deterministic across runs
    a = sorted(map(tuple, [r["cv"] for r in c2.collect()]))
    b = sorted(map(tuple, [r["cv"] for r in kmeans_centroids(emb, k=4, iters=2).collect()]))
    assert a == b


def test_ivf_centroid_persistence_roundtrip(spark, tmp_path, corpus):
    """save_centroids/load_centroids: a probe against the loaded index is
    row-identical to probing the in-memory trained centroids."""
    from dbt_scd2_utils_spark.operators.similarity import (
        ivf_ann_topk,
        kmeans_centroids,
        load_centroids,
        save_centroids,
    )

    cents = kmeans_centroids(corpus, k=4, iters=2, vec_col="embedding")
    save_centroids(cents, str(tmp_path / "idx"))
    loaded = load_centroids(spark, str(tmp_path / "idx"))
    q = corpus.filter(F.col("vec_id") < 3)
    a = ivf_ann_topk(corpus, q, k=3, centroids=cents).collect()
    b = ivf_ann_topk(corpus, q, k=3, centroids=loaded).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)) and len(b) > 0


def test_quantize_embeddings_zero_vector_and_range(spark):
    from dbt_scd2_utils_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    out = {r.id: r.code for r in quantize_embeddings(df).collect()}
    # [3,4]/5 * 127 = [76.2, 101.6] -> [76, 102]
    assert out[1] == [76, 102]
    assert out[2] == [0, 0]


def test_ann_quantized_topk_matches_bruteforce_top1(spark, corpus):
    """int8 quantization must preserve the nearest neighbor for every probe
    query (top-1 recall 1.0 on the planted-duplicate corpus: each query's
    true top-1 is its near-identical copy, far above the quantization
    noise floor)."""
    from dbt_scd2_utils_spark.operators.similarity import ann_quantized_topk

    q = corpus.filter(F.col("vec_id") % 4 == 0).filter(F.col("vec_id") < 40)
    exact = {
        r.query_id: r.neighbor_id
        for r in brute_force_topk(corpus, q, k=1).collect()
    }
    approx = {
        r.query_id: r.neighbor_id
        for r in ann_quantized_topk(corpus, q, k=1).collect()
    }
    assert exact == approx


def test_knn_graph_ranks_and_recall(spark):
    from dbt_scd2_utils_spark.operators.similarity import knn_graph
    from dbt_scd2_utils_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    g = knn_graph(emb, k=3).persist()
    rows = g.collect()
    assert rows, "graph must be non-empty on the near-dup-bearing corpus"
    by_src = {}
    for r in rows:
        by_src.setdefault(r["src"], []).append(r)
    for src, nbrs in by_src.items():
        ranks = sorted(n["rank"] for n in nbrs)
        assert ranks == list(range(1, len(ranks) + 1))  # dense 1..k
        assert len(nbrs) <= 3
        sims = [n["cosine_sim"] for n in sorted(nbrs, key=lambda n: n["rank"])]
        assert sims == sorted(sims, reverse=True)  # rank follows cosine
        assert all(n["dst"] != src for n in nbrs)
    g.unpersist()


def test_knn_graph_recall_floor_vs_bruteforce(spark):
    """Banded-LSH k-NN must find >=90% of the TRUE nearest neighbors for
    vectors with a genuinely close neighbor (cosine >= 0.9) — the planted
    twins of the driver corpus (a missed twin is a kept duplicate for the
    semantic-dedup consumer). Recall on far "neighbors" is meaningless
    (hashing is designed to separate them). The default 16-band config
    measures 1.00 here (scripts/recall_curve.py; BASELINE.md §knn-recall)."""
    import numpy as np

    import dbt_scd2_utils_spark.entry as em
    from dbt_scd2_utils_spark.operators.similarity import knn_graph

    emb = em.emb_corpus(spark, "/root/testdata/sf0.01")
    rows = emb.collect()
    ids = [r["vec_id"] for r in rows]
    mat = np.array([r["v"] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    np.fill_diagonal(sims, -2.0)
    true_nn = {
        ids[i]: (ids[int(sims[i].argmax())], sims[i].max())
        for i in range(len(ids))
    }
    close = {i: nn for i, (nn, s) in true_nn.items() if s >= 0.9}
    assert len(close) >= 20, "planted twins must yield close pairs"

    got = {}
    for r in knn_graph(emb, k=5, id_col="vec_id", vec_col="v").collect():
        got.setdefault(r["src"], set()).add(r["dst"])
    hits = sum(1 for i, nn in close.items() if nn in got.get(i, set()))
    recall = hits / len(close)
    assert recall >= 0.9, f"recall {recall:.2f} over {len(close)} close vectors"


def test_internal_persists_are_registered(corpus):
    """Round-5 ADVICE fix: every operator-internal persist routes through
    the shared caching registry, so release_caches() frees them; a
    caller-supplied codebook is never persisted by the operator."""
    from dbt_scd2_utils_spark.operators import similarity

    emb = corpus
    similarity.release_caches()
    qs = emb.filter(emb.vec_id < 2)
    similarity.pq_ann_topk(emb, qs, dim=16, k=2, m=2, ksub=4).count()
    assert similarity.release_caches() >= 1

    # caller-owned codebooks: operator registers nothing new for them and
    # must not flip their storage level
    books = similarity.pq_codebooks(emb, dim=16, m=2, ksub=4)
    similarity.release_caches()
    similarity.pq_ann_topk(emb, qs, dim=16, k=2, m=2, ksub=4, codebooks=books).count()
    assert books.storageLevel.useMemory is False
    similarity.release_caches()


def test_lsh_disk_index_probe_equals_direct(corpus):
    """save_lsh_index/load_lsh_index round trip: probing the persisted
    band-partitioned signature table returns exactly the direct path's
    neighbors (the corpus is never re-signed at probe time)."""
    import tempfile

    from dbt_scd2_utils_spark.operators.similarity import (
        load_lsh_index,
        lsh_ann_topk,
        lsh_index,
        save_lsh_index,
    )

    emb = corpus
    spark = emb.sparkSession
    kw = dict(k=3, dims=DIMS, bands=4, rows_per_band=4)
    direct = lsh_ann_topk(emb, query_ids=range(4), **kw).toPandas()
    base = tempfile.mkdtemp(prefix="t_lsh_idx_")
    save_lsh_index(
        lsh_index(emb, dims=DIMS, bands=4, rows_per_band=4), f"{base}/idx"
    )
    got = lsh_ann_topk(
        emb, query_ids=range(4), index=load_lsh_index(spark, f"{base}/idx"), **kw
    ).toPandas()
    key = ["query_id", "rank", "neighbor_id"]
    assert (
        got.sort_values(key).reset_index(drop=True).astype(str)
        .equals(direct.sort_values(key).reset_index(drop=True).astype(str))
    )


def test_lsh_index_append_equals_rebuild(corpus):
    """Vector LSH append ≡ rebuild (signatures are per-row independent),
    and probes against the appended index see the new vectors."""
    from dbt_scd2_utils_spark.operators.similarity import (
        lsh_ann_topk,
        lsh_index,
        lsh_index_append,
    )

    emb = corpus
    old = emb.filter(emb.vec_id < 1000)
    new = emb.filter(emb.vec_id >= 1000)
    kw = dict(dims=DIMS, bands=4, rows_per_band=4)
    appended = lsh_index_append(lsh_index(old, **kw), new, **kw)
    rebuilt = lsh_index(emb, **kw)
    key = ["neighbor_id", "band"]
    a = appended.toPandas().sort_values(key).reset_index(drop=True)
    r = rebuilt.toPandas().sort_values(key).reset_index(drop=True)
    assert a.astype(str).equals(r.astype(str))

    probed = lsh_ann_topk(
        emb, k=3, query_ids=[0, 4, 8], index=appended.persist(), **kw
    )
    # the planted twins (vec_id >= 1000 copies of i % 4 == 0 rows) are
    # findable only if the appended signatures joined in
    assert probed.filter(probed.neighbor_id >= 1000).count() > 0


def test_ivf_pq_encoded_probe_equals_direct(corpus):
    """ivf_pq_encode externalizes the inverted lists + codes; a probe
    against the prebuilt encoding is value-identical to the in-call
    assignment/encode path (the sublinear probe contract)."""
    from pyspark.sql import functions as F

    from dbt_scd2_utils_spark.operators.similarity import (
        _l2_normalize,
        as_double,
        ivf_pq_encode,
        ivf_pq_topk,
        kmeans_centroids,
        pq_codebooks,
    )

    emb = corpus
    normed = emb.select(
        F.col("vec_id").alias("pid"),
        _l2_normalize(as_double("embedding")).alias("nv"),
    )
    coarse = kmeans_centroids(normed, k=4, iters=2, id_col="pid", vec_col="nv")
    books = pq_codebooks(emb, dim=DIMS, m=2, ksub=4)
    qs = emb.filter(emb.vec_id < 3)
    kw = dict(dim=DIMS, k=3, n_cells=4, nprobe=2, m=2, ksub=4,
              coarse=coarse, codebooks=books)
    direct = ivf_pq_topk(emb, qs, **kw).toPandas()
    enc = ivf_pq_encode(emb, dim=DIMS, coarse=coarse, codebooks=books, m=2)
    probed = ivf_pq_topk(emb, qs, encoded=enc, **kw).toPandas()
    key = ["query_id", "rank"]
    assert (
        probed.sort_values(key).reset_index(drop=True).astype(str)
        .equals(direct.sort_values(key).reset_index(drop=True).astype(str))
    )


def test_vectorized_assignment_matches_hof(corpus):
    """assign_cells_vectorized (numpy matmul over Arrow) picks the same
    nearest cell as the sequential-fold HOF formulation on the test
    corpus, including the lowest-cent_id tie direction."""
    from pyspark.sql import functions as F

    from dbt_scd2_utils_spark.operators.similarity import (
        _l2_normalize,
        as_double,
        ivf_pq_encode,
        kmeans_centroids,
        pq_codebooks,
    )

    emb = corpus
    normed = emb.select(
        F.col("vec_id").alias("pid"),
        _l2_normalize(as_double("embedding")).alias("nv"),
    )
    coarse = kmeans_centroids(normed, k=4, iters=2, id_col="pid", vec_col="nv")
    books = pq_codebooks(emb, dim=DIMS, m=2, ksub=4)
    hof = ivf_pq_encode(
        emb, dim=DIMS, coarse=coarse, codebooks=books, m=2
    ).toPandas()
    vec = ivf_pq_encode(
        emb, dim=DIMS, coarse=coarse, codebooks=books, m=2,
        vectorized_assign=True,
    ).toPandas()
    key = ["neighbor_id", "sub_id"]
    assert (
        vec.sort_values(key).reset_index(drop=True).astype(str)
        .equals(hof.sort_values(key).reset_index(drop=True).astype(str))
    )


def test_vectorized_kmeans_matches_hof(corpus):
    """kmeans_centroids_vectorized (matmul assignment + int64-micro
    partial sums) reproduces the HOF path's centroids exactly on the
    test corpus, both iteration depths."""
    from dbt_scd2_utils_spark.operators.similarity import (
        kmeans_centroids,
        kmeans_centroids_vectorized,
    )

    emb = corpus
    for iters in (1, 2):
        hof = {
            r.cent_id: list(r.cv)
            for r in kmeans_centroids(emb, k=4, iters=iters).collect()
        }
        vec = {
            r.cent_id: list(r.cv)
            for r in kmeans_centroids_vectorized(
                emb, k=4, iters=iters
            ).collect()
        }
        assert hof.keys() == vec.keys()
        for c in hof:
            assert hof[c] == vec[c], f"iter={iters} cent={c}"


def test_semantic_decontaminate_blocking_is_lossless(corpus):
    """The banded blocking finds every corpus-benchmark pair the exact
    all-pairs cosine join finds at the threshold; untouched vectors
    never flag (precision 1)."""
    from pyspark.sql import functions as F

    from dbt_scd2_utils_spark.operators.similarity import (
        _l2_normalize,  # noqa: F401  (import check)
        cosine,
        as_double,
        semantic_decontaminate,
    )

    emb = corpus.filter(corpus.vec_id < 1000)
    bench = corpus.filter(corpus.vec_id >= 1000).select(
        "vec_id", "embedding"
    )
    got = semantic_decontaminate(
        emb, bench, threshold=0.9, dims=DIMS, bands=8, rows_per_band=4
    )
    flagged = {r.vec_id for r in got.filter("is_contaminated").collect()}
    exact = (
        emb.alias("c")
        .crossJoin(bench.alias("b"))
        .select(
            F.col("c.vec_id").alias("cid"),
            F.round(
                cosine(as_double("c.embedding"), as_double("b.embedding")), 6
            ).alias("cos"),
        )
        .filter(F.col("cos") >= 0.9)
    )
    want = {r.cid for r in exact.collect()}
    assert flagged == want and len(want) > 0


def test_knn_graph_max_bucket_caps_floods_and_matches_duckdb(spark):
    """max_bucket on the graph builders: a 30-vector identical flood
    drops out of the candidate stream, an ordinary twin pair survives,
    and both graph flavors stay value-identical to their DuckDB twins
    under the cap."""
    import random

    import duckdb

    from dbt_scd2_utils_spark.operators.similarity import (
        knn_graph,
        knn_graph_pq,
        knn_graph_pq_sql,
        knn_graph_sql,
    )

    rng = random.Random(5)
    flood_vec = [rng.gauss(0, 1) for _ in range(16)]
    rows = [(i, list(flood_vec)) for i in range(30)]
    twin = [rng.gauss(0, 1) for _ in range(16)]
    rows += [(100, list(twin)), (101, twin[:3] + [twin[3] + 0.2] + twin[4:])]
    rows += [(200 + i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(k=3, dims=16, bands=8, rows_per_band=4)

    con = duckdb.connect()
    con.register("emb", df.toPandas())
    key = ["src", "dst"]

    g = knn_graph(df, max_bucket=10, **kw).toPandas()
    assert not ((g.src < 30) & (g.dst < 30)).any()          # flood gone
    assert ((g.src == 100) & (g.dst == 101)).any()          # twin kept
    w = con.sql(knn_graph_sql("select * from emb", max_bucket=10, **kw)).df()
    gs = g.sort_values(key).reset_index(drop=True)
    ws = w.sort_values(key).reset_index(drop=True)
    assert gs[ws.columns].astype(str).equals(ws.astype(str))

    pq_kw = dict(m=4, ksub=8, **kw)
    gq = knn_graph_pq(df, max_bucket=10, **pq_kw).toPandas()
    assert not ((gq.src < 30) & (gq.dst < 30)).any()
    wq = con.sql(
        knn_graph_pq_sql("select * from emb", max_bucket=10, **pq_kw)
    ).df()
    gqs = gq.sort_values(key).reset_index(drop=True)
    wqs = wq.sort_values(key).reset_index(drop=True)
    assert gqs[wqs.columns].astype(str).equals(wqs.astype(str))


def test_knn_graph_pq_rejects_rerank_below_k(spark):
    """rerank < k would silently return fewer than k neighbors (the
    exact re-rank filters rank <= k over only the top-rerank SDC
    candidates) — both builders refuse instead."""
    import pytest

    from dbt_scd2_utils_spark.operators.similarity import (
        knn_graph_pq,
        knn_graph_pq_sql,
    )

    df = spark.createDataFrame(
        [(0, [0.0] * 16)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="rerank"):
        knn_graph_pq(df, k=5, rerank=3, dims=16, m=4, ksub=8)
    with pytest.raises(ValueError, match="rerank"):
        knn_graph_pq_sql("select * from emb", k=5, rerank=3, dims=16, m=4)


def test_semantic_dedup_pq_matches_exact_on_planted_twins(spark):
    """Cluster parity of the scale-safe composition (knn_graph_pq with
    IVFADC+R re-rank -> threshold -> components) against the exact path
    (knn_graph -> threshold -> components) on a corpus of planted twin
    pairs among well-separated random vectors: twins sit far above the
    0.9 threshold and everything else far below, so both paths must
    produce the IDENTICAL cluster table — the evidence that consumers
    can default to the PQ graph at scale."""
    import random

    from dbt_scd2_utils_spark.operators.clustering import dedup_clusters
    from dbt_scd2_utils_spark.operators.similarity import (
        knn_graph,
        knn_graph_pq,
    )

    rng = random.Random(11)
    rows = []
    for i in range(40):
        v = [rng.gauss(0, 1) for _ in range(16)]
        rows.append((i, v))
        if i % 4 == 0:  # plant a twin: tiny perturbation, cosine ~0.999
            rows.append((1000 + i, [x + rng.gauss(0, 0.01) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(k=3, dims=16, bands=8, rows_per_band=4, id_col="vec_id",
              vec_col="embedding")

    def clusters(graph):
        edges = (
            graph.filter(F.col("cosine_sim") >= 0.9)
            .filter(F.col("src") < F.col("dst"))
            .select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
            .distinct()
        )
        out = dedup_clusters(df.select("vec_id"), edges, id_col="vec_id")
        return {(r.vec_id, r.cluster_rep, r.is_canonical) for r in out.collect()}

    exact = clusters(knn_graph(df, **kw))
    pq = clusters(knn_graph_pq(df, m=4, ksub=8, rerank=12, **kw))
    assert pq == exact
    # and the twins actually clustered (non-trivial parity)
    reps = {v: r for v, r, _ in exact}
    assert all(reps[1000 + i] == reps[i] for i in range(0, 40, 4))
