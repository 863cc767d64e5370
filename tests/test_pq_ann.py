"""Product-quantization ANN (operators/similarity.py::pq_ann_topk):
codebook shape, encode determinism, and twin recall with/without the
exact re-rank stage on the planted-twin corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_scd2_utils_spark import entry as em
from dbt_scd2_utils_spark.operators.similarity import (
    brute_force_topk,
    pq_ann_topk,
    pq_codebooks,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    return em.emb_corpus(spark, SF).persist()


def test_codebook_shape_and_determinism(spark, corpus):
    b1 = pq_codebooks(corpus, dim=64, m=4, ksub=8, id_col="vec_id", vec_col="v")
    rows = b1.collect()
    subs = {r.sub_id for r in rows}
    assert subs == {0, 1, 2, 3}
    assert all(len(r.cv) == 16 for r in rows)
    # ≤ ksub centroids per subspace (clusters may drop); deterministic rerun
    per = {}
    for r in rows:
        per[r.sub_id] = per.get(r.sub_id, 0) + 1
    assert all(c <= 8 for c in per.values())
    b2 = {(r.sub_id, r.cent_id): r.cv for r in pq_codebooks(
        corpus, dim=64, m=4, ksub=8, id_col="vec_id", vec_col="v"
    ).collect()}
    assert {(r.sub_id, r.cent_id): r.cv for r in rows} == b2


def test_dim_must_divide():
    with pytest.raises(ValueError):
        pq_codebooks(None, dim=64, m=5)


def test_twin_recall_adc_and_rerank(spark, corpus):
    q = corpus.filter(F.col("vec_id") >= 10000)
    bf = brute_force_topk(corpus, q, k=1, id_col="vec_id", vec_col="v")
    strong = {
        r.query_id: r.neighbor_id
        for r in bf.collect()
        if r.cosine_sim >= 0.9
    }
    assert strong, "planted-twin corpus must contain strong pairs"

    def recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        return sum(
            1 for qid, nn in strong.items() if nn in got.get(qid, set())
        ) / len(strong)

    # ADC alone is only the CANDIDATE generator — a coarse floor; the
    # deployable guarantee is the re-ranked one below
    adc = pq_ann_topk(
        corpus, q, dim=64, k=5, m=8, ksub=16, id_col="vec_id", vec_col="v"
    )
    assert recall(adc) >= 0.6
    rr = pq_ann_topk(
        corpus, q, dim=64, k=5, m=8, ksub=16, rerank=50,
        id_col="vec_id", vec_col="v",
    )
    assert recall(rr) >= 0.95
    # re-ranked output carries the exact cosine
    assert "cosine_sim" in rr.columns


def test_ivf_pq_candidates_subset_and_recall(spark, corpus):
    from dbt_scd2_utils_spark.operators.similarity import ivf_pq_topk

    q = corpus.filter(F.col("vec_id") >= 10000).limit(30)
    out = ivf_pq_topk(
        corpus, q, dim=64, k=5, n_cells=8, nprobe=3, m=8, ksub=16,
        id_col="vec_id", vec_col="v",
    )
    rows = out.collect()
    # top-k per query, ranks contiguous from 1
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())
    # nprobe=8 == exhaustive cells must find at least as much ADC mass
    # as nprobe=1 for every query (cell pruning only ever removes
    # candidates)
    full = ivf_pq_topk(
        corpus, q, dim=64, k=1, n_cells=8, nprobe=8, m=8, ksub=16,
        id_col="vec_id", vec_col="v",
    )
    one = ivf_pq_topk(
        corpus, q, dim=64, k=1, n_cells=8, nprobe=1, m=8, ksub=16,
        id_col="vec_id", vec_col="v",
    )
    f = {r.query_id: r.score_micro for r in full.collect()}
    o = {r.query_id: r.score_micro for r in one.collect()}
    assert all(f[qid] >= o.get(qid, -10**15) for qid in f)


def test_ivf_pq_index_append_equals_rebuild(spark, corpus):
    """ivf_pq_index_append (encode-only fold-in under fixed artifacts)
    must equal ivf_pq_encode of the union — the maintenance claim the
    ann_ivf_pq_append gate rests on."""
    from dbt_scd2_utils_spark.operators.similarity import (
        _barrier,
        _l2_normalize,
        ivf_pq_encode,
        ivf_pq_index_append,
        kmeans_centroids,
    )

    small = corpus.filter(F.col("vec_id") < 400)
    base = small.filter(F.col("vec_id") % 5 != 0)
    new = small.filter(F.col("vec_id") % 5 == 0)
    coarse = _barrier(
        kmeans_centroids(
            base.select(
                F.col("vec_id").alias("pid"),
                _l2_normalize(F.col("v").cast("array<double>")).alias("nv"),
            ),
            k=4, iters=2, id_col="pid", vec_col="nv",
        )
    )
    from dbt_scd2_utils_spark.operators.similarity import pq_codebooks

    books = _barrier(
        pq_codebooks(base, dim=64, m=4, ksub=8, id_col="vec_id", vec_col="v")
    )
    enc = lambda df: ivf_pq_encode(  # noqa: E731
        df, 64, coarse, books, m=4, id_col="vec_id", vec_col="v"
    )
    appended = ivf_pq_index_append(
        enc(base), new, dim=64, coarse=coarse, codebooks=books, m=4,
        id_col="vec_id", vec_col="v",
    )
    rebuilt = enc(small)
    assert appended.exceptAll(rebuilt).count() == 0
    assert rebuilt.exceptAll(appended).count() == 0


def test_ivf_pq_index_save_load_roundtrip(spark, corpus, tmp_path):
    """save_ivf_pq_index (cell-partitioned parquet) + load must be
    value- and type-identical to the in-memory encoding, and the
    coarse/codebook artifacts round-trip through their own savers."""
    from dbt_scd2_utils_spark.operators.similarity import (
        _barrier,
        _l2_normalize,
        ivf_pq_encode,
        kmeans_centroids,
        load_centroids,
        load_codebooks,
        load_ivf_pq_index,
        pq_codebooks,
        save_centroids,
        save_codebooks,
        save_ivf_pq_index,
    )

    small = corpus.filter(F.col("vec_id") < 300)
    coarse = _barrier(
        kmeans_centroids(
            small.select(
                F.col("vec_id").alias("pid"),
                _l2_normalize(F.col("v").cast("array<double>")).alias("nv"),
            ),
            k=4, iters=1, id_col="pid", vec_col="nv",
        )
    )
    books = _barrier(
        pq_codebooks(small, dim=64, m=4, ksub=8, id_col="vec_id", vec_col="v")
    )
    enc = ivf_pq_encode(
        small, 64, coarse, books, m=4, id_col="vec_id", vec_col="v"
    )
    save_ivf_pq_index(enc, str(tmp_path / "idx"))
    back = load_ivf_pq_index(spark, str(tmp_path / "idx"))
    assert dict(back.dtypes) == dict(enc.dtypes)
    assert back.exceptAll(enc).count() == 0
    assert enc.exceptAll(back).count() == 0
    save_centroids(coarse, str(tmp_path / "crs"))
    save_codebooks(books, str(tmp_path / "bks"))
    assert load_centroids(spark, str(tmp_path / "crs")).count() == coarse.count()
    assert load_codebooks(spark, str(tmp_path / "bks")).count() == books.count()


def test_ivf_pq_disk_index_probe_prunes_partitions(spark, corpus):
    """save/load round trip at the probe level: probing the on-disk
    cell-partitioned encoding is value-identical to probing the
    in-memory one, and the scan carries a dynamic-partition-pruning
    filter on cell (the probe reads its nprobe cells, not the whole
    inverted file — same story as the BM25 term buckets)."""
    import tempfile

    from dbt_scd2_utils_spark.operators.similarity import (
        _barrier,
        _l2_normalize,
        ivf_pq_encode,
        ivf_pq_topk,
        kmeans_centroids,
        load_ivf_pq_index,
        pq_codebooks,
        save_ivf_pq_index,
    )

    small = corpus.filter(F.col("vec_id") < 400)
    coarse = _barrier(
        kmeans_centroids(
            small.select(
                F.col("vec_id").alias("pid"),
                _l2_normalize(F.col("v").cast("array<double>")).alias("nv"),
            ),
            k=8, iters=1, id_col="pid", vec_col="nv",
        )
    )
    books = _barrier(
        pq_codebooks(small, dim=64, m=4, ksub=8, id_col="vec_id", vec_col="v")
    )
    enc = ivf_pq_encode(
        small, 64, coarse, books, m=4, id_col="vec_id", vec_col="v"
    )
    qs = small.filter(F.col("vec_id") < 8)
    probe = lambda e: ivf_pq_topk(  # noqa: E731
        small, qs, dim=64, k=5, nprobe=2, m=4,
        id_col="vec_id", vec_col="v",
        coarse=coarse, codebooks=books, encoded=e,
    )
    direct = probe(enc).toPandas()
    base = tempfile.mkdtemp(prefix="t_ivfpq_idx_")
    save_ivf_pq_index(enc, f"{base}/idx")
    disk = probe(load_ivf_pq_index(spark, f"{base}/idx"))
    got = disk.toPandas()
    key = ["query_id", "rank"]
    assert (
        got.sort_values(key).reset_index(drop=True).astype(str)
        .equals(direct.sort_values(key).reset_index(drop=True).astype(str))
    )
    plan = disk._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()


def test_knn_graph_pq_matches_duckdb_and_keeps_twins(spark):
    """knn_graph_pq (SDC-scored graph): Spark ≡ the DuckDB twin
    value-for-value, and the planted twins survive quantization — the
    recall claim the BASELINE §round-7c remedy rests on."""
    import random

    import duckdb

    from dbt_scd2_utils_spark.operators.similarity import (
        knn_graph,
        knn_graph_pq,
        knn_graph_pq_sql,
    )

    rng = random.Random(7)
    rows = []
    for i in range(120):
        if i >= 60 and i % 2 == 0:
            v = list(rows[i - 60][1])
            v[rng.randrange(16)] += 0.3
        else:
            v = [rng.gauss(0, 1) for _ in range(16)]
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(k=3, dims=16, m=4, ksub=8, bands=8, rows_per_band=4)

    got = knn_graph_pq(df, **kw).toPandas()
    con = duckdb.connect()
    con.register("emb", df.toPandas())
    want = con.sql(knn_graph_pq_sql("select * from emb", **kw)).df()
    key = ["src", "dst"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert g[w.columns].astype(str).equals(w.astype(str))

    # every planted twin edge the EXACT graph finds, the SDC graph keeps
    exact = knn_graph(df, k=3, dims=16, bands=8, rows_per_band=4).toPandas()
    twins = {(i, i - 60) for i in range(60, 120, 2)}
    def hits(d):
        return {(s, t) for s, t in twins if ((d.src == s) & (d.dst == t)).any()}
    assert hits(g) >= hits(exact)
    assert len(hits(exact)) > 20


def test_knn_graph_pq_vectorized_encode_identical(spark):
    """vectorized_encode=True (numpy-matmul encode) must leave the graph
    bit-identical to the HOF default — same pin as the ivf_pq build."""
    import random

    from dbt_scd2_utils_spark.operators.similarity import knn_graph_pq

    rng = random.Random(11)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(k=3, dims=16, m=4, ksub=8, bands=8, rows_per_band=4)
    key = ["src", "dst"]
    a = knn_graph_pq(df, **kw).toPandas().sort_values(key).reset_index(drop=True)
    b = (
        knn_graph_pq(df, vectorized_encode=True, **kw)
        .toPandas().sort_values(key).reset_index(drop=True)
    )
    assert a.astype(str).equals(b[a.columns].astype(str))


def test_knn_graph_pq_rerank_recovers_true_cosines(spark):
    """rerank=C (IVFADC+R): Spark ≡ the DuckDB twin, the output carries
    TRUE cosines (bit-equal to the exact graph's on shared edges), and
    every planted twin survives."""
    import random

    import duckdb

    from dbt_scd2_utils_spark.operators.similarity import (
        knn_graph,
        knn_graph_pq,
        knn_graph_pq_sql,
    )

    rng = random.Random(7)
    rows = []
    for i in range(120):
        if i >= 60 and i % 2 == 0:
            v = list(rows[i - 60][1])
            v[rng.randrange(16)] += 0.3
        else:
            v = [rng.gauss(0, 1) for _ in range(16)]
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(k=3, dims=16, m=4, ksub=8, bands=8, rows_per_band=4)

    got = knn_graph_pq(df, rerank=10, **kw).toPandas()
    con = duckdb.connect()
    con.register("emb", df.toPandas())
    want = con.sql(
        knn_graph_pq_sql("select * from emb", rerank=10, **kw)
    ).df()
    key = ["src", "dst"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert g[w.columns].astype(str).equals(w.astype(str))

    exact = knn_graph(df, k=3, dims=16, bands=8, rows_per_band=4).toPandas()
    merged = g.merge(exact, on=key, suffixes=("_pq", "_ex"))
    assert (merged.cosine_sim_pq == merged.cosine_sim_ex).all()
    twins = {(i, i - 60) for i in range(60, 120, 2)}
    kept = {(s, t) for s, t in twins if ((g.src == s) & (g.dst == t)).any()}
    assert len(kept) == len(twins)
