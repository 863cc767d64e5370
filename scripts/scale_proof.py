#!/usr/bin/env python
"""Scaling proof: run the three heaviest operators at two data scales whose
row counts differ 10× and record the wall-time curve (BASELINE.md §scaling).

The driver testdata tops out at sf0.1, so this script generates its own
deterministic corpora (matched distributions at both scales — near-dup rate,
users-per-event ratio, text length) under ``.scale_data/`` and compares
MY-sf0.1-equivalent vs MY-sf1: a relative curve over identically-shaped data,
which is the claim under test ("~linear in rows"), not absolute parity with
the driver generator.

Usage: python scripts/scale_proof.py [--small-only]
Prints one JSON line per (scale, operator) and a summary line with ratios.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale_data")

VOCAB = (
    "batch part spark line column order small sort fast value scan store "
    "vector query agg table hash join merge shuffle broadcast filter scale "
    "stream window state key row group page codec stats prune skew salt"
).split()


def gen_documents(n: int, seed: int) -> "pyarrow.Table":
    """Word-soup docs with an ~18% near-duplicate tail (copy an earlier doc,
    perturb ~8% of words) so minhash/cluster paths do real work."""
    import pyarrow as pa

    rng = random.Random(seed)
    texts: list[str] = []
    for i in range(n):
        if i > 0 and rng.random() < 0.18:
            words = texts[rng.randrange(max(1, i - 500), i)].split()
            for j in range(len(words)):
                if rng.random() < 0.08:
                    words[j] = rng.choice(VOCAB)
        else:
            words = [rng.choice(VOCAB) for _ in range(rng.randint(12, 60))]
        texts.append(" ".join(words))
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([["en", "zh", "de"][i % 3] for i in range(n)]),
            "source": pa.array([f"src{i % 4}" for i in range(n)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_events(n: int, seed: int) -> "pyarrow.Table":
    """Change-feed events: ~n/66 users (driver testdata ratio), one month of
    second-granular timestamps, 'error' rows acting as soft deletes."""
    import pyarrow as pa

    rng = random.Random(seed)
    users = max(50, n // 66)
    base = 1_704_067_200_000_000  # 2024-01-01 UTC in epoch micros
    span = 31 * 24 * 3600
    ts = sorted(rng.randrange(span) for _ in range(n))
    types = ["view", "purchase", "signup", "error", "click"]
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [base + t * 1_000_000 + i % 1000 for i, t in enumerate(ts)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([rng.randrange(users) for _ in range(n)], pa.int64()),
            "event_type": pa.array([types[rng.randrange(100) % 5] for _ in range(n)]),
            "value": pa.array([round(rng.uniform(0, 200), 2) for _ in range(n)]),
            "props": pa.array(['{"k": %d}' % rng.randrange(100) for _ in range(n)]),
        }
    )


def gen_embeddings(n: int, seed: int) -> "pyarrow.Table":
    """64-dim float vectors with a ~20% planted-twin tail (copy an earlier
    vector, nudge one coordinate) so knn_graph/semantic_dedup find real
    clusters at both scales."""
    import pyarrow as pa

    rng = random.Random(seed)
    vecs: list[list[float]] = []
    for i in range(n):
        if i > 0 and rng.random() < 0.2:
            v = list(vecs[rng.randrange(max(1, i - 500), i)])
            v[rng.randrange(64)] += 0.3
        else:
            v = [rng.gauss(0.0, 1.0) for _ in range(64)]
        vecs.append(v)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float64())),
        }
    )


def gen_documents_zipf(n: int, seed: int) -> "pyarrow.Table":
    """Heaps-law-shaped corpus: tokens drawn Zipf(s=1.1) from a 30k-word
    lexicon, so vocabulary grows sublinearly with corpus size and
    document frequency is realistically skewed — a handful of stopword-
    like terms with df ∝ n, a long rare tail.  This is the corpus the
    retrieval scale claims are measured on (the 40-word VOCAB above is
    an ADVERSARIAL density stress: every posting list is the corpus)."""
    import pyarrow as pa

    rng = random.Random(seed)
    lex_size, s = 30_000, 1.1
    weights = [1.0 / (r**s) for r in range(1, lex_size + 1)]
    cum = []
    acc = 0.0
    for w in weights:
        acc += w
        cum.append(acc)
    lex = [f"w{r}" for r in range(1, lex_size + 1)]
    texts: list[str] = []
    for i in range(n):
        if i > 0 and rng.random() < 0.18:
            words = texts[rng.randrange(max(1, i - 500), i)].split()
            for j in range(len(words)):
                if rng.random() < 0.08:
                    words[j] = rng.choices(lex, cum_weights=cum)[0]
        else:
            words = rng.choices(lex, cum_weights=cum, k=rng.randint(12, 60))
        texts.append(" ".join(words))
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts),
        }
    )


GENERATORS = {
    "documents": gen_documents,
    "documents_zipf": gen_documents_zipf,
    "events": gen_events,
    "embeddings": gen_embeddings,
}


def _tuned_rpb(n: int) -> int:
    """LSH rows-per-band tuned to hold the EXPECTED BUCKET SIZE (~6
    vectors) constant as the corpus grows: rpb ≈ log2(n / bucket), so the
    candidate-verification work stays ∝ n·bands·bucket instead of
    n²/2^rpb.  Reproduces the hand-tuned 5k→10 / 50k→13 points and
    extends the rule to any scale (500k→16)."""
    import math

    return max(8, round(math.log2(max(n, 512) / 6)))


SCALE_SIZES = {
    "s0.1": {
        "documents": 5_000,
        "documents_zipf": 5_000,
        "events": 100_000,
        "embeddings": 5_000,
    },
    "s1": {
        "documents": 50_000,
        "documents_zipf": 50_000,
        "events": 1_000_000,
        "embeddings": 50_000,
    },
    # 100× the base scale — generated only for --flagship-curve runs
    # (one-time ~5 min build, cached like the others).
    "s10": {
        "documents": 500_000,
        "documents_zipf": 500_000,
        "events": 10_000_000,
        "embeddings": 500_000,
    },
}


def ensure_data(wanted: tuple[str, ...] = ("s0.1", "s1")) -> dict[str, dict[str, str]]:
    import pyarrow.parquet as pq

    scales = {s: SCALE_SIZES[s] for s in wanted}
    out: dict[str, dict[str, str]] = {}
    for scale, tables in scales.items():
        d = os.path.join(DATA_DIR, scale)
        os.makedirs(d, exist_ok=True)
        out[scale] = {}
        for name, n in tables.items():
            path = os.path.join(d, f"{name}.parquet")
            if not os.path.exists(path):
                pq.write_table(GENERATORS[name](n, seed=42), path)
                print(f"generated {path} ({n} rows)", file=sys.stderr)
            out[scale][name] = path
    return out


def run(spark, paths: dict[str, str]) -> dict[str, float]:
    from pyspark.sql import functions as F

    from dbt_scd2_utils_spark import ScdConfig, scd2_incremental, scd2_initial_load
    from dbt_scd2_utils_spark.operators.clustering import dedup_clusters
    from dbt_scd2_utils_spark.operators.dedup import minhash_lsh_pairs

    times: dict[str, float] = {}
    docs = spark.read.parquet(paths["documents"])
    events = spark.read.parquet(paths["events"])

    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(docs)
    pairs.write.format("noop").mode("overwrite").save()
    times["minhash_lsh_pairs"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    dedup_clusters(docs, pairs).write.format("noop").mode("overwrite").save()
    times["dedup_clusters"] = round(time.perf_counter() - t0, 2)

    from dbt_scd2_utils_spark.operators.clustering import dedup_survivors

    t0 = time.perf_counter()
    dedup_survivors(
        docs.select(
            "doc_id",
            F.size(F.split(F.trim(F.col("text")), r"\s+"))
            .cast("long")
            .alias("n_tokens"),
        ),
        pairs,
        quality_col="n_tokens",
    ).write.format("noop").mode("overwrite").save()
    times["dedup_survivor_quality"] = round(time.perf_counter() - t0, 2)

    from dbt_scd2_utils_spark.operators.dedup import (
        ngram_decontaminate,
        ngram_decontaminate_prefiltered,
    )

    t0 = time.perf_counter()
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    ngram_decontaminate(docs, bench, n=4).write.format("noop").mode("overwrite").save()
    times["ngram_decontaminate"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    ngram_decontaminate_prefiltered(docs, bench, n=4).write.format("noop").mode(
        "overwrite"
    ).save()
    times["decontaminate_bitmap"] = round(time.perf_counter() - t0, 2)

    from dbt_scd2_utils_spark.operators.dedup import containment_decontaminate

    t0 = time.perf_counter()
    containment_decontaminate(
        docs.filter(F.col("doc_id") % 20 != 0), bench, shingle_n=3, max_df=2000
    ).write.format("noop").mode("overwrite").save()
    times["containment_decontaminate"] = round(time.perf_counter() - t0, 2)

    from dbt_scd2_utils_spark.operators.asof import asof_join
    from dbt_scd2_utils_spark.operators.sessions import session_stats

    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("pts"),
        F.col("value").alias("purchase_value"),
        F.col("event_id").alias("purchase_event_id"),
    )
    t0 = time.perf_counter()
    asof_join(
        events.select("event_id", "user_id", "ts", "value"),
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="pts",
        right_order=("purchase_event_id",),
    ).write.format("noop").mode("overwrite").save()
    times["asof_join"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    session_stats(events).write.format("noop").mode("overwrite").save()
    times["sessionize"] = round(time.perf_counter() - t0, 2)

    feed = events.select(
        "user_id", "event_type", "value", "props",
        F.when(F.col("event_type") == "error", F.col("ts")).alias("deleted_at"),
        F.col("ts").alias("_updated_at"),
    )
    cfg = ScdConfig(
        unique_key=("user_id",), deleted_at_column="deleted_at",
        default_valid_to="2200-01-01 00:00:00",
    )
    split = F.lit("2024-01-16 00:00:00").cast("timestamp")
    t0 = time.perf_counter()
    state = scd2_initial_load(feed.filter(F.col("_updated_at") <= split), cfg).persist()
    state.write.format("noop").mode("overwrite").save()  # materialized table stand-in
    scd2_incremental(
        state, feed.filter(F.col("_updated_at") > split), cfg
    ).write.format("noop").mode("overwrite").save()
    times["scd2_incremental_merge"] = round(time.perf_counter() - t0, 2)
    state.unpersist()

    # Graph operators.  Production LSH tuning holds the expected BUCKET size
    # constant as n grows (rows_per_band ≈ log2(n) - log2(bucket)), so the
    # candidate-pair count — the verification work — stays ∝ n·bands·bucket
    # instead of n²/2^rpb; the curve below runs each scale at its tuned rpb
    # (5k → rpb 10, 50k → rpb 13: ~5-6 vectors/bucket at both).
    from dbt_scd2_utils_spark.operators.similarity import knn_graph

    emb = spark.read.parquet(paths["embeddings"])
    rpb = _tuned_rpb(emb.count())
    t0 = time.perf_counter()
    graph = knn_graph(
        emb, k=5, id_col="vec_id", vec_col="embedding", rows_per_band=rpb
    ).persist()
    graph.write.format("noop").mode("overwrite").save()
    times["knn_graph"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    edges = (
        graph.filter(F.col("cosine_sim") >= 0.9)
        .filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
        .distinct()
    )
    dedup_clusters(emb.select("vec_id"), edges, id_col="vec_id").write.format(
        "noop"
    ).mode("overwrite").save()
    times["semantic_dedup"] = round(time.perf_counter() - t0, 2)
    graph.unpersist()

    # Hybrid retrieval: BM25 keyword list + vector list fused by RRF
    # (docs/embeddings share the id space, mirroring the entry query's
    # doc_id = vec_id indexed collection).
    from dbt_scd2_utils_spark.operators.search import (
        bm25_index,
        bm25_topk,
        rrf_fuse,
    )
    from dbt_scd2_utils_spark.operators.similarity import (
        ann_quantized_topk,
        lsh_ann_topk,
        lsh_index,
    )

    # Query count held CONSTANT across scales (a workload property, not a
    # corpus property) — the curve isolates how cost grows with the CORPUS.
    #
    # (a) ADVERSARIAL corpus (40-word vocab: every posting list is the
    # corpus, every doc matches every query term), exact scoring, vector
    # side a quantized brute-force scan — the honest worst case, ∝ n.
    t0 = time.perf_counter()
    qdocs = docs.filter(F.col("doc_id") < 50)
    qtext = qdocs.select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(
            " ", F.slice(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), 1, 5)
        ).alias("query_text"),
    )
    bm = bm25_topk(docs, qtext, k=20, max_df_frac=0.8).select(
        "query_id", "doc_id", "rank"
    )
    qvec = emb.join(
        qdocs.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    vec = ann_quantized_topk(emb, qvec, k=20).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    rrf_fuse([bm, vec], k=10).write.format("noop").mode("overwrite").save()
    times["hybrid_search_rrf_adversarial"] = round(time.perf_counter() - t0, 2)

    # (b) REALISTIC Zipf/Heaps corpus, deployment shape: indexes built
    # once (timed separately — one inherent ∝ n pass each), probes run
    # against the persisted index — static-pruned postings (WAND-style,
    # impact top-200/term) for keywords, banded-LSH buckets for vectors.
    # This is the recurring per-query cost the 100 TB claim is about.
    zdocs = spark.read.parquet(paths["documents_zipf"])
    from dbt_scd2_utils_spark.operators.search import (
        load_bm25_index,
        save_bm25_index,
    )
    from dbt_scd2_utils_spark.operators.similarity import (
        load_lsh_index,
        save_lsh_index,
    )

    idx_dir = os.path.dirname(paths["documents"])
    bm25_path = os.path.join(idx_dir, "bm25_index.parquet")
    lsh_path = os.path.join(idx_dir, "lsh_index.parquet")
    t0 = time.perf_counter()
    save_bm25_index(
        bm25_index(zdocs, max_df_frac=0.8, max_postings_per_term=200),
        bm25_path,
    )
    save_lsh_index(lsh_index(emb, rows_per_band=rpb), lsh_path)
    times["hybrid_index_build"] = round(time.perf_counter() - t0, 2)
    bidx = load_bm25_index(spark, bm25_path)
    lidx = load_lsh_index(spark, lsh_path)

    t0 = time.perf_counter()
    zqtext = zdocs.filter(F.col("doc_id") < 50).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(
            " ", F.slice(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), 1, 5)
        ).alias("query_text"),
    )
    zbm = bm25_topk(None, zqtext, k=20, index=bidx).select(
        "query_id", "doc_id", "rank"
    )
    zvec = lsh_ann_topk(
        emb, k=20, query_ids=range(50), rows_per_band=rpb, index=lidx
    ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
    rrf_fuse([zbm, zvec], k=10).write.format("noop").mode("overwrite").save()
    times["hybrid_search_rrf"] = round(time.perf_counter() - t0, 2)

    # Streaming ANN probe, micro-batch shape (streaming/ann_stream.py):
    # each micro-batch is a SMALL query set probing the persisted corpus
    # signature index — per-batch cost ∝ query count × bucket size, held
    # ~constant across corpus scales by the rpb tuning above.  This is
    # the probe-only row the streaming_ann_probe gate's 100 TB claim
    # rests on (the corpus index is the build step, timed above).
    t0 = time.perf_counter()
    batch_q = emb.filter(F.col("vec_id") % 97 == 0).limit(100)
    lsh_ann_topk(
        emb, queries=batch_q, k=10, rows_per_band=rpb, index=lidx
    ).write.format("noop").mode("overwrite").save()
    times["streaming_ann_probe_microbatch"] = round(time.perf_counter() - t0, 2)

    # BM25 append maintenance: fold a FIXED 500-doc batch into an
    # unpruned maintained index (operators/search.py::bm25_index_append).
    # The tokenize pass is ∝ the new batch (scale-free); the df/dl/impact
    # re-aggregation is ∝ the postings table (∝ corpus) — the measured
    # curve records both effects together; the claim is append ≪ rebuild.
    t0 = time.perf_counter()
    maint = bm25_index(
        zdocs, max_df_frac=None, max_postings_per_term=None
    ).persist()
    maint.count()
    times["bm25_maintained_index_build"] = round(time.perf_counter() - t0, 2)
    new_docs = zdocs.filter(F.col("doc_id") < 500).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    t0 = time.perf_counter()
    from dbt_scd2_utils_spark.operators.search import bm25_index_append

    bm25_index_append(maint, new_docs).write.format("noop").mode(
        "overwrite"
    ).save()
    times["bm25_index_append_500"] = round(time.perf_counter() - t0, 2)
    maint.unpersist()

    # Semantic decontamination: corpus signs once (∝ n), benchmark side
    # (fixed 100 vectors — eval sets don't grow with the corpus) signs
    # and broadcasts; candidates are banded-LSH collisions only
    # (operators/similarity.py::semantic_decontaminate).
    from dbt_scd2_utils_spark.operators.similarity import (
        semantic_decontaminate,
    )

    bench_vecs = emb.filter(F.col("vec_id") % 101 == 0).limit(100)
    t0 = time.perf_counter()
    semantic_decontaminate(
        emb, bench_vecs, threshold=0.9, rows_per_band=rpb
    ).write.format("noop").mode("overwrite").save()
    times["decontaminate_semantic"] = round(time.perf_counter() - t0, 2)

    # PQ: train (build step) and probe measured separately — the
    # deployment splits them (BASELINE §round-4b indexes).
    from dbt_scd2_utils_spark.operators.similarity import (
        pq_ann_topk,
        pq_codebooks,
    )

    t0 = time.perf_counter()
    books = pq_codebooks(emb, dim=64, m=8, ksub=16)
    books.persist().count()
    times["pq_train"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    pq_ann_topk(
        emb,
        emb.filter(F.col("vec_id") < 50),
        dim=64,
        k=5,
        m=8,
        ksub=16,
        rerank=50,
        codebooks=books,
    ).write.format("noop").mode("overwrite").save()
    times["pq_probe"] = round(time.perf_counter() - t0, 2)

    # IVF-PQ with the √n coarse-cell rule (the FAISS sizing convention):
    # cells ∝ √n keeps per-cell size ∝ √n, so an nprobe-cell probe does
    # O(nprobe·√n) ADC work — the SUBLINEAR ANN probe path (full-ADC
    # pq_probe above is the deliberate linear worst case).  Train is the
    # build step; probe is the recurring cost.
    import math

    from dbt_scd2_utils_spark.operators.similarity import (
        _l2_normalize,
        as_double,
        ivf_pq_encode,
        ivf_pq_topk,
        kmeans_centroids_vectorized,
    )

    n_vec = emb.count()
    n_cells = max(8, int(2 * math.sqrt(n_vec)))
    t0 = time.perf_counter()
    normed = emb.select(
        F.col("vec_id").alias("pid"),
        _l2_normalize(as_double("embedding")).alias("nv"),
    )
    # FAISS practice: train the coarse quantizer on a SAMPLE (~16 points
    # per cell) — Lloyd's O(sample·cells) instead of O(n·cells) per
    # iteration; only the single final assignment pass touches every
    # vector.  Deterministic hash sample keeps the run reproducible.
    sample_mod = max(1, n_vec // (16 * n_cells))
    train_set = normed.filter(F.pmod(F.xxhash64("pid"), sample_mod) == 0)
    coarse = kmeans_centroids_vectorized(
        train_set, k=n_cells, iters=2, id_col="pid", vec_col="nv"
    ).persist()
    coarse.count()
    enc = ivf_pq_encode(
        emb, dim=64, coarse=coarse, codebooks=books, m=8,
        vectorized_assign=True,
    ).persist()
    enc.count()
    times["ivf_pq_build_sqrtn_cells"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    ivf_pq_topk(
        emb,
        emb.filter(F.col("vec_id") < 50),
        dim=64,
        k=5,
        n_cells=n_cells,
        nprobe=8,
        m=8,
        ksub=16,
        coarse=coarse,
        codebooks=books,
        encoded=enc,
    ).write.format("noop").mode("overwrite").save()
    times["ivf_pq_probe_sqrtn_cells"] = round(time.perf_counter() - t0, 2)

    # IVF-PQ append maintenance: encode-only fold-in of a FIXED
    # 500-vector batch under the trained artifacts
    # (operators/similarity.py::ivf_pq_index_append) — cost ∝ the NEW
    # batch only, so the curve should be ~scale-free vs the ∝ n build.
    from dbt_scd2_utils_spark.operators.similarity import (
        ivf_pq_index_append,
    )

    new_vecs = emb.filter(F.col("vec_id") < 500).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    t0 = time.perf_counter()
    ivf_pq_index_append(
        enc, new_vecs, dim=64, coarse=coarse, codebooks=books, m=8,
        vectorized_assign=True,
    ).write.format("noop").mode("overwrite").save()
    times["ivf_pq_index_append_500"] = round(time.perf_counter() - t0, 2)
    coarse.unpersist()
    enc.unpersist()
    books.unpersist()

    from dbt_scd2_utils_spark.operators.bpe import learn_bpe_merges

    t0 = time.perf_counter()
    learn_bpe_merges(docs, n_merges=10).count()
    times["bpe_learn_10"] = round(time.perf_counter() - t0, 2)
    return times


def merge_contrast(spark, events, work_dir: str) -> dict[str, float]:
    """Sink-shape contrast on the SAME small delta batch (≤16 business
    keys): the vanilla sink re-reads and REWRITES the whole table
    (O(n) regardless of batch size), the bucketed partition-overwrite
    sink reads and rewrites only the bucket partitions the batch's keys
    hash into.  Buckets are sized ∝ events (≈50k rows each, the
    fixed-partition-size rule a 100 TB table would use), so ≤16 keys
    touch ≤16 fixed-size partitions and the bucketed merge cost stays
    ~flat across the curve while the vanilla one grows with the table."""
    import shutil as _sh

    from pyspark.sql import functions as F

    from dbt_scd2_utils_spark import ScdConfig
    from dbt_scd2_utils_spark.plans.build import ScdTable

    feed = events.select(
        "user_id", "event_type", "value", "props",
        F.when(F.col("event_type") == "error", F.col("ts")).alias("deleted_at"),
        F.col("ts").alias("_updated_at"),
    )
    cfg = ScdConfig(
        unique_key=("user_id",), deleted_at_column="deleted_at",
        default_valid_to="2200-01-01 00:00:00",
    )
    split = F.lit("2024-01-16 00:00:00").cast("timestamp")
    n_events = events.count()
    # Materialize the delta batch to its own parquet UNTIMED: a real
    # incremental run receives the delta as a delta (CDC feed, staged
    # batch), it does not re-scan the full history to find it — leaving
    # the filter inline makes both flavors' timed numbers grow with an
    # O(events-scan) term that measures the harness, not the sink.
    batch_path = os.path.join(work_dir, "merge_contrast_batch.parquet")
    _sh.rmtree(batch_path, ignore_errors=True)
    feed.filter(
        (F.col("_updated_at") > split) & (F.col("user_id") < 16)
    ).coalesce(1).write.parquet(batch_path)
    small_batch = spark.read.parquet(batch_path)
    times: dict[str, float] = {}
    outputs: dict[str, object] = {}
    for flavor, buckets in (
        ("vanilla", None),
        ("bucketed", max(16, n_events // 50_000)),
    ):
        tpath = os.path.join(work_dir, f"scd_tbl_{flavor}")
        _sh.rmtree(tpath, ignore_errors=True)
        tbl = ScdTable(spark, tpath, cfg, partition_buckets=buckets)
        tbl.build(feed.filter(F.col("_updated_at") <= split))  # untimed init
        t0 = time.perf_counter()
        tbl.build(small_batch)
        times[f"scd2_merge_small_batch_{flavor}"] = round(
            time.perf_counter() - t0, 2
        )
        # Driver-side phase split of the bucketed merge (the r9d residual
        # was an O(bucket-count) listing term; the manifest should hold
        # list_affected ~flat as buckets grow with the table).
        for ph, sec in tbl.last_phase_times.items():
            times[f"bucketed_phase_{ph}"] = round(sec, 3)
        outputs[flavor] = tbl.read()
    # Untimed value-parity gate: the two sink shapes must produce the SAME
    # table (a timing win that changed the data would be a defect, not a
    # result).
    a, b = outputs["vanilla"], outputs["bucketed"]
    mismatch = a.exceptAll(b).count() + b.exceptAll(a).count()
    times["flavor_value_mismatch_rows"] = mismatch
    for flavor in outputs:
        tpath = os.path.join(work_dir, f"scd_tbl_{flavor}")
        _sh.rmtree(tpath, ignore_errors=True)
        _sh.rmtree(tpath + "__tmp", ignore_errors=True)
    return times


def run_merge_contrast_curve(spark) -> None:
    """--merge-contrast: the sink-shape contrast alone, extended one
    synthetic decade past the flagship curve (s40 = the s10 events
    replicated 4× under disjoint key ranges — the contrast depends on
    TABLE SIZE, not event content, so Spark-side replication is an
    honest way to reach a 40M-row table without a half-hour Python
    generator pass).  The ≤16-key batch lives entirely in replica 0,
    so the delta is IDENTICAL at every scale; only the table grows."""
    from pyspark.sql import functions as F

    paths = ensure_data(("s1", "s10"))
    s40_dir = os.path.join(DATA_DIR, "s40")
    s40_events = os.path.join(s40_dir, "events.parquet")
    if not os.path.exists(s40_events):
        os.makedirs(s40_dir, exist_ok=True)
        ev = spark.read.parquet(paths["s10"]["events"])
        out = None
        for r in range(4):
            rep = ev.select(
                (F.col("event_id") + F.lit(r * 100_000_000)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.lit(r * 10_000_000)).alias("user_id"),
                "event_type", "value", "props",
            )
            out = rep if out is None else out.unionByName(rep)
        out.write.parquet(s40_events)
        print(f"generated {s40_events} (4x s10)", file=sys.stderr)

    results: dict[str, dict[str, float]] = {}
    for scale, path, work in (
        ("s1", paths["s1"]["events"], os.path.dirname(paths["s1"]["events"])),
        ("s10", paths["s10"]["events"], os.path.dirname(paths["s10"]["events"])),
        ("s40", s40_events, s40_dir),
    ):
        events = spark.read.parquet(path)
        results[scale] = merge_contrast(spark, events, work)
        print(json.dumps({"scale": scale, "times": results[scale]}))
    for lo, hi, label in (("s1", "s10", "ratio_10x"), ("s10", "s40", "ratio_4x")):
        print(json.dumps({
            "metric": f"merge_contrast_{label}",
            "ratios": {
                op: round(results[hi][op] / max(results[lo][op], 1e-9), 2)
                for op in results[hi]
            },
        }))


def run_rebucket_curve(spark) -> None:
    """--rebucket-curve: the rebucket() maintenance op measured at s1 and
    s10 — wall, per-phase split, and the resulting files-per-bucket — so
    the full-rewrite cost is a NUMBER next to the O(affected-buckets)
    merge rows it protects.  Value parity (order-independent fingerprint)
    is asserted through the layout change at both scales."""
    import shutil as _sh

    from pyspark.sql import functions as F

    from dbt_scd2_utils_spark import ScdConfig
    from dbt_scd2_utils_spark.plans.build import BUCKET_COL, ScdTable

    cfg = ScdConfig(
        unique_key=("user_id",), deleted_at_column="deleted_at",
        default_valid_to="2200-01-01 00:00:00",
    )
    paths = ensure_data(("s1", "s10"))
    results: dict[str, dict] = {}
    for scale in ("s1", "s10"):
        work = os.path.dirname(paths[scale]["events"])
        events = spark.read.parquet(paths[scale]["events"])
        feed = events.select(
            "user_id", "event_type", "value", "props",
            F.when(F.col("event_type") == "error", F.col("ts")).alias(
                "deleted_at"
            ),
            F.col("ts").alias("_updated_at"),
        )
        buckets = max(16, events.count() // 50_000)
        tpath = os.path.join(work, "scd_tbl_rebucket")
        _sh.rmtree(tpath, ignore_errors=True)
        tbl = ScdTable(spark, tpath, cfg, partition_buckets=buckets)
        tbl.build(feed)  # untimed staging: the table exists before the op

        def fingerprint(df) -> tuple:
            r = df.select(
                F.count(F.lit(1)).alias("c"),
                F.sum(
                    F.crc32(F.to_json(F.struct(*sorted(df.columns))))
                ).alias("h"),
            ).first()
            return (r["c"], r["h"])

        fp_before = fingerprint(tbl.read())
        t0 = time.perf_counter()
        out = tbl.rebucket(buckets * 2)
        wall = time.perf_counter() - t0
        parity = fingerprint(out) == fp_before
        m = tbl._read_manifest() or {}
        files_per_bucket = [
            len(e["paths"]) for e in m.get("buckets", {}).values()
        ]
        row = {
            "scale": scale,
            "rows": fp_before[0],
            "buckets": buckets,
            "new_buckets": buckets * 2,
            "total": round(wall, 2),
            "phases": {
                k: round(v, 3) for k, v in tbl.last_phase_times.items()
            },
            "max_files_per_bucket": max(files_per_bucket or [0]),
            "value_parity": parity,
        }
        results[scale] = row
        print(json.dumps({"metric": "rebucket", **row}))
        assert parity, f"rebucket changed values at {scale}"
        _sh.rmtree(tpath, ignore_errors=True)
    print(json.dumps({
        "metric": "rebucket_ratio_10x",
        "total": round(
            results["s10"]["total"] / max(results["s1"]["total"], 1e-9), 2
        ),
    }))


def run_lifecycle_curve(spark) -> None:
    """--lifecycle-curve: the two r13 lifecycle ops measured across a data
    decade (s1 → s10).  The claims under measurement:

    * ``restore(gen)`` is METADATA-ONLY — its cost scales with the
      table's FILE COUNT (driver-side existence stats + manifest JSON +
      the returned read's plan over 10× more leaf files), never with
      data BYTES: no row is moved, so the decade ratio reflects ~10×
      more files at sub-second absolute cost, ~2 orders of magnitude
      under any rewrite-based rollback (contrast the rebucket row).
      The restored read must fingerprint-equal the time-travel read of
      the target generation.
    * ``delete_keys`` of a FIXED-SIZE key set is O(affected buckets) —
      buckets are sized ~50k rows at creation (bucket COUNT grows with
      the table, bucket SIZE stays constant), so deleting 16 keys
      rewrites ≤16 constant-sized buckets and the wall cost must stay
      ~flat across the decade while the table grows 10×."""
    import shutil as _sh

    from pyspark.sql import functions as F

    from dbt_scd2_utils_spark import ScdConfig
    from dbt_scd2_utils_spark.plans.build import ScdTable

    cfg = ScdConfig(
        unique_key=("user_id",), deleted_at_column="deleted_at",
        default_valid_to="2200-01-01 00:00:00",
    )
    paths = ensure_data(("s1", "s10"))
    results: dict[str, dict] = {}
    for scale in ("s1", "s10"):
        work = os.path.dirname(paths[scale]["events"])
        events = spark.read.parquet(paths[scale]["events"])
        feed = events.select(
            "user_id", "event_type", "value", "props",
            F.when(F.col("event_type") == "error", F.col("ts")).alias(
                "deleted_at"
            ),
            F.col("ts").alias("_updated_at"),
        )
        n = events.count()
        buckets = max(16, n // 50_000)
        tpath = os.path.join(work, "scd_tbl_lifecycle")
        _sh.rmtree(tpath, ignore_errors=True)
        tbl = ScdTable(spark, tpath, cfg, partition_buckets=buckets)
        tbl.build(feed)  # gen 0 — untimed staging
        keys = [
            r[0] for r in feed.select("user_id").distinct().limit(16).collect()
        ]
        delta = (
            feed.filter(F.col("user_id").isin(keys))
            .withColumn(
                "_updated_at",
                F.col("_updated_at") + F.expr("interval 400 days"),
            )
        )
        tbl.build(delta)  # gen 1 — the state restore rolls back over

        def fingerprint(df) -> tuple:
            r = df.select(
                F.count(F.lit(1)).alias("c"),
                F.sum(
                    F.crc32(F.to_json(F.struct(*sorted(df.columns))))
                ).alias("h"),
            ).first()
            return (r["c"], r["h"])

        t0 = time.perf_counter()
        restored = tbl.restore(0)  # gen 2
        restore_wall = time.perf_counter() - t0
        restore_phases = dict(tbl.last_phase_times)
        restore_parity = fingerprint(restored) == fingerprint(
            tbl.read_at_gen(0)
        )

        key_df = spark.createDataFrame([(k,) for k in keys], "user_id long")
        t0 = time.perf_counter()
        tbl.delete_keys(key_df)  # gen 3
        delete_wall = time.perf_counter() - t0
        delete_phases = dict(tbl.last_phase_times)
        leftovers = tbl.read_keys(key_df).count()

        row = {
            "scale": scale,
            "rows": n,
            "buckets": buckets,
            "restore_s": round(restore_wall, 3),
            "restore_phases": {
                k: round(v, 3) for k, v in restore_phases.items()
            },
            "restore_parity": restore_parity,
            "delete_s": round(delete_wall, 2),
            "delete_phases": {
                k: round(v, 3) for k, v in delete_phases.items()
            },
            "deleted_rows_left": leftovers,
        }
        results[scale] = row
        print(json.dumps({"metric": "lifecycle", **row}))
        assert restore_parity, f"restore diverged from read_at_gen at {scale}"
        assert leftovers == 0, f"delete left rows at {scale}"
        _sh.rmtree(tpath, ignore_errors=True)
    print(json.dumps({
        "metric": "lifecycle_ratio_10x",
        "restore": round(
            results["s10"]["restore_s"]
            / max(results["s1"]["restore_s"], 1e-9), 2
        ),
        "delete": round(
            results["s10"]["delete_s"]
            / max(results["s1"]["delete_s"], 1e-9), 2
        ),
    }))


def run_merge_churn(spark, n_merges: int = 50) -> None:
    """--merge-churn: the bucketed sink under REAL commit churn — 50
    consecutive small merges into the same s10 table (rolling ≤16-key
    batches, so successive merges touch different bucket subsets).  The
    single-merge contrast rows prove one merge is O(affected buckets);
    this proves the claim holds FOREVER: per-merge listing/stage/commit/
    vacuum times must stay flat across 50 commits, the per-bucket file
    count must stay at 1 (the co-locating repartition), the superseded
    ledger must stay bounded at `retain_generations` entries (vacuum
    keeps up), and the generation-dir count must stay bounded (empty
    generations pruned as their files are vacuumed).

    r12: a REBUCKET (2× bucket count) fires at the loop midpoint — the
    remaining untested seam was the read_at_gen × rebucket × vacuum
    composition under churn.  Checked in-loop: the pre-rebucket
    generation stays time-travel readable (value fingerprint equal)
    immediately after the rebucket, post-rebucket merges route under the
    new mapping with flat phases, and once `retain` further commits have
    passed the pre-rebucket generation raises the retention error
    instead of serving vacuumed files."""
    import shutil as _sh

    from pyspark.sql import functions as F

    from dbt_scd2_utils_spark import ScdConfig
    from dbt_scd2_utils_spark.plans.build import BUCKET_COL, GEN_PREFIX, ScdTable

    paths = ensure_data(("s10",))
    work = os.path.dirname(paths["s10"]["events"])
    events = spark.read.parquet(paths["s10"]["events"])
    feed = events.select(
        "user_id", "event_type", "value", "props",
        F.when(F.col("event_type") == "error", F.col("ts")).alias("deleted_at"),
        F.col("ts").alias("_updated_at"),
    )
    cfg = ScdConfig(
        unique_key=("user_id",), deleted_at_column="deleted_at",
        default_valid_to="2200-01-01 00:00:00",
    )
    split = F.lit("2024-01-16 00:00:00").cast("timestamp")
    n_events = events.count()
    buckets = max(16, n_events // 50_000)
    tpath = os.path.join(work, "scd_tbl_churn")
    _sh.rmtree(tpath, ignore_errors=True)
    tbl = ScdTable(spark, tpath, cfg, partition_buckets=buckets)
    tbl.build(feed.filter(F.col("_updated_at") <= split))  # untimed init

    # Materialize ALL the rolling delta batches untimed (a real run gets
    # its delta as a delta; see merge_contrast's note).
    batch_root = os.path.join(work, "churn_batches.parquet")
    _sh.rmtree(batch_root, ignore_errors=True)
    post = feed.filter(
        (F.col("_updated_at") > split) & (F.col("user_id") < 16 * n_merges)
    )
    post.withColumn(
        "batch", (F.col("user_id") / 16).cast("int")
    ).repartition(n_merges, "batch").write.partitionBy("batch").parquet(batch_root)

    def disk_stats() -> dict:
        total_files = 0
        worst_bucket_files = 0
        for root, _dirs, names in os.walk(tpath):
            pq_names = [n for n in names if n.endswith(".parquet")]
            if not pq_names:
                continue
            total_files += len(pq_names)
            if os.path.basename(root).startswith(f"{BUCKET_COL}="):
                worst_bucket_files = max(worst_bucket_files, len(pq_names))
        gen_dirs = sum(
            1 for n in os.listdir(tpath) if n.startswith(GEN_PREFIX)
        )
        m = tbl._read_manifest() or {}
        return {
            "files_total": total_files,
            "max_files_per_bucket_dir": worst_bucket_files,
            "gen_dirs": gen_dirs,
            "ledger_entries": len(m.get("superseded", {})),
        }

    def fingerprint(df) -> tuple:
        """Order-independent value fingerprint (count + summed row crc)."""
        r = df.select(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.crc32(F.to_json(F.struct(*sorted(df.columns))))).alias("h"),
        ).first()
        return (r["c"], r["h"])

    per_merge: list[dict] = []
    rebucket_at = n_merges // 2
    gen_pre = fp_pre = None
    for i in range(n_merges):
        if i == rebucket_at:
            gen_pre = (tbl._read_manifest() or {}).get("gen")
            fp_pre = fingerprint(tbl.read_at_gen(gen_pre))
            t0 = time.perf_counter()
            tbl.rebucket(buckets * 2)
            rb_total = time.perf_counter() - t0
            row = {
                "rebucket_before_merge": i,
                "new_buckets": buckets * 2,
                "total": round(rb_total, 3),
            }
            row.update(
                {k: round(v, 3) for k, v in tbl.last_phase_times.items()}
            )
            row.update(disk_stats())
            print(json.dumps(row))
            # Cross-boundary time travel: the displaced pre-rebucket
            # generation must still serve its EXACT snapshot (its files
            # ride the ledger for `retain` further commits).
            assert fingerprint(tbl.read_at_gen(gen_pre)) == fp_pre, (
                "pre-rebucket generation changed under time travel"
            )
        bpath = os.path.join(batch_root, f"batch={i}")
        if not os.path.exists(bpath):
            continue
        batch = spark.read.parquet(bpath)
        t0 = time.perf_counter()
        tbl.build(batch)
        total = time.perf_counter() - t0
        row = {"merge": i, "total": round(total, 3)}
        row.update({k: round(v, 3) for k, v in tbl.last_phase_times.items()})
        row.update(disk_stats())
        per_merge.append(row)
        print(json.dumps(row))
    # The churn kept going well past the retention window: the
    # pre-rebucket generation must now REFUSE (snapshot expired, files
    # vacuumed) rather than resurrect dead data.
    if gen_pre is not None:
        try:
            tbl.read_at_gen(gen_pre)
            raise AssertionError(
                "pre-rebucket generation still readable after retention"
            )
        except ValueError as exc:
            print(json.dumps({
                "metric": "post_retention_time_travel",
                "gen": gen_pre,
                "raises": str(exc)[:120],
            }))

    def avg(rows, key):
        vals = [r[key] for r in rows if key in r]
        return round(sum(vals) / max(len(vals), 1), 3)

    head, tail = per_merge[:5], per_merge[-5:]
    print(json.dumps({
        "metric": "merge_churn_summary",
        "n_merges": len(per_merge),
        "buckets": buckets,
        "rebucket_before_merge": rebucket_at,
        "buckets_after_rebucket": buckets * 2,
        "first5_avg": {k: avg(head, k) for k in
                       ("total", "list_affected", "merge_and_stage",
                        "swap_and_commit", "vacuum")},
        "last5_avg": {k: avg(tail, k) for k in
                      ("total", "list_affected", "merge_and_stage",
                       "swap_and_commit", "vacuum")},
        "max_files_total": max(r["files_total"] for r in per_merge),
        "max_files_per_bucket_dir": max(
            r["max_files_per_bucket_dir"] for r in per_merge
        ),
        "max_gen_dirs": max(r["gen_dirs"] for r in per_merge),
        "max_ledger_entries": max(r["ledger_entries"] for r in per_merge),
    }))
    _sh.rmtree(tpath, ignore_errors=True)
    _sh.rmtree(batch_root, ignore_errors=True)


def run_flagship(spark, paths: dict[str, str]) -> dict[str, float]:
    """The 100×-curve subset: the headline dedup / merge / index-probe /
    append operators whose 100 TB claims BASELINE.md rests on, with the
    SAME parameters as :func:`run` (the deliberate-linear stress rows —
    full-ADC pq_probe, adversarial-vocab hybrid, n-gram decontaminate —
    already have 10× rows and are excluded to bound wall time)."""
    import math

    from pyspark.sql import functions as F

    from dbt_scd2_utils_spark import (
        ScdConfig,
        scd2_incremental,
        scd2_initial_load,
    )
    from dbt_scd2_utils_spark.operators.clustering import dedup_clusters
    from dbt_scd2_utils_spark.operators.dedup import minhash_lsh_pairs
    from dbt_scd2_utils_spark.operators.search import (
        bm25_index,
        bm25_index_append,
        bm25_topk,
        rrf_fuse,
    )
    from dbt_scd2_utils_spark.operators.similarity import (
        _l2_normalize,
        as_double,
        ivf_pq_encode,
        ivf_pq_index_append,
        ivf_pq_topk,
        kmeans_centroids_vectorized,
        knn_graph,
        lsh_ann_topk,
        lsh_index,
        pq_codebooks,
        semantic_decontaminate,
    )

    times: dict[str, float] = {}
    docs = spark.read.parquet(paths["documents"])
    events = spark.read.parquet(paths["events"])
    emb = spark.read.parquet(paths["embeddings"])
    zdocs = spark.read.parquet(paths["documents_zipf"])
    rpb = _tuned_rpb(emb.count())

    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(docs)
    pairs.write.format("noop").mode("overwrite").save()
    times["minhash_lsh_pairs"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    dedup_clusters(docs, pairs).write.format("noop").mode("overwrite").save()
    times["dedup_clusters"] = round(time.perf_counter() - t0, 2)

    # The 40-word-vocab corpus above is the documented DENSITY stress
    # (by-chance shingle collisions grow with bucket density); the
    # Zipf/Heaps corpus is the realistic claim — same 18% planted
    # near-dup tail, natural vocabulary growth.
    t0 = time.perf_counter()
    minhash_lsh_pairs(zdocs).write.format("noop").mode("overwrite").save()
    times["minhash_lsh_pairs_zipf"] = round(time.perf_counter() - t0, 2)

    # r10: exact-substring removal on the same realistic corpus — work is
    # ∝ corpus tokens (window explode + df count + ≤span_n covered-index
    # fan-out per duplicated window), so the decade ratio should track
    # the minhash row's, not the pair-explosion stresses.
    from dbt_scd2_utils_spark.operators.dedup import exact_substring_dedup

    t0 = time.perf_counter()
    exact_substring_dedup(zdocs).write.format("noop").mode("overwrite").save()
    times["exact_substring_dedup_zipf"] = round(time.perf_counter() - t0, 2)

    feed = events.select(
        "user_id", "event_type", "value", "props",
        F.when(F.col("event_type") == "error", F.col("ts")).alias("deleted_at"),
        F.col("ts").alias("_updated_at"),
    )
    cfg = ScdConfig(
        unique_key=("user_id",), deleted_at_column="deleted_at",
        default_valid_to="2200-01-01 00:00:00",
    )
    split = F.lit("2024-01-16 00:00:00").cast("timestamp")
    t0 = time.perf_counter()
    state = scd2_initial_load(feed.filter(F.col("_updated_at") <= split), cfg).persist()
    state.write.format("noop").mode("overwrite").save()
    scd2_incremental(
        state, feed.filter(F.col("_updated_at") > split), cfg
    ).write.format("noop").mode("overwrite").save()
    times["scd2_incremental_merge"] = round(time.perf_counter() - t0, 2)
    state.unpersist()

    times.update(
        merge_contrast(spark, events, os.path.dirname(paths["events"]))
    )

    t0 = time.perf_counter()
    graph = knn_graph(
        emb, k=5, id_col="vec_id", vec_col="embedding", rows_per_band=rpb
    ).persist()
    graph.write.format("noop").mode("overwrite").save()
    times["knn_graph"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    edges = (
        graph.filter(F.col("cosine_sim") >= 0.9)
        .filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
        .distinct()
    )
    dedup_clusters(emb.select("vec_id"), edges, id_col="vec_id").write.format(
        "noop"
    ).mode("overwrite").save()
    times["semantic_dedup"] = round(time.perf_counter() - t0, 2)
    graph.unpersist()

    # Deployment-shape hybrid retrieval: build once TO DISK, probe the
    # persisted pruned index — the recurring per-query cost the 100 TB
    # claim is about (same parameters as run()).  r8 change (BASELINE
    # §round-7c(a)): the LSH signing pass streams straight to the
    # band-partitioned parquet layout (save_lsh_index) instead of a
    # 2.2 GB-at-s10 executor-memory persist, and BM25 postings to the
    # term-bucketed layout (save_bm25_index); probes read back with
    # partition pruning, nothing corpus-sized lives in executor memory.
    from dbt_scd2_utils_spark.operators.search import (
        load_bm25_index,
        save_bm25_index,
    )
    from dbt_scd2_utils_spark.operators.similarity import (
        load_lsh_index,
        save_lsh_index,
    )

    idx_dir = os.path.dirname(paths["documents"])
    bm25_path = os.path.join(idx_dir, "bm25_index.parquet")
    lsh_path = os.path.join(idx_dir, "lsh_index.parquet")
    t0 = time.perf_counter()
    save_bm25_index(
        bm25_index(zdocs, max_df_frac=0.8, max_postings_per_term=200),
        bm25_path,
    )
    save_lsh_index(lsh_index(emb, rows_per_band=rpb), lsh_path)
    times["hybrid_index_build"] = round(time.perf_counter() - t0, 2)
    bidx = load_bm25_index(spark, bm25_path)
    lidx = load_lsh_index(spark, lsh_path)

    t0 = time.perf_counter()
    zqtext = zdocs.filter(F.col("doc_id") < 50).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(
            " ", F.slice(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), 1, 5)
        ).alias("query_text"),
    )
    zbm = bm25_topk(None, zqtext, k=20, index=bidx).select(
        "query_id", "doc_id", "rank"
    )
    zvec = lsh_ann_topk(
        emb, k=20, query_ids=range(50), rows_per_band=rpb, index=lidx
    ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
    rrf_fuse([zbm, zvec], k=10).write.format("noop").mode("overwrite").save()
    times["hybrid_search_rrf"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    batch_q = emb.filter(F.col("vec_id") % 97 == 0).limit(100)
    lsh_ann_topk(
        emb, queries=batch_q, k=10, rows_per_band=rpb, index=lidx
    ).write.format("noop").mode("overwrite").save()
    times["streaming_ann_probe_microbatch"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    maint = bm25_index(
        zdocs, max_df_frac=None, max_postings_per_term=None
    ).persist()
    maint.count()
    times["bm25_maintained_index_build"] = round(time.perf_counter() - t0, 2)
    new_docs = zdocs.filter(F.col("doc_id") < 500).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    t0 = time.perf_counter()
    bm25_index_append(maint, new_docs).write.format("noop").mode(
        "overwrite"
    ).save()
    times["bm25_index_append_500"] = round(time.perf_counter() - t0, 2)
    maint.unpersist()

    bench_vecs = emb.filter(F.col("vec_id") % 101 == 0).limit(100)
    t0 = time.perf_counter()
    semantic_decontaminate(
        emb, bench_vecs, threshold=0.9, rows_per_band=rpb
    ).write.format("noop").mode("overwrite").save()
    times["decontaminate_semantic"] = round(time.perf_counter() - t0, 2)

    # IVF-PQ √n-cell build / probe / append.  The codebook train is part
    # of the build row here (run() times it separately as pq_train), and
    # trains on a BOUNDED deterministic sample — FAISS practice caps PQ
    # training at O(10k-100k) vectors regardless of corpus size; only
    # the encode pass touches every vector, so build cost stays ∝ n
    # rather than picking up a second full k-means pass.
    n_vec = emb.count()
    n_cells = max(8, int(2 * math.sqrt(n_vec)))
    t0 = time.perf_counter()
    pq_mod = max(1, n_vec // 25_000)
    pq_train_set = emb.filter(F.pmod(F.xxhash64("vec_id"), pq_mod) == 0)
    books = pq_codebooks(pq_train_set, dim=64, m=8, ksub=16).persist()
    books.count()
    normed = emb.select(
        F.col("vec_id").alias("pid"),
        _l2_normalize(as_double("embedding")).alias("nv"),
    )
    sample_mod = max(1, n_vec // (16 * n_cells))
    train_set = normed.filter(F.pmod(F.xxhash64("pid"), sample_mod) == 0)
    coarse = kmeans_centroids_vectorized(
        train_set, k=n_cells, iters=2, id_col="pid", vec_col="nv"
    ).persist()
    coarse.count()
    enc = ivf_pq_encode(
        emb, dim=64, coarse=coarse, codebooks=books, m=8,
        vectorized_assign=True,
    ).persist()
    enc.count()
    times["ivf_pq_build_sqrtn_cells"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    ivf_pq_topk(
        emb,
        emb.filter(F.col("vec_id") < 50),
        dim=64,
        k=5,
        n_cells=n_cells,
        nprobe=8,
        m=8,
        ksub=16,
        coarse=coarse,
        codebooks=books,
        encoded=enc,
    ).write.format("noop").mode("overwrite").save()
    times["ivf_pq_probe_sqrtn_cells"] = round(time.perf_counter() - t0, 2)

    new_vecs = emb.filter(F.col("vec_id") < 500).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    t0 = time.perf_counter()
    ivf_pq_index_append(
        enc, new_vecs, dim=64, coarse=coarse, codebooks=books, m=8,
        vectorized_assign=True,
    ).write.format("noop").mode("overwrite").save()
    times["ivf_pq_index_append_500"] = round(time.perf_counter() - t0, 2)
    coarse.unpersist()
    enc.unpersist()

    # The SDC-scored graph (the knn_graph remedy, BASELINE §round-7d):
    # same banded blocking, pair rows carry PQ codes instead of vectors.
    from dbt_scd2_utils_spark.operators.similarity import knn_graph_pq

    t0 = time.perf_counter()
    knn_graph_pq(
        emb, k=5, rows_per_band=rpb, m=8, ksub=16, codebooks=books,
        vectorized_encode=True,
    ).write.format("noop").mode("overwrite").save()
    times["knn_graph_pq"] = round(time.perf_counter() - t0, 2)

    # The consumer-default scale path for semantic dedup (r8): PQ-SDC
    # candidate stream (no vectors through the bucket join) + IVFADC+R
    # exact-cosine re-rank on n·20 slim pairs + star-contraction
    # components — the composition gated as q:semantic_dedup_pq.
    t0 = time.perf_counter()
    pq_graph = knn_graph_pq(
        emb, k=5, rows_per_band=rpb, m=8, ksub=16, codebooks=books,
        vectorized_encode=True, rerank=20,
    )
    pq_edges = (
        pq_graph.filter(F.col("cosine_sim") >= 0.9)
        .filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
        .distinct()
    )
    dedup_clusters(
        emb.select("vec_id"), pq_edges, id_col="vec_id"
    ).write.format("noop").mode("overwrite").save()
    times["semantic_dedup_pq"] = round(time.perf_counter() - t0, 2)

    from dbt_scd2_utils_spark.operators.bpe import learn_bpe_merges

    t0 = time.perf_counter()
    learn_bpe_merges(docs, n_merges=10).count()
    times["bpe_learn_10"] = round(time.perf_counter() - t0, 2)

    # Fixed-cell IVF-PQ build — the deployment rule for the √n-cell
    # worst case above (BASELINE round-9e): with the cell count pinned,
    # the assign pass is ∝ n.
    t0 = time.perf_counter()
    fixed_coarse = kmeans_centroids_vectorized(
        normed.filter(F.pmod(F.xxhash64("pid"), max(1, n_vec // (16 * 1024))) == 0),
        k=1024, iters=2, id_col="pid", vec_col="nv",
    ).persist()
    fixed_coarse.count()
    enc2 = ivf_pq_encode(
        emb, dim=64, coarse=fixed_coarse, codebooks=books, m=8,
        vectorized_assign=True,
    )
    enc2.write.format("noop").mode("overwrite").save()
    times["ivf_pq_build_fixed_1024_cells"] = round(time.perf_counter() - t0, 2)
    fixed_coarse.unpersist()
    books.unpersist()

    # DSIR importance scoring over the realistic Zipf corpus (target =
    # every 20th doc): one explode+combine corpus pass + a broadcast
    # 4096-row ratio join — expected ~linear in rows.
    from dbt_scd2_utils_spark.operators.dsir import dsir_logratio

    t0 = time.perf_counter()
    dsir_logratio(
        zdocs, zdocs.filter(F.col("doc_id") % 20 == 0)
    ).write.format("noop").mode("overwrite").save()
    times["dsir_logratio"] = round(time.perf_counter() - t0, 2)
    return times


def main() -> None:
    from dbt_scd2_utils_spark.session import get_spark

    flagship = "--flagship-curve" in sys.argv
    if "--merge-contrast" in sys.argv:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
        spark = get_spark("scale-proof", cpus=cpus)
        spark.sparkContext.setLogLevel("ERROR")
        run_merge_contrast_curve(spark)
        return
    if "--merge-churn" in sys.argv:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
        spark = get_spark("scale-proof", cpus=cpus)
        spark.sparkContext.setLogLevel("ERROR")
        run_merge_churn(spark)
        return
    if "--rebucket-curve" in sys.argv:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
        spark = get_spark("scale-proof", cpus=cpus)
        spark.sparkContext.setLogLevel("ERROR")
        run_rebucket_curve(spark)
        return
    if "--lifecycle-curve" in sys.argv:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
        spark = get_spark("scale-proof", cpus=cpus)
        spark.sparkContext.setLogLevel("ERROR")
        run_lifecycle_curve(spark)
        return
    if flagship:
        scales = ["s0.1", "s1", "s10"]
    elif "--small-only" in sys.argv:
        scales = ["s0.1"]
    else:
        scales = ["s0.1", "s1"]
    paths = ensure_data(tuple(scales))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    spark = get_spark("scale-proof", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # Warm JVM + python workers once so the curve measures the operators.
    spark.range(0, 1000, 1, 8).toDF("id").mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    results: dict[str, dict[str, float]] = {}
    for scale in scales:
        results[scale] = (
            run_flagship(spark, paths[scale]) if flagship
            else run(spark, paths[scale])
        )
        print(json.dumps({"scale": scale, "times": results[scale]}))

    for lo, hi, label in (
        ("s0.1", "s1", "scale_ratio_10x_rows"),
        ("s1", "s10", "scale_ratio_10x_rows_second_decade"),
    ):
        if lo in results and hi in results:
            ratios = {
                op: round(results[hi][op] / max(results[lo][op], 1e-9), 1)
                for op in results[hi]
            }
            print(json.dumps({"metric": label, "ratios": ratios, "cpus": cpus}))


if __name__ == "__main__":
    main()
