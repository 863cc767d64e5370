"""Signed random projection (operators/similarity.py::random_projection):
determinism, exact agreement with the numpy matmul oracle, norm
preservation (the JL guarantee the ±1 family provides in expectation), and
codegen robustness at wide output dims."""

from __future__ import annotations

import numpy as np

from dbt_scd2_utils_spark.operators.similarity import (
    random_projection,
    signed_projection_matrix,
)
from dbt_scd2_utils_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_matrix_is_deterministic_and_balanced():
    m1 = signed_projection_matrix(64, 16)
    m2 = signed_projection_matrix(64, 16)
    assert m1 == m2
    flat = [s for row in m1 for s in row]
    assert set(flat) == {1, -1}
    # md5 nibble parity is ~uniform: within 3σ of half
    assert abs(sum(1 for s in flat if s == 1) - 512) < 3 * 16


def test_matches_numpy_matmul_exactly(spark):
    emb = load_table(spark, SF, "embeddings").limit(100)
    mat = np.array(signed_projection_matrix(64, 16))  # (out, in)
    rows = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    proj = {r.vec_id: list(r.proj) for r in random_projection(emb, 64, 16).collect()}
    for vid, v in rows.items():
        vm = np.rint(v * 1e6).astype(np.int64)
        expect = (mat @ vm).tolist()
        assert proj[vid] == expect, vid


def test_norm_preserved_in_expectation(spark):
    emb = load_table(spark, SF, "embeddings").limit(200)
    full = {
        r.vec_id: np.rint(np.array(r.embedding, dtype=np.float64) * 1e6)
        for r in emb.collect()
    }
    proj = {
        r.vec_id: np.array(r.proj, dtype=np.float64)
        for r in random_projection(emb, 64, 16).collect()
    }
    # E[proj_j²] = ‖v‖² per component → mean over ids of the ratio ≈ 1.
    ratios = [
        (proj[i] ** 2).mean() / (full[i] ** 2).sum() for i in sorted(full)
    ]
    assert 0.7 < float(np.mean(ratios)) < 1.3, np.mean(ratios)


def test_wide_output_dims_survive_codegen(spark):
    # dim_out=64 → a flat literal-sum expression would blow janino's
    # 64 KB method limit; the explode+groupBy shape must not.
    emb = load_table(spark, SF, "embeddings").limit(5)
    out = random_projection(emb, 64, 64).collect()
    assert len(out) == 5 and all(len(r.proj) == 64 for r in out)
