"""Group pooling semantics (operators/similarity.py::pool_embeddings)."""

from __future__ import annotations

import math

from dbt_scd2_utils_spark.operators.similarity import pool_embeddings


def _rows(spark, data):
    return spark.createDataFrame(
        data, "label int, embedding array<float>"
    )


def test_pooled_is_unit_norm_in_micros(spark):
    df = _rows(
        spark,
        [(0, [1.0, 0.0, 0.0]), (0, [0.0, 1.0, 0.0]), (1, [0.0, 0.0, 2.0])],
    )
    out = {r.label: r for r in pool_embeddings(df).collect()}
    # label 0: mean = (.5, .5, 0) → normalized (√2/2, √2/2, 0)
    expect = round(1e6 / math.sqrt(2))
    assert out[0].pooled == [expect, expect, 0]
    assert out[0].n_vecs == 2
    # label 1: single vector scales to unit regardless of magnitude
    assert out[1].pooled == [0, 0, 1_000_000]
    assert out[1].n_vecs == 1


def test_normalization_is_scale_invariant_so_n_cancels(spark):
    # Same direction, different group sizes → identical pooled vector.
    df = _rows(
        spark,
        [(0, [3.0, 4.0, 0.0])] * 5 + [(1, [3.0, 4.0, 0.0])] * 2,
    )
    out = {r.label: r.pooled for r in pool_embeddings(df).collect()}
    assert out[0] == out[1] == [600000, 800000, 0]


def test_zero_vectors_pool_to_zero(spark):
    df = _rows(spark, [(0, [0.0, 0.0]), (0, [0.0, 0.0])])
    out = pool_embeddings(df).collect()[0]
    assert out.pooled == [0, 0]


def test_opposite_vectors_cancel(spark):
    df = _rows(spark, [(0, [1.0, 2.0]), (0, [-1.0, -2.0])])
    out = pool_embeddings(df).collect()[0]
    assert out.pooled == [0, 0]
