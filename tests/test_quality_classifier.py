"""Linear-logistic quality gate (operators/text.py::quality_classifier)."""

from __future__ import annotations

from dbt_scd2_utils_spark.operators.text import quality_classifier


def test_clean_english_outscores_punct_spam(spark):
    clean = (
        "the quick brown fox and a lazy dog were walking to the old market "
        "for some fresh bread and they talked about the weather on the way"
    )
    spam = "!!! $$$ ### " * 12
    df = spark.createDataFrame(
        [(1, clean), (2, spam)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in quality_classifier(df).collect()}
    assert out[1].z_micro > out[2].z_micro
    assert out[1].p_micro > out[2].p_micro
    assert out[1].keep and not out[2].keep


def test_sigmoid_is_monotone_and_bounded(spark):
    df = spark.createDataFrame(
        [(i, "the and is " * i) for i in range(1, 12)],
        "doc_id long, text string",
    )
    rows = sorted(quality_classifier(df).collect(), key=lambda r: r.z_micro)
    ps = [r.p_micro for r in rows]
    assert ps == sorted(ps)
    assert all(0 <= p <= 1_000_000 for p in ps)


def test_custom_weights_override(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    out = quality_classifier(
        df, weights={"n_words": 1_000_000}, bias_micro=0
    ).collect()[0]
    assert out.z_micro == 3_000_000
    assert out.keep
