"""C4-style repeated-line removal
(operators/text.py::remove_repeated_lines)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_scd2_utils_spark.operators.text import remove_repeated_lines


def test_boilerplate_cut_from_every_doc(spark):
    banner = "please accept our cookies"  # 4 tokens = one line below
    df = spark.createDataFrame(
        [
            (1, banner + " alpha beta gamma delta"),
            (2, banner + " epsilon zeta eta theta"),
            (3, banner + " iota kappa lam mu"),
            (4, "totally unique text here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in remove_repeated_lines(
            df, line_tokens=4, min_count=3
        ).collect()
    }
    # the banner line (appearing 3×) is cut from all three docs
    assert out[1].cleaned_text == "alpha beta gamma delta"
    assert out[2].cleaned_text == "epsilon zeta eta theta"
    assert out[3].cleaned_text == "iota kappa lam mu"
    assert all(out[i].n_removed == 1 for i in (1, 2, 3))
    # the unique doc is untouched
    assert out[4].cleaned_text == "totally unique text here"
    assert out[4].n_removed == 0


def test_fully_boilerplate_doc_survives_empty(spark):
    df = spark.createDataFrame(
        [(i, "same old line") for i in range(1, 4)],
        "doc_id long, text string",
    )
    out = remove_repeated_lines(df, line_tokens=4, min_count=3).collect()
    assert len(out) == 3
    assert all(r.cleaned_text == "" and r.n_removed == 1 for r in out)


def test_order_preserved_after_mid_document_cut(spark):
    df = spark.createDataFrame(
        [
            (1, "aa bb SPAM SPAM cc dd"),
            (2, "SPAM SPAM xx yy"),
            (3, "SPAM SPAM zz ww"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.cleaned_text
        for r in remove_repeated_lines(df, line_tokens=2, min_count=3).collect()
    }
    assert out[1] == "aa bb cc dd"
    assert out[2] == "xx yy"


def test_below_threshold_lines_kept(spark):
    df = spark.createDataFrame(
        [(1, "x y"), (2, "x y")], "doc_id long, text string"
    )
    out = remove_repeated_lines(df, line_tokens=2, min_count=3)
    assert {r.n_removed for r in out.collect()} == {0}
