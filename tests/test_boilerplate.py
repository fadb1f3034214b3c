"""boilerplate_strip: corpus-frequency line removal + in-order
document reassembly, including the all-boilerplate edge case."""

from __future__ import annotations

from osmgraft.operators.text import boilerplate_strip


def _run(spark, docs, frac):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r.doc_id: r
        for r in boilerplate_strip(df, doc_frac=frac).collect()
    }


def test_strips_common_keeps_rare_in_order(spark):
    docs = [
        (1, "NAV\nbody one\ntail 1"),
        (2, "NAV\nbody two\ntail 2"),
        (3, "NAV\nbody three\ntail 3"),
        (4, "NAV\nbody four\ntail 4"),
    ]
    out = _run(spark, docs, 0.5)  # NAV in 4/4 docs > 50%
    assert out[1].n_lines == 3 and out[1].n_kept == 2
    assert out[1].clean_text == "body one\ntail 1"
    assert out[3].clean_text == "body three\ntail 3"


def test_all_boilerplate_doc_survives_empty(spark):
    docs = [
        (1, "NAV"),
        (2, "NAV"),
        (3, "NAV"),
        (4, "NAV\nunique line"),
    ]
    out = _run(spark, docs, 0.5)
    assert out[1].n_kept == 0 and out[1].clean_text == ""
    assert out[4].clean_text == "unique line"


def test_repeated_line_in_one_doc_counts_once(spark):
    # "x" appears twice in doc 1 but in only 1 of 4 documents:
    # document frequency (not occurrence count) must drive removal
    docs = [
        (1, "x\nx\na"),
        (2, "b"),
        (3, "c"),
        (4, "d"),
    ]
    out = _run(spark, docs, 0.5)
    assert out[1].n_kept == 3
    assert out[1].clean_text == "x\nx\na"


def test_no_python_stage(spark):
    df = spark.createDataFrame(
        [(1, "a\nb")], "doc_id long, text string"
    )
    plan = (
        boilerplate_strip(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
