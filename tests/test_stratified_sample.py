"""stratified_sample: membership is a pure function of the key —
invariant under repartitioning and row additions; per-stratum rates
approach the requested fractions."""

from __future__ import annotations

from pyspark.sql import functions as F

from osmgraft.operators.text import stratified_sample

FRACS = {"en": 0.5, "de": 0.25}


def _docs(spark, n=20000):
    return spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de")
        .otherwise("fr")
        .alias("lang"),
    )


def _ids(df):
    return {r.doc_id for r in df.select("doc_id").collect()}


def test_invariant_under_partitioning(spark):
    docs = _docs(spark)
    a = _ids(stratified_sample(docs, FRACS, seed=3))
    b = _ids(stratified_sample(docs.repartition(17), FRACS, seed=3))
    assert a == b


def test_unchanged_rows_keep_membership_when_rows_added(spark):
    base = _docs(spark, 10000)
    grown = _docs(spark, 20000)
    a = _ids(stratified_sample(base, FRACS, seed=3))
    b = _ids(stratified_sample(grown, FRACS, seed=3))
    assert a == {i for i in b if i < 10000}


def test_rates_and_default(spark):
    docs = _docs(spark)
    out = stratified_sample(docs, FRACS, seed=3, default_frac=0.0)
    rates = {
        r.lang: r.n
        for r in out.groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    n_per_stratum = 20000 / 3
    assert abs(rates["en"] / n_per_stratum - 0.5) < 0.05
    assert abs(rates["de"] / n_per_stratum - 0.25) < 0.05
    assert "fr" not in rates  # default_frac=0 drops the stratum


def test_seed_changes_selection(spark):
    docs = _docs(spark)
    a = _ids(stratified_sample(docs, FRACS, seed=3))
    b = _ids(stratified_sample(docs, FRACS, seed=4))
    assert a != b
