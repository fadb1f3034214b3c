"""corpus_build: end-to-end composition semantics + kill/resume
through the manifest, and the funnel's monotonicity (each stage
only removes or relabels, never invents documents)."""

from __future__ import annotations

from pyspark.sql import functions as F

from osmgraft.manifest import committed_buckets, read_committed
from osmgraft.pipeline import corpus_build, corpus_build_resumable


def _docs(spark, n=400):
    d = F.col("id")
    text = F.concat_ws(
        "\n",
        F.lit("NAV BAR"),
        F.concat(
            F.lit("the quick brown fox jumps over the lazy dog "
                  "word"),
            d.cast("string"),
            F.lit(" more filler text to cross the length floor "
                  "for most documents in this corpus"),
        ),
        F.when(d % 2 == 0, F.lit("FOOTER (c) corp")),
        F.concat(
            F.lit("tail "),
            d.cast("string"),
            F.lit(" contact u"),
            d.cast("string"),
            F.lit("@ex.com"),
        ),
    )
    lang = (
        F.when(d % 3 == 0, F.lit("en"))
        .when(d % 3 == 1, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return spark.range(0, n).select(
        d.alias("doc_id"), text.alias("text"), lang.alias("lang")
    )


def test_funnel_semantics(spark):
    docs = _docs(spark)
    out = corpus_build(
        docs, min_len=80, mix={"en": 1.0, "de": 1.0}, default_frac=1.0
    )
    rows = out.orderBy("doc_id").collect()
    assert rows, "funnel must not be empty"
    # survivors are a subset of the input ids
    ids = {r.doc_id for r in rows}
    assert ids <= set(range(400))
    # cum_tokens is the inclusive prefix sum in doc_id order
    acc = 0
    for r in rows:
        acc += r.n_tokens
        assert r.cum_tokens == acc
        assert r.bin == (r.cum_tokens - r.n_tokens) // 512
    # PII + boilerplate really happened: token counts reflect the
    # cleaned text (no doc kept its NAV/FOOTER lines — each line
    # would add tokens; cleaned text has body+tail only)
    # body = 12 words + wordN token merged? body is one line of
    # known words; just assert a sane fixed band
    assert all(10 <= r.n_tokens <= 30 for r in rows)


def test_mix_rate_zero_drops_stratum(spark):
    docs = _docs(spark)
    out = corpus_build(
        docs, min_len=80,
        mix={"en": 1.0, "de": 0.0}, default_frac=0.0,
    )
    langs = {r.lang for r in out.select("lang").distinct().collect()}
    assert langs <= {"en"}


def test_kill_and_resume_matches_single_shot(spark, tmp_path):
    docs = _docs(spark)
    kw = dict(min_len=80, mix={"en": 1.0, "de": 1.0},
              default_frac=1.0)
    single = {
        (r.doc_id, r.cum_tokens, r.bin)
        for r in corpus_build(docs, **kw).collect()
    }

    out = str(tmp_path / "corpus")
    done = corpus_build_resumable(
        docs, out, n_buckets=8, buckets_per_commit=2,
        input_lineage="crawl@snap1", max_commits=2, **kw,
    )
    assert done == 2
    assert len(committed_buckets(spark, out)) == 4
    # resume finishes the rest
    corpus_build_resumable(
        docs, out, n_buckets=8, buckets_per_commit=2,
        input_lineage="crawl@snap1", **kw,
    )
    assert len(committed_buckets(spark, out)) == 8
    final = {
        (r.doc_id, r.cum_tokens, r.bin)
        for r in read_committed(spark, out)
        .select("doc_id", "cum_tokens", "bin")
        .collect()
    }
    assert final == single


def test_funnel_report_consistent_with_build(spark):
    from osmgraft.pipeline import funnel_report

    docs = _docs(spark)
    kw = dict(min_len=80, mix={"en": 1.0, "de": 1.0},
              default_frac=1.0)
    rep = funnel_report(docs, **kw).collect()[0]
    built = corpus_build(docs, **kw).collect()
    assert rep.n_docs == 400
    assert rep.n_lines_kept <= rep.n_lines
    # every doc has one email in its tail line and tails survive
    assert rep.n_emails == 400
    assert rep.n_mixed == len(built)
    assert rep.total_tokens == sum(r.n_tokens for r in built)
    assert rep.n_bins == len({r.bin for r in built})
    # failure attribution covers the non-kept docs (rules overlap,
    # so the sum of failures is >= the number of dropped docs)
    dropped = rep.n_docs - rep.n_keep
    assert (
        rep.n_fail_lang + rep.n_fail_len + rep.n_fail_rep
        + rep.n_fail_dedup
        >= dropped
    )
