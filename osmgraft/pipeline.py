"""The composed corpus-build pipeline — every webtext stage of the
engine chained into the single job a training-data team would
actually run over a 100-TB crawl:

    raw docs
      -> boilerplate-line removal        (text.boilerplate_strip)
      -> PII redaction                   (text.pii_scrub)
      -> corpus filter verdict + keep    (text.corpus_filter_verdict)
      -> deterministic stratified mix    (text.stratified_sample)
      -> sequence-packing prefix sum     (indexing.with_running_total)
      [-> manifest-committed bucketed write (manifest.run_resumable)]

Composition notes (what the fused plan looks like):
- boilerplate needs two keyed shuffles of the exploded lines and a
  doc-list join; PII scrubbing and token counting then ride the
  same projection (map-only) — no extra pass;
- the filter verdict adds exactly one fingerprint-window shuffle;
- the stratified mix is a pushdown-friendly hash filter (free);
- packing range-partitions the SURVIVORS only (the small end of
  the funnel) for the distributed prefix sum.
Net: ~6 keyed exchanges end to end at any scale, each
partial-aggregated, none SinglePartition over data.

Resumability: `corpus_build_resumable` buckets the packed output
by training-window bin and writes through the checkpoint manifest
(manifest.py) — a killed job resumes from the last committed
bucket group, and per-bucket lineage + row counts are auditable
(north_rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .operators.indexing import with_running_total
from .operators.text import (
    boilerplate_strip,
    corpus_filter_verdict,
    pii_scrub,
    stratified_sample,
)


def corpus_build(
    docs: DataFrame,
    *,
    boiler_frac: float = 0.3,
    min_len: int = 100,
    max_dup_frac: float = 0.2,
    lang: str = "en",
    mix: dict[str, float] | None = None,
    mix_seed: int = 11,
    default_frac: float = 0.5,
    pack_tokens: int = 512,
) -> DataFrame:
    """docs(doc_id, text, lang) -> packed training-window plan
    (doc_id, lang, n_tokens, cum_tokens, bin) for the documents
    that survive cleaning, filtering, and mixing.

    Every stage is an already-oracle-tested operator; this function
    only owns the composition order: cleaning BEFORE the verdict
    (quality heuristics must see the text a model would train on),
    mixing AFTER the verdict (keep rates apply to the kept pool),
    packing last (windows are assigned over the final corpus)."""
    clean = boilerplate_strip(docs, doc_frac=boiler_frac).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    scrub = pii_scrub(clean).select(
        "doc_id", F.col("scrubbed").alias("text")
    )
    verdict = corpus_filter_verdict(
        scrub,
        min_len=min_len,
        max_dup_frac=max_dup_frac,
        lang=lang,
    )
    kept = (
        scrub.join(
            verdict.filter(F.col("keep")).select("doc_id"),
            "doc_id",
        )
        .join(docs.select("doc_id", "lang"), "doc_id")
    )
    mixed = stratified_sample(
        kept,
        mix or {},
        seed=mix_seed,
        default_frac=default_frac,
    )
    toks = mixed.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    packed = with_running_total(
        toks,
        order_cols=["doc_id"],
        value_col="n_tokens",
        out_col="cum_tokens",
    )
    return packed.select(
        "doc_id",
        "lang",
        "n_tokens",
        "cum_tokens",
        F.expr(f"(cum_tokens - n_tokens) div {pack_tokens}").alias(
            "bin"
        ),
    )


def corpus_build_resumable(
    docs: DataFrame,
    out_dir: str,
    n_buckets: int = 64,
    buckets_per_commit: int = 16,
    input_lineage: str = "",
    max_commits: int | None = None,
    **kwargs,
) -> int:
    """corpus_build written through the checkpoint manifest,
    bucketed by training-window bin — resume-safe like
    flagship_resumable. Returns commit groups executed."""
    from .manifest import run_resumable, with_bucket

    packed = corpus_build(docs, **kwargs)
    bucketed = with_bucket(packed, "bin", n_buckets)
    return run_resumable(
        bucketed,
        out_dir,
        n_buckets=n_buckets,
        buckets_per_commit=buckets_per_commit,
        input_lineage=input_lineage,
        max_commits=max_commits,
    )


def funnel_report(
    docs: DataFrame,
    *,
    boiler_frac: float = 0.3,
    min_len: int = 100,
    max_dup_frac: float = 0.2,
    lang: str = "en",
    mix: dict[str, float] | None = None,
    mix_seed: int = 11,
    default_frac: float = 0.5,
    pack_tokens: int = 512,
) -> DataFrame:
    """One-row observability report for the corpus-build funnel —
    the numbers a pipeline owner actually watches: input size,
    boilerplate lines stripped, PII redactions, per-rule verdict
    failure attribution, mix survivors, packed token total and
    training-window count.

    Plan shape (round 4 — the twelve one-row branches collapsed):
    ONE enriched per-doc frame carries every stage's counters as
    columns (boilerplate strip -> pii counts -> verdict flags ->
    inlined stratified-sample membership -> conditional token
    count), pinned with a lazy localCheckpoint so the lineage runs
    ONCE; the distributed prefix sum rides on it for the packing
    bins, and a SINGLE multi-aggregate pass produces all twelve
    scalars — conditional sums instead of per-scalar branches, so
    the old 25-exchange plan drops to the enrichment shuffles plus
    one aggregation."""
    clean_full = boilerplate_strip(docs, doc_frac=boiler_frac)
    scrub_full = pii_scrub(
        clean_full.select(
            "doc_id",
            "n_lines",
            "n_kept",
            F.col("clean_text").alias("text"),
        ),
        carry_cols=True,
    )
    verdict = corpus_filter_verdict(
        scrub_full.select(
            "doc_id",
            "n_lines",
            "n_kept",
            "n_emails",
            F.col("scrubbed").alias("text"),
        ),
        min_len=min_len,
        max_dup_frac=max_dup_frac,
        lang=lang,
        carry_cols=True,
    )
    # inlined stratified_sample membership (text.stratified_sample:
    # keep iff hash(key, seed)/2^32 < frac[stratum]) — a COLUMN on
    # the one frame instead of a filtered branch
    h = F.pmod(
        (F.col("doc_id").cast("long") + F.lit(mix_seed))
        * F.lit(2654435761),
        F.lit(4294967296),
    )
    frac = F.lit(default_frac)
    for value, fr in (mix or {}).items():
        frac = F.when(
            F.col("lang") == value, F.lit(float(fr))
        ).otherwise(frac)
    in_mix = F.col("keep") & (h < frac * F.lit(4294967296.0))
    enriched = (
        verdict.join(docs.select("doc_id", "lang"), "doc_id")
        .withColumn("mixed", in_mix)
        .select(
            "doc_id",
            "n_lines",
            "n_kept",
            "n_emails",
            "lang_ok",
            "len_ok",
            "rep_ok",
            "dedup_ok",
            "keep",
            "mixed",
            F.when(
                F.col("mixed"),
                F.size(F.split("text", " ")).cast("long"),
            )
            .otherwise(F.lit(0))
            .alias("mtoks"),
        )
        .localCheckpoint(eager=False)
    )
    packed = with_running_total(
        enriched, order_cols=["doc_id"], value_col="mtoks",
        out_col="cum_tokens",
    )

    def _zero(c):
        return F.coalesce(c, F.lit(0)).cast("long")

    def _nsum(c):
        return _zero(F.sum(F.col(c).cast("long")))

    def _nfail(c):
        return _zero(F.sum((~F.col(c)).cast("long")))

    return packed.agg(
        F.count("*").cast("long").alias("n_docs"),
        _zero(F.sum("n_lines")).alias("n_lines"),
        _zero(F.sum("n_kept")).alias("n_lines_kept"),
        _zero(F.sum("n_emails")).alias("n_emails"),
        _nsum("keep").alias("n_keep"),
        _nfail("lang_ok").alias("n_fail_lang"),
        _nfail("len_ok").alias("n_fail_len"),
        _nfail("rep_ok").alias("n_fail_rep"),
        _nfail("dedup_ok").alias("n_fail_dedup"),
        _nsum("mixed").alias("n_mixed"),
        _zero(F.sum("mtoks")).alias("total_tokens"),
        F.countDistinct(
            F.when(
                F.col("mixed"),
                F.expr(
                    f"(cum_tokens - mtoks) div {pack_tokens}"
                ),
            )
        ).cast("long").alias("n_bins"),
    )


def crawl_frontier_plan(
    urls: DataFrame,
    rules: DataFrame,
    *,
    trap_threshold: int = 1000,
    per_round: int = 3,
) -> DataFrame:
    """urls(url) + robots rules(host, path_prefix, allow) -> the
    politeness-scheduled fetch plan for every URL that survives the
    crawl front gates — the crawl-side sibling of corpus_build,
    owning only the composition order:

      1. robots_gate first (the binding contract — a disallowed URL
         must not even be counted against trap statistics),
      2. crawler-trap template exclusion next (url_templates over
         the ALLOWED population; a template's URL count is its trap
         evidence),
      3. crawl_plan last (rounds are assigned over the final
         fetchable frontier, so the politeness budget is not spent
         on URLs the gates dropped).

    Every stage is an already-oracle-tested operator
    (operators/urls.py). Output: (url, host, slot, round,
    n_rounds)."""
    from .operators.urls import crawl_plan, robots_gate, url_templates

    allowed = robots_gate(urls, rules).where(
        F.col("allow") == 1
    )
    tmpl = F.regexp_replace(F.col("path"), r"[0-9]+", "{n}")
    traps = (
        url_templates(
            allowed.select("url"), trap_threshold=trap_threshold
        )
        .where(F.col("is_trap"))
        .select("host", "template")
    )
    survivors = (
        allowed.withColumn("template", tmpl)
        .join(traps, ["host", "template"], "left_anti")
        .select("url")
    )
    return crawl_plan(survivors, per_round=per_round)
