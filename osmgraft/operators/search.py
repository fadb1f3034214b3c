"""Text search primitives over the corpus: inverted-index build
and per-document distinctive terms (integer-exact TF-IDF rank).

The geobase build (wire/ogb.py, q36) already constructs posting
lists over ADDRESS keys; this is the same structure over free
text — the index a corpus-search / decontamination-lookup service
would serve.

Scale shapes:
- inverted_index: hot terms ("the") have corpus-sized posting
  lists — a holistic aggregate with built-in skew, so stage 1
  collects per (term, salt) exactly like tiles.tile_doc_lists'
  megacity handling, stage 2 merges per term. min_df/max_df gate
  the stopword class out of the index entirely (the standard
  production dodge: the full-corpus posting list of "the" is
  useless AND quadratic to serve).
- distinctive_terms: per-(doc, term) tf is one map-side-combined
  shuffle; the document-frequency join keys on the term (AQE skew
  territory); the top-k window partitions by doc — never global.
  Ranking is (tf desc, df asc, term asc): a pure integer TF-IDF —
  monotone in tf * idf for fixed tf because idf is monotone
  decreasing in df — with no float log, so oracle-exact."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _doc_terms(df: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, term, tf) — per-document term frequencies, one
    explode + one map-side-combined groupBy."""
    return (
        df.select(
            "doc_id",
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    min_df: int = 1,
    max_df: int | None = None,
    salt_buckets: int = 16,
) -> DataFrame:
    """(term, doc_freq, postings) with postings the SORTED doc-id
    list. Salted two-stage holistic aggregate (stage 1 per
    (term, salt) so a hot term spreads over salt_buckets reducers,
    stage 2 merges+sorts per term); df-band filters prune after
    the cheap count, before any list is served."""
    terms = _doc_terms(df, text_col).withColumn(
        "_salt", F.pmod(F.col("doc_id"), F.lit(salt_buckets))
    )
    partial = terms.groupBy("term", "_salt").agg(
        F.collect_list("doc_id").alias("_ids"),
        F.count("*").cast("long").alias("_n"),
    )
    idx = partial.groupBy("term").agg(
        F.array_sort(F.flatten(F.collect_list("_ids"))).alias(
            "postings"
        ),
        F.sum("_n").cast("long").alias("doc_freq"),
    )
    idx = idx.filter(F.col("doc_freq") >= min_df)
    if max_df is not None:
        idx = idx.filter(F.col("doc_freq") <= max_df)
    return idx.select("term", "doc_freq", "postings")


def distinctive_terms(
    df: DataFrame, k: int = 3, text_col: str = "text"
) -> DataFrame:
    """Top-k most distinctive terms per document — the integer
    TF-IDF: rank by (tf desc, doc_freq asc, term asc), take k.
    Returns (doc_id, term, tf, doc_freq, rank)."""
    tf = _doc_terms(df, text_col)
    dfreq = tf.groupBy("term").agg(
        F.count("*").cast("long").alias("doc_freq")
    )
    joined = tf.join(dfreq, "term")
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("doc_freq"), F.asc("term")
    )
    return (
        joined.withColumn(
            "rank", F.row_number().over(w).cast("long")
        )
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "doc_freq", "rank")
    )


def search_and(
    index: DataFrame, terms: list[str]
) -> DataFrame:
    """Conjunctive posting-list intersection: docs containing ALL
    `terms`, served from the index — explode each requested term's
    postings and keep doc_ids hit by every term (count == number
    of requested terms; postings are per-term distinct by
    construction). The requested-terms filter prunes the index
    scan; only the handful of needed lists ever explode."""
    n = len(terms)
    hits = (
        index.filter(F.col("term").isin(terms))
        .select(F.explode("postings").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("_hits"))
    )
    return hits.filter(F.col("_hits") == n).select("doc_id")


def ranked_search(
    df: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Disjunctive ranked retrieval: (query_id, rank, doc_id,
    score) — the top-k documents per query by the INTEGER score

        score(q, d) = sum over matched terms of tf(t, d) * (N div df(t))

    i.e. classic tf-idf with the idf kept as exact integer
    division (no log), so scores and ranks replay bit-for-bit in
    any engine; ties break (score desc, doc_id asc).

    Plan: term-frequency table = one groupBy(doc, term) shuffle;
    df table folds off it (term-keyed, AQE handles hot terms); the
    query term list is tiny and BROADCAST into the tf table — the
    corpus is never scanned per query; final per-query top-k is a
    window over the scored candidates only."""
    from pyspark.sql import Window

    n_docs = df.count()
    # pinned: tf feeds BOTH the df rollup and the scoring join —
    # without the pin each consumer re-runs the corpus scan +
    # tokenize (the q76 fan-out lesson; verified 2 scans -> 1)
    tf = (
        df.select(
            "doc_id",
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("term").agg(
        F.count("*").cast("long").alias("df")
    )
    qterms = (
        queries.select(
            "query_id",
            F.explode(F.split("qtext", " ")).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(dfreq, "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(
                F.col("tf") * F.expr(f"{n_docs} div df")
            ).alias("score")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn(
            "rank", F.row_number().over(w).cast("long")
        )
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def anchor_text_index(
    links: DataFrame,
    top_n: int = 3,
) -> DataFrame:
    """Anchor-text index: the classic crawl/ranking signal — for
    every link target, the terms other pages use when linking to
    it, ranked per target. Input (dst_host, anchor_text); output
    (host, term, cnt, rank) keeping the top_n terms per host by
    (count DESC, term ASC).

    Shape: one (host, term) groupBy with map-side combine over the
    exploded anchor tokens, then a window partitioned BY HOST — the
    sort is per-target over its distinct anchor vocabulary (bounded
    by language, not corpus), never a global sort. The hot-target
    skew case (everyone links to one homepage) is exactly what the
    partial aggregation absorbs: duplicates combine map-side before
    the shuffle."""
    from pyspark.sql import Window

    terms = links.select(
        F.col("dst_host").alias("host"),
        F.explode(F.split(F.col("anchor_text"), " ")).alias("term"),
    ).where(F.length("term") >= 1)
    counts = terms.groupBy("host", "term").agg(
        F.count("*").cast("long").alias("cnt")
    )
    w = Window.partitionBy("host").orderBy(
        F.desc("cnt"), F.asc("term")
    )
    return (
        counts.withColumn(
            "rank", F.row_number().over(w).cast("long")
        )
        .where(F.col("rank") <= top_n)
        .select("host", "term", "cnt", "rank")
    )


def pmi_pairs(
    df: DataFrame,
    vocab_k: int = 200,
    min_co: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Term co-occurrence lift (the integer PMI core) over a
    bounded vocabulary: for every pair of top-vocab_k terms that
    co-occur in >= min_co documents, the exact rational lift
    P(t1,t2)/(P(t1)P(t2)) shipped as integers — lift_num = co * N,
    lift_den = n1 * n2 (PMI = log of that ratio; the log is
    monotone, so ranking/thresholding needs only the cross-
    multiplied integers and no float ever enters).  The collocation
    / topic-drift primitive corpus-analysis pipelines run next to
    distinctive_terms.

    Scale shape: the vocabulary is an exact global top-k by
    document frequency (TakeOrdered — per-partition heads, driver
    merge of vocab_k rows), broadcast back as an equi-join gate, so
    the per-document pair explosion is bounded by (vocab hits per
    doc)^2 <= vocab_k^2 and in practice by document length; the
    pair groupBy output is <= vocab_k^2 rows total.  No all-pairs
    join on the corpus anywhere.
    """
    dt = _doc_terms(df, text_col).select("doc_id", "term")
    dfreq = dt.groupBy("term").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    vocab = dfreq.orderBy(
        F.desc("n_docs"), F.asc("term")
    ).limit(vocab_k)
    gated = dt.join(F.broadcast(vocab), "term")
    n_total = df.select(
        F.count("*").cast("long").alias("n_corpus")
    )
    pairs = (
        gated.select(
            "doc_id",
            F.col("term").alias("t1"),
            F.col("n_docs").alias("n1"),
        )
        .join(
            gated.select(
                "doc_id",
                F.col("term").alias("t2"),
                F.col("n_docs").alias("n2"),
            ),
            "doc_id",
        )
        .where(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2", "n1", "n2")
        .agg(F.count("*").cast("long").alias("co"))
        .where(F.col("co") >= min_co)
    )
    return pairs.crossJoin(F.broadcast(n_total)).select(
        "t1",
        "t2",
        "co",
        "n1",
        "n2",
        (F.col("co") * F.col("n_corpus"))
        .cast("long")
        .alias("lift_num"),
        (F.col("n1") * F.col("n2")).cast("long").alias("lift_den"),
    )


def skipgram_counts(
    df: DataFrame,
    window_k: int = 2,
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Positional co-occurrence counts — the (center, context)
    pair-frequency table word2vec/GloVe training starts from:
    count of (w_i, w_j) with 0 < j - i <= window_k over every
    document, direction preserved (center first).  The positional
    sibling of pmi_pairs (which is doc-level and unordered).

    Scale shape: the naive plan self-joins tokens on doc_id and
    filters |i-j| <= k — a per-document QUADRATIC intermediate
    that dies on long documents.  This plan instead explodes each
    token into its k FORWARD target positions ((doc_id, i+1) ..
    (doc_id, i+k)) and equi-joins on the exact (doc_id, pos) key:
    the intermediate is len*k rows per document, linear in corpus
    size, and the join is an ordinary bucketed hash join.  One
    final map-side-combined groupBy on the bounded pair
    vocabulary.
    """
    toks = df.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), " ")).alias(
            "pos", "term"
        ),
    ).where(F.col("term") != "")
    probes = toks.select(
        "doc_id",
        F.col("term").alias("center"),
        F.explode(
            F.sequence(
                F.col("pos") + 1, F.col("pos") + window_k
            )
        ).alias("pos"),
    )
    pairs = probes.join(
        toks.select(
            "doc_id", "pos", F.col("term").alias("context")
        ),
        ["doc_id", "pos"],
    )
    return (
        pairs.groupBy("center", "context")
        .agg(F.count("*").cast("long").alias("n"))
        .where(F.col("n") >= min_count)
    )
