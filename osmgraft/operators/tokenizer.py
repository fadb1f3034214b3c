"""Tokenizer-induction operators: distributed BPE statistics.

Byte-pair encoding (Sennrich et al. 2016, public algorithm) trains
on corpus-wide symbol-pair frequencies. At 100 TB the expensive part
is exactly one distributed primitive — a weighted pair count over
the corpus vocabulary — while the merge-table itself is tiny and
lives on the driver. This module keeps that split explicit:

- `word_counts`:   corpus -> (word, count). One shuffle with
                   map-side partial aggregation; the result is the
                   vocabulary table every BPE iteration reuses (it
                   is orders of magnitude smaller than the corpus —
                   Heaps' law — so iterating over it, not the
                   corpus, is the standard scale plan).
- `bpe_pair_counts`: adjacent-symbol pair frequencies weighted by
                   word count, pure Catalyst (transform over a
                   sequence; no UDF, no explode of the corpus).
- `bpe_train`:     N merge iterations. Each iteration is ONE
                   distributed job over the (cached) vocabulary:
                   count pairs, take the argmax on the driver
                   (collect of a single row), apply the merge to
                   the symbol arrays with an in-row F.aggregate
                   fold. No Python loop ever touches row data.

Reference note: the reference engine (osmctools) has no tokenizer;
this is part of the training-data-pipeline surface the task brief
adds on top of reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SEP = "\x1f"


def word_counts(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, count) over whitespace tokens. Empty tokens dropped.
    Algebraic groupBy — partial counts combine map-side, so the
    shuffle carries one row per distinct word per task."""
    return (
        df.select(
            F.explode(F.split(F.col(text_col), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("n"))
    )


def _pairs_expr(syms):
    """adjacent-pair array over a symbol array (in-row, Catalyst)."""
    cnt = F.size(syms)
    return F.when(
        cnt >= 2,
        F.transform(
            F.sequence(F.lit(1), cnt - 1),
            lambda i: F.concat_ws(
                _SEP, F.element_at(syms, i), F.element_at(syms, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _chars_expr(word):
    """split a word into single-character symbols (in-row)."""
    return F.filter(F.split(word, ""), lambda c: c != "")


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    top: int | None = None,
) -> DataFrame:
    """Initial BPE statistics: adjacent CHARACTER-pair frequencies
    over the corpus, weighted by word frequency. Returns
    (left, right, pair_count) ordered by (count desc, pair asc)
    when `top` is set (deterministic total order, so a LIMIT is
    reproducible and oracle-checkable).

    Plan: corpus -> word_counts (one shuffle) -> in-row pair
    transform + explode of the VOCABULARY (small) -> one more
    algebraic groupBy. The corpus itself is touched exactly once.
    """
    wc = word_counts(df, text_col)
    pairs = wc.select(
        F.explode(_pairs_expr(_chars_expr(F.col("word")))).alias(
            "pair"
        ),
        F.col("n"),
    )
    out = (
        pairs.groupBy("pair")
        .agg(F.sum("n").cast("long").alias("pair_count"))
        .select(
            F.split(F.col("pair"), _SEP).getItem(0).alias("left"),
            F.split(F.col("pair"), _SEP).getItem(1).alias("right"),
            "pair_count",
        )
    )
    if top is not None:
        out = out.orderBy(
            F.col("pair_count").desc(), F.col("left"), F.col("right")
        ).limit(top)
    return out


def _merge_expr(syms, left: str, right: str):
    """apply ONE BPE merge (left,right) -> left||right to a symbol
    array, left-to-right non-overlapping, as an in-row fold.

    The fold carries (acc_array, pending_prev_symbol); a match of
    (pending, current) == (left, right) emits the merged symbol and
    clears pending, exactly the sequential semantics of the
    reference algorithm (so "a a a" under merge (a,a) -> ["aa","a"]).
    """
    init = F.struct(
        F.array().cast("array<string>").alias("acc"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(st, s):
        match = (
            st.pend.isNotNull()
            & (st.pend == F.lit(left))
            & (s == F.lit(right))
        )
        return (
            F.when(
                match,
                F.struct(
                    F.concat(
                        st.acc, F.array(F.lit(left + right))
                    ).alias("acc"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            )
            .when(
                st.pend.isNull(),
                F.struct(st.acc.alias("acc"), s.alias("pend")),
            )
            .otherwise(
                F.struct(
                    F.concat(st.acc, F.array(st.pend)).alias("acc"),
                    s.alias("pend"),
                )
            )
        )

    def fin(st):
        return F.when(
            st.pend.isNotNull(), F.concat(st.acc, F.array(st.pend))
        ).otherwise(st.acc)

    return F.aggregate(syms, init, step, fin)


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merges from the corpus. Returns the
    merge list in order.

    Per iteration: one distributed pair-count over the cached
    vocabulary (the ONLY job), a 1-row collect for the argmax
    (count desc, then lexicographic pair for determinism), and an
    in-row fold applying the merge. The vocabulary DataFrame is
    re-cached every iteration and the corpus is scanned once total.
    """
    vocab = word_counts(df, text_col).select(
        _chars_expr(F.col("word")).alias("syms"), "n"
    )
    vocab = vocab.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = (
            vocab.select(
                F.explode(_pairs_expr(F.col("syms"))).alias("pair"),
                "n",
            )
            .groupBy("pair")
            .agg(F.sum("n").alias("c"))
            .orderBy(F.col("c").desc(), F.col("pair"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right = best[0]["pair"].split(_SEP)
        merges.append((left, right))
        nxt = vocab.select(
            _merge_expr(F.col("syms"), left, right).alias("syms"),
            "n",
        ).localCheckpoint(eager=True)
        vocab.unpersist()
        vocab = nxt
    vocab.unpersist()
    return merges


def _mark(sym: str) -> str:
    """marker-bracketed symbol: \\x1f<sym>\\x1e. The brackets make
    every symbol self-delimiting inside a flat string, so one
    literal replace() of mark(a)+mark(b) -> mark(a+b) is exactly
    one BPE merge pass: replace scans left-to-right and continues
    AFTER each replacement — the same non-overlapping greedy
    semantics as _merge_expr's fold (proved against it in
    tests/test_tokenizer.py), and a match can never start or end
    mid-symbol or cross the unwrapped space between words."""
    return "\x1f" + sym + "\x1e"


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned merge list to the corpus: per document, the
    BPE symbol count after segmentation (plus the whitespace word
    count for the compression view). Map-only pass.

    Plan: flat string ops, NOT a per-word fold. Every non-space
    character is marker-wrapped in one regexp_replace, each merge
    is one literal replace(), and the symbol count is a length
    difference. The first cut nested one F.aggregate fold per merge
    inside a transform lambda — a giant whole-stage-codegen unit
    whose ~10s Janino compile was re-paid every bench round as the
    generated-class cache rotated (16.1s min-of-3 vs 0.6s warm; the
    q66 finding, BASELINE.md round 3). The string plan's codegen
    unit is tiny and the per-merge cost is one vectorized scan.
    _merge_expr's fold remains the engine for bpe_train, which
    needs real symbol ARRAYS over the vocabulary table.

    Caveat (shared with every \\x1f-separator operator here): texts
    containing U+001F/U+001E would corrupt the marker encoding."""
    toks = F.split(F.col(text_col), " ")
    seg = F.regexp_replace(F.col(text_col), "([^ ])", "\x1f$1\x1e")
    for left, right in merges:
        seg = F.replace(
            seg,
            F.lit(_mark(left) + _mark(right)),
            F.lit(_mark(left + right)),
        )
    # staged projection: _seg is referenced twice below; the
    # boundary keeps the replace chain evaluated once.
    out = df.withColumn("_seg", seg)
    return out.select(
        "doc_id",
        F.size(F.filter(toks, lambda t: t != ""))
        .cast("long")
        .alias("n_words"),
        (
            F.length("_seg")
            - F.length(
                F.replace(F.col("_seg"), F.lit("\x1f"), F.lit(""))
            )
        )
        .cast("long")
        .alias("n_bpe_symbols"),
    )


def vocab_top_grams(
    words: DataFrame,
    k_max: int = 4,
    top_n: int = 32,
) -> DataFrame:
    """Top-`top_n` character 2..k_max-grams of a (word) column by
    (count DESC, gram ASC). The gram table this ranks is bounded by
    |alphabet|^k_max — independent of corpus size — so the global
    top-N window is a bounded funnel, not a corpus sort (same class
    as the heavy-hitter gate in sketches.py)."""
    # sequence(1, n) with n <= 0 COUNTS DOWN in Spark, so the upper
    # bound clamps to 1 and an explicit filter drops start positions
    # whose k-gram would run past the word end (words shorter than
    # k contribute nothing, matching the oracle's i + k - 1 <= len)
    grams = words.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(2), F.lit(k_max)),
                    lambda k: F.transform(
                        F.filter(
                            F.sequence(
                                F.lit(1),
                                F.greatest(
                                    F.length("word") - k + 1,
                                    F.lit(1),
                                ),
                            ),
                            lambda i: i + k - 1
                            <= F.length("word"),
                        ),
                        lambda i: F.expr("word").substr(i, k),
                    ),
                )
            )
        ).alias("gram")
    )
    from pyspark.sql import Window

    counts = grams.groupBy("gram").agg(F.count("*").alias("cnt"))
    w = Window.orderBy(F.desc("cnt"), F.asc("gram"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top_n)
        .select("gram", F.col("cnt").cast("long").alias("cnt"))
    )


def segment_optimal(
    docs: DataFrame,
    max_word_len: int = 12,
    max_token_len: int = 4,
    top_n: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Optimal (minimum-token-count) segmentation of each doc's
    first word against a corpus-derived subword vocabulary — the
    Viterbi/unigram-style DP that SentencePiece uses, where greedy
    BPE merging (bpe_segment above) can be suboptimal: vocabulary
    {ab, bc, c, a, b} segments "abc" greedily as a|bc or ab|c
    depending on merge order, but the DP always finds the 2-token
    optimum.

    cost[j] = min over k<=max_token_len of cost[j-k] + 1 for every
    k-suffix ending at j that is a vocab gram (k=1 single chars are
    always available — the <unk>-free byte fallback). The whole DP
    runs IN-ROW as one F.aggregate fold over positions (the word is
    <= max_word_len chars), with the tiny vocabulary embedded as a
    literal array — zero shuffles beyond the vocab derivation, the
    dominant cost is one corpus scan. Output: (doc_id, word,
    word_len, n_tokens).

    Determinism: the vocab is top-N by (count DESC, gram ASC); the
    DP returns only the optimal COUNT (unique), never a
    tie-dependent token sequence.
    """
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.substring(
            F.split(F.col(text_col), " ")[0], 1, max_word_len
        ).alias("word"),
    ).where(F.length("word") >= 1)
    vocab = [
        r.gram
        for r in vocab_top_grams(
            words, k_max=max_token_len, top_n=top_n
        ).collect()
    ]
    vocab_arr = F.array(*[F.lit(g) for g in sorted(vocab)])
    big = F.lit(1 << 30).cast("long")

    def step(acc, j):
        # acc holds cost[0..j-1]; append cost[j]
        cands = [
            F.when(
                (j - k >= 0)
                & (
                    F.lit(k == 1)
                    | F.array_contains(
                        vocab_arr,
                        F.expr("word").substr(j - k + 1, F.lit(k)),
                    )
                ),
                F.element_at(acc, j - k + 1) + F.lit(1).cast("long"),
            ).otherwise(big)
            for k in range(1, max_token_len + 1)
        ]
        return F.concat(acc, F.array(F.least(*cands)))

    costs = F.aggregate(
        F.sequence(F.lit(1), F.length("word")),
        F.array(F.lit(0).cast("long")),
        step,
    )
    return words.select(
        "doc_id",
        "word",
        F.length("word").cast("long").alias("word_len"),
        F.element_at(costs, F.length("word") + 1)
        .cast("long")
        .alias("n_tokens"),
    )
