"""Text-analysis + dedup operators for the training-data pipeline
(task brief: language-ID, quality scoring, token counting,
fingerprinting, exact + near dedup). All pure Catalyst expressions
where possible — they stay inside whole-stage codegen and push
column pruning to the scan; pandas UDFs only for MinHash/SimHash
bit-twiddling.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

# ----------------------------------------------------------------
# pure-expression operators (oracle-checkable in ANSI SQL)
# ----------------------------------------------------------------


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """whitespace token count + char count, JVM-side."""
    return df.select(
        "doc_id",
        F.size(F.split(F.col(text_col), " ")).cast("long").alias(
            "n_tokens"
        ),
        F.length(text_col).cast("long").alias("text_len"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """cheap quality heuristics: length, space/period densities,
    long/short bucket."""
    t = F.col(text_col)
    tl = F.length(t)
    return df.select(
        "doc_id",
        tl.cast("long").alias("text_len"),
        (tl - F.length(F.replace(t, F.lit(" "), F.lit(""))))
        .cast("long")
        .alias("n_spaces"),
        (tl - F.length(F.replace(t, F.lit("."), F.lit(""))))
        .cast("long")
        .alias("n_dots"),
        F.when(tl >= 300, F.lit("long"))
        .otherwise(F.lit("short"))
        .alias("len_bucket"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram-heuristic language ID: stopword-occurrence scores.
    Score = length shrink when the padded stopword is removed."""
    t = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    tl = F.length(t)

    def score(word):
        return (
            tl - F.length(F.replace(t, F.lit(f" {word} "), F.lit(" ")))
        ).cast("long")

    en = score("the")
    de = score("der")
    fr = score("le")
    return df.select(
        "doc_id",
        en.alias("score_en"),
        de.alias("score_de"),
        fr.alias("score_fr"),
        F.when((en >= de) & (en >= fr) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de > 0), F.lit("de"))
        .when(fr > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
        .alias("lang_pred"),
    )


def fingerprint(
    df: DataFrame, text_col: str = "text", k: int = 8
) -> DataFrame:
    """document fingerprint: minimum k-gram digest over all character
    k-grams (winnowing-lite). Pure expressions: sequence + transform
    + array_min; no UDF, no shuffle."""
    t = F.col(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(t) - (k - 1), F.lit(1))),
        lambda i: F.md5(t.substr(i, F.lit(k)).cast("binary")),
    )
    return df.select(
        "doc_id", F.array_min(grams).alias("fp")
    )


def dedup_exact(
    df: DataFrame, text_col: str = "text", prefix: int | None = None
) -> DataFrame:
    """exact dedup by content hash: keep lowest doc_id per digest,
    count the duplicates. Single hash-shuffle groupBy with map-side
    partial aggregation."""
    src = F.col(text_col)
    if prefix:
        src = F.substring(src, 1, prefix)
    return (
        df.select("doc_id", F.md5(src.cast("binary")).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keeper"),
            F.count("*").cast("long").alias("n_dups"),
        )
    )


# ----------------------------------------------------------------
# MinHash / SimHash near-dup (vectorized kernels; rows-only oracle)
# ----------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _shingle_hashes(texts: pd.Series, k: int) -> list[np.ndarray]:
    """per-doc array of k-shingle 64-bit polynomial hashes"""
    out = []
    for s in texts:
        b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
        if len(b) < k:
            out.append(np.zeros(1, dtype=np.uint64))
            continue
        # polynomial hash per window, base 257 mod 2^61-1
        # (vectorized Horner across the k window positions)
        base = np.uint64(257)
        mod = np.uint64(_MERSENNE)
        win = np.lib.stride_tricks.sliding_window_view(b, k).astype(
            np.uint64
        )
        acc = np.zeros(len(win), dtype=np.uint64)
        for j in range(k):
            acc = (acc * base + win[:, j]) % mod
        out.append(np.unique(acc))
    return out


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    n_hashes: int = 64,
    shingle_k: int = 5,
) -> DataFrame:
    """MinHash signature per doc: n_hashes universal-hash minima over
    k-shingles. Arrow-batched; parameters are fixed constants so the
    signature is deterministic."""
    rng = np.random.default_rng(1234)
    a = rng.integers(1, _MERSENNE, n_hashes, dtype=np.int64).astype(
        np.uint64
    )
    b = rng.integers(0, _MERSENNE, n_hashes, dtype=np.int64).astype(
        np.uint64
    )

    @F.pandas_udf("array<long>")
    def sig(texts: pd.Series) -> pd.Series:
        mod = np.uint64(_MERSENNE)
        res = []
        for sh in _shingle_hashes(texts, shingle_k):
            # (n_shingles, n_hashes) universal hashing, min per hash
            v = (sh[:, None] * a[None, :] + b[None, :]) % mod
            res.append(v.min(axis=0).astype(np.int64))
        return pd.Series(res)

    return df.select("doc_id", sig(F.col(text_col)).alias("minhash"))


def minhash_lsh_candidates(
    sigs: DataFrame, bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate
    pairs. explode(bands) -> groupBy bucket -> self-join within
    bucket. One shuffle on the band digest."""
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("minhash")[
                                        i * rows_per_band + j
                                    ]
                                    for j in range(rows_per_band)
                                ],
                            ).cast("binary")
                        ).alias("bucket"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    other = banded.select(
        F.col("doc_id").alias("doc_id_b"), "band", "bucket"
    )
    return (
        banded.join(other, on=["band", "bucket"])
        .filter(F.col("doc_id") < F.col("doc_id_b"))
        .select(
            F.col("doc_id").alias("a"), F.col("doc_id_b").alias("b")
        )
        .distinct()
    )


def simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash over whitespace tokens (weight 1 each)."""

    @F.pandas_udf("long")
    def sh(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.int64)
        for i, s in enumerate(texts):
            toks = s.split()
            if not toks:
                out[i] = 0
                continue
            hs = np.array(
                [hash_token(t) for t in toks], dtype=np.uint64
            )
            bits = (
                (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)
            ).astype(np.int64)
            v = np.where(bits.sum(axis=0) * 2 >= len(toks), 1, 0)
            out[i] = int(
                np.bitwise_or.reduce(
                    (v.astype(np.uint64) << np.arange(64, dtype=np.uint64))
                ).astype(np.int64)
            )
        return pd.Series(out)

    return df.select("doc_id", sh(F.col(text_col)).alias("simhash"))


def hash_token(t: str) -> int:
    """deterministic 64-bit FNV-1a (process-seed-independent)."""
    h = 0xCBF29CE484222325
    for ch in t.encode("utf-8"):
        h ^= ch
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """exact n-gram (word) Jaccard similarity pairs >= threshold via
    shingle explode + equi-join + group count:
      |A ∩ B| from the join, |A|,|B| from per-doc distinct counts,
      J = inter / (|A| + |B| - inter).
    Pure DataFrame ops — expressible in ANSI SQL for the oracle."""
    toks = F.split(F.col(text_col), " ")
    grams = df.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        F.size(toks) - n, F.lit(0)
                    ),
                ),
                lambda i: F.concat_ws(
                    " ", F.slice(toks, i + 1, n)
                ),
            )
        ).alias("gram"),
    ).distinct()
    sizes = grams.groupBy(id_col).agg(F.count("*").alias("sz"))
    g2 = grams.select(F.col(id_col).alias("_b"), "gram")
    inter = (
        grams.join(g2, on="gram")
        .filter(F.col(id_col) < F.col("_b"))
        .groupBy(F.col(id_col).alias("a"), F.col("_b").alias("b"))
        .agg(F.count("*").cast("long").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("szb"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.col("sza") + F.col("szb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "inter", "jaccard")
    )
