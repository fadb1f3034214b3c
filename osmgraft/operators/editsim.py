"""Edit-distance near-duplicate detection with exact deletion-
neighborhood blocking (the SymSpell candidate scheme).

The reference suite's near-dup family (MinHash/SimHash/aHash) is
token- or bit-similarity; this adds the character-level metric a
title/URL dedup pass needs: pairs within Levenshtein distance 1,
found WITHOUT an all-pairs comparison.

Blocking property (exact, not probabilistic): let D(s) = {s} ∪
{s with one character deleted}. If lev(s, r) <= 1 then D(s) and
D(r) intersect —
  - s = r:            share s itself;
  - one substitution: deleting the differing position from each
                      side yields the same string;
  - one insert/delete (wlog r = s minus one char): r ∈ D(s) and
                      r ∈ D(r).
So grouping by the exploded deletion keys recalls EVERY qualifying
pair; the builtin `levenshtein` then verifies exactly, discarding
false candidates (strings that share a deletion but differ by 2).

100-TB shape: each row fans out to at most prefix_len+1 short keys
(map-side explode), one hash shuffle groups them, and bucket sizes
are bounded by how many near-identical titles exist — output-bound,
never corpus-bound. Verification is the JVM `levenshtein`
(whole-stage codegen), no Python. Contrast the quadratic oracle,
which is the definition and dies beyond toy scale.

NOT translated C code: the reference (osmctools) has no string-
similarity operator; this extends its dedup semantics
(osmconvert.c merge --merge-versions keeps unique objects) to the
web-text payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: deletion-key generator: the string itself plus every single-
#: character deletion, deduplicated (repeated chars collapse).
_DELETE_KEYS = (
    "array_distinct(concat(array(title), transform("
    "sequence(1, greatest(length(title), 1)),"
    " i -> concat(substring(title, 1, i - 1),"
    " substring(title, i + 1, length(title))))))"
)


def edit_neardup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_len: int = 40,
    max_dist: int = 1,
) -> DataFrame:
    """All id pairs whose `prefix_len`-char text prefixes are within
    Levenshtein distance `max_dist` (only 1 is supported: the
    deletion-neighborhood guarantee above is distance-1; higher
    radii need multi-delete keys, deliberately out of scope).

    Returns (doc_a, doc_b, edit_dist) with doc_a < doc_b.
    """
    if max_dist != 1:
        raise ValueError(
            "deletion-neighborhood blocking is exact for"
            " max_dist=1 only"
        )
    titled = docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.substring(F.col(text_col), 1, prefix_len).alias("title"),
    )
    keyed = titled.select(
        "id", "title", F.explode(F.expr(_DELETE_KEYS)).alias("key")
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            F.col("a.title").alias("ta"),
            F.col("b.title").alias("tb"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "edit_dist",
            F.levenshtein(F.col("ta"), F.col("tb")).cast("long"),
        )
        .where(F.col("edit_dist") <= max_dist)
        .select("doc_a", "doc_b", "edit_dist")
    )
