"""Probabilistic record linkage — Fellegi–Sunter agreement-weight
scoring over blocked candidate pairs, in exact integer arithmetic.

The Fellegi–Sunter model (Fellegi & Sunter 1969, the canonical
public record-linkage framework) scores a candidate pair by
summing per-field log-likelihood-ratio weights: a field that
AGREES adds log(m/u), one that DISAGREES adds log((1-m)/(1-u)),
and the total is thresholded into match / possible / non-match.
Engines ship the weights as precomputed constants (log-space
floats estimated offline by EM); this operator takes them as
caller-supplied scaled INTEGERS (e.g. centi-bans), so the score
sum, the thresholding and the oracle comparison are all exact —
the float->int quantization happens once, outside the engine, the
same discipline as host_pagerank's integer damping.

Scale plan: the expensive part of linkage is candidate
generation, which is the caller's job (name-key blocking, sorted
neighborhoods, cell blocking — q190/q201/q207 all produce valid
inputs). Scoring itself is a pure map: one projection over the
pair table, no shuffle at all; the verdict rollup is one
partial-aggregable groupBy. Missing comparators (NULL agreement)
contribute weight 0 per the standard model.

NOT from the reference — ramunasd/osmctools conflates by exact id
only; this adds the scoring layer its gazetteer merges lack.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def fs_linkage(
    pairs: DataFrame,
    fields: Sequence[tuple[str, int, int]],
    match_at: int,
    possible_at: int,
) -> DataFrame:
    """pairs carries one boolean column per comparator field
    (true = agree, false = disagree, NULL = not comparable);
    `fields` lists (column, agree_weight, disagree_weight) with
    integer weights (disagree weights are typically negative).
    Appends exact int64 `score` and verdict `tier`
    ('match' >= match_at, 'possible' >= possible_at, else
    'nonmatch')."""
    score: Column = F.lit(0).cast("long")
    for col, aw, dw in fields:
        # NULL must contribute 0: an explicit isNull arm, because
        # when(<NULL cond>).otherwise(dw) would fall through to the
        # DISAGREE weight and silently punish missing comparators
        score = score + (
            F.when(F.col(col).isNull(), F.lit(0).cast("long"))
            .when(F.col(col), F.lit(aw).cast("long"))
            .otherwise(F.lit(dw).cast("long"))
        )
    out = pairs.withColumn("score", score)
    return out.withColumn(
        "tier",
        F.when(F.col("score") >= match_at, F.lit("match"))
        .when(F.col("score") >= possible_at, F.lit("possible"))
        .otherwise(F.lit("nonmatch")),
    )
