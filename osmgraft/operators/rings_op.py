"""Spark operator for G9/G10: relation -> rings via applyInPandas.

Plan shape: members exploded to (rel_id, member_idx, role, way
endpoints, coords) -> groupBy(rel_id).applyInPandas(ring kernel).
One shuffle on rel_id; each relation's member ways are small (the
reference caps ways at 5M globally, a relation holds tens), so the
per-group kernel is trivially task-sized. Skew-safe: a relation is
the atomic unit; hot cells don't exist on this key.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..geo.rings import assemble_rings

RINGS_SCHEMA = StructType(
    [
        StructField("rel_id", LongType()),
        StructField("subn", IntegerType()),
        StructField(
            "vertices",
            ArrayType(
                StructType(
                    [
                        StructField("x", LongType()),
                        StructField("y", LongType()),
                    ]
                )
            ),
        ),
    ]
)


def relation_rings(members: DataFrame, simplify: int = 0) -> DataFrame:
    """members: (rel_id long, member_idx int, is_inner boolean,
    first_node long, last_node long, xs array<long>, ys array<long>)
    -> (rel_id, subn, vertices) with osmrelpoly-exact assembly.
    Negative subn = inner ('!') ring."""

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("member_idx")
        rel_id = int(pdf["rel_id"].iloc[0])
        mem = [
            (
                int(r.first_node),
                int(r.last_node),
                list(zip([int(x) for x in r.xs], [int(y) for y in r.ys])),
                bool(r.is_inner),
            )
            for r in pdf.itertuples()
        ]
        rings = assemble_rings(mem, simplify=simplify)
        return pd.DataFrame(
            {
                "rel_id": [rel_id] * len(rings),
                "subn": [s for s, _ in rings],
                "vertices": [
                    [{"x": x, "y": y} for x, y in verts]
                    for _, verts in rings
                ],
            }
        )

    return members.groupBy("rel_id").applyInPandas(
        assemble, RINGS_SCHEMA
    )
