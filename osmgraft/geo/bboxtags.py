"""G8 bbox tags: bBox / bBoxArea / bBoxWeight / bBoxWidth /
bBoxWidthWeight with exact integer parity to the reference
(wo_addbboxtags osmconvert.c:8995-9061).

Lookup tables are REGENERATED from the reference's own embedded
generator programs (osmconvert.c:993-1011 cosrk.c, 1331-1345
cosr.c) — same formulas, same C-cast truncation — not copied:

    cosrk[i] = (int32) (1 / (cos(i/1800*PI) * 0.00012345679)),
               i = 0..899;  cosrk[900] = INT32_MAX
    cosr[0]  = 4294967295
    cosr[i]  = (uint32)(cos(i/1800*PI) * 2^32), i = 1..899
    cosr[900]= 0
    with PI = 3.14159265359 (the reference's constant)

Formulas (all C integer arithmetic; `div` below is C trunc-toward-
zero division, realized as Spark's `div`, which is Java long
division — identical semantics):

    idx       = min(|(y_min+y_max) div 2| div 1000000, 900)
    area      = (x_max-x_min) * (y_max-y_min) div cosrk[idx]
    weight    = msbit(area)
    xwidth    = (cosr[idx] * (x_max-x_min)) div 2^32
    width     = max(xwidth, y_max-y_min) div 90
    widthweight = msbit(width)
    msbit(v)  = bit length of v; 0 for 0; 1 for negative (the C
                loop falls through to the final `v!=0` increment)

Everything is pure Catalyst — the 901-entry tables are array
literals inside whole-stage codegen; no UDF, no broadcast variable.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, functions as F

_PI = 3.14159265359  # the reference's constant, not math.pi
INT32_MAX = 2_147_483_647


def cosrk_table() -> list[int]:
    t = [
        int(1.0 / (math.cos(i / 1800.0 * _PI) * 0.00012345679))
        for i in range(900)
    ]
    t.append(INT32_MAX)
    return t


def cosr_table() -> list[int]:
    t = [4294967295]
    for i in range(1, 900):
        t.append(int(math.cos(i / 1800.0 * _PI) * 0x100000000))
    t.append(0)
    return t


def msbit_np(v) -> np.ndarray:
    """Vectorized msbit (osmconvert.c:826-859): bit length; 0 stays
    0; negatives collapse to 1 (C loop fall-through)."""
    v = np.asarray(v, dtype=np.int64)
    out = np.zeros_like(v)
    pos = v > 0
    x = v[pos].copy()
    acc = np.zeros_like(x)
    for sh in (32, 16, 8, 4, 2, 1):
        big = x >= (np.int64(1) << sh)
        x[big] >>= sh
        acc[big] += sh
    out[pos] = acc + 1
    out[v < 0] = 1
    return out


def bbox_tags_np(x_min, y_min, x_max, y_max) -> dict[str, np.ndarray]:
    """Numpy twin of bbox_tag_columns (same integer semantics) for
    kernel-level differential tests against the C binary."""
    x_min = np.asarray(x_min, dtype=np.int64)
    y_min = np.asarray(y_min, dtype=np.int64)
    x_max = np.asarray(x_max, dtype=np.int64)
    y_max = np.asarray(y_max, dtype=np.int64)
    cosrk = np.asarray(cosrk_table(), dtype=np.int64)
    cosr = np.asarray(cosr_table(), dtype=np.int64)

    def tdiv(a, b):
        return np.sign(a) * np.sign(b) * (np.abs(a) // np.abs(b))

    mid = tdiv(y_min + y_max, 2)
    idx = np.minimum(np.abs(mid) // 1_000_000, 900)
    dx = x_max - x_min
    dy = y_max - y_min
    area = tdiv(dx * dy, cosrk[idx])
    xwidth = tdiv(cosr[idx] * dx, 0x100000000)
    width = tdiv(np.maximum(xwidth, dy), 90)
    return {
        "bBoxArea": area,
        "bBoxWeight": msbit_np(area),
        "bBoxWidth": width,
        "bBoxWidthWeight": msbit_np(width),
    }


# ----------------------------------------------------------------
# Catalyst realization
# ----------------------------------------------------------------


def _div(a: Column, b) -> Column:
    """C trunc division as Catalyst: Spark's `div` = Java long
    division = trunc toward zero. Exact for all sign combinations."""
    if isinstance(b, int):
        b = F.lit(b)
    return F.call_function("div", a.cast("long"), b.cast("long"))


def msbit_col(v: Column) -> Column:
    """msbit as a Catalyst expression: length(bin(v)) equals the bit
    length for positive v; edge cases matched to the C loop."""
    return (
        F.when(v == 0, F.lit(0))
        .when(v < 0, F.lit(1))
        .otherwise(F.length(F.bin(v)))
        .cast("int")
    )


def fix7_col(v: Column) -> Column:
    """write_createsfix7o (osmconvert.c:2996-3021): sign + integer
    part + '.' + exactly 7 decimals, as a Catalyst expression."""
    a = F.abs(v)
    return F.concat(
        F.when(v < 0, F.lit("-")).otherwise(F.lit("")),
        _div(a, 10_000_000).cast("string"),
        F.lit("."),
        F.lpad((a % F.lit(10_000_000)).cast("string"), 7, "0"),
    )


def bbox_tag_columns(
    x_min: Column, y_min: Column, x_max: Column, y_max: Column
) -> dict[str, Column]:
    """All five bbox tags as pure Catalyst columns over fixed-point
    int bbox columns (no UDF — stays in whole-stage codegen)."""
    cosrk = F.lit(cosrk_table())
    cosr = F.lit(cosr_table())
    mid = _div(y_min + y_max, 2)
    idx = F.least(_div(F.abs(mid), 1_000_000), F.lit(900))
    dx = (x_max - x_min).cast("long")
    dy = (y_max - y_min).cast("long")
    k = F.element_at(cosrk, (idx + 1).cast("int")).cast("long")
    area = _div(dx * dy, k)
    c = F.element_at(cosr, (idx + 1).cast("int")).cast("long")
    xwidth = _div(c * dx, 0x100000000)
    width = _div(F.greatest(xwidth, dy), 90)
    return {
        "bBox": F.concat_ws(
            ",",
            fix7_col(x_min),
            fix7_col(y_min),
            fix7_col(x_max),
            fix7_col(y_max),
        ),
        "bBoxArea": area,
        "bBoxWeight": msbit_col(area),
        "bBoxWidth": width,
        "bBoxWidthWeight": msbit_col(width),
    }
