"""Fixed-point coordinate conversions (reference unit: 1e-7 degrees).

The reference stores all coordinates as int32 "100 nanodegrees".
Two distinct float->fix conversions exist and the difference matters
at polygon borders (SURVEY.md hard-parts list):

  - bbox corners (`-b=`): plain C cast = truncation toward zero
    (osmconvert.c:1832-1836)
  - .poly vertices: `(int32_t)(xf*10000000+0.5)` = add 0.5 then
    truncate toward zero (osmconvert.c:1902-1903)
"""

from __future__ import annotations

import numpy as np

SCALE = 10_000_000
NIL = 2_000_000_000  # border__nil, osmconvert.c:1734


def deg_to_fix_trunc(deg):
    """`-b=` style: C cast truncation toward zero (osmconvert.c:1832)."""
    a = np.asarray(deg, dtype=np.float64)
    return np.trunc(a * SCALE).astype(np.int64)


def deg_to_fix_round(deg):
    """.poly style: add 0.5 then truncate toward zero (osmconvert.c:1902).

    Note this is NOT round-half-away for negatives: -1.25e-7 deg ->
    trunc(-1.25 + 0.5) = trunc(-0.75) = 0.
    """
    a = np.asarray(deg, dtype=np.float64)
    return np.trunc(a * SCALE + 0.5).astype(np.int64)


def fix_to_deg(fix):
    a = np.asarray(fix, dtype=np.float64)
    return a / SCALE


def format_fix7(fix: int) -> str:
    """Format a fixed-point coordinate as the reference writes it:
    sign + integer part + '.' + exactly 7 decimals
    (write_createsfix7o, osmconvert.c:2996-3021).
    """
    v = int(fix)
    sign = "-" if v < 0 else ""
    v = abs(v)
    return f"{sign}{v // SCALE}.{v % SCALE:07d}"
