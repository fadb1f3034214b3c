"""Deterministic fixture world (FIXTURES.md §§1,3,5).

Everything here is a pure function of integers — no wall clock, no
RNG state, no network — so the same world materializes identically
in every session, in Spark, in DuckDB oracle SQL, and in the .poly
files fed to the compiled reference binaries.

World: lon 10..14 deg, lat 47..51 deg.
"""

from __future__ import annotations

import numpy as np

from .geo.pip import PolygonSet
from .geo.polyfile import parse_multipoly

SC = 10_000_000

# ---------------------------------------------------------------
# polygons — the 5 fixture shapes from FIXTURES.md §3, expressed as
# the .poly text itself so reference binaries and the engine parse
# the IDENTICAL bytes.
# (a) convex quad                     admin 2
# (b) concave polygon with a !-hole   admin 4
# (c) unclosed ring (auto-close)      admin 6
# (d) would-be vertical edge          admin 6
# (e) two overlapping, admin 2 and 6  (region/subregion tie-break)
# ---------------------------------------------------------------
POLY_TEXT = """\
Quadland;2
1
   10.2000000   47.2000000
   13.8000000   47.3000000
   13.7000000   50.8000000
   10.3000000   50.7000000
   10.2000000   47.2000000
END
END
Concavia;4
1
   10.5000000   47.5000000
   12.5000000   47.6000000
   12.4000000   48.6000000
   11.5000000   48.1000000
   11.4000000   49.4000000
   10.6000000   49.3000000
END
!2
   10.8000000   47.8000000
   11.2000000   47.9000000
   11.1000000   48.2000000
   10.7000000   48.1000000
END
END
Openia;6
1
   12.6000000   49.6000000
   13.6000000   49.7000000
   13.5000000   50.5000000
   12.7000000   50.4000000
END
END
Vertland;6
1
   12.0000000   47.4000000
   13.4000000   47.4100000
   13.4000000   48.4000000
   12.1000000   48.3900000
   12.0000000   47.4000000
END
END
Overia2;2
1
   10.4000000   49.5000000
   12.4000000   49.6000000
   12.3000000   50.6000000
   10.5000000   50.5000000
END
END
Overia6;6
1
   10.9000000   49.8000000
   11.9000000   49.9000000
   11.8000000   50.4000000
   11.0000000   50.3000000
END
END
"""


def fixture_polyset() -> PolygonSet:
    return parse_multipoly(POLY_TEXT)


# ---------------------------------------------------------------
# gazetteer — N_CITIES city terms on a deterministic grid inside the
# world; City00 is the megacity that ~30% of geocodable pages hit
# (skew knob, FIXTURES.md §1).
# ---------------------------------------------------------------
N_CITIES = 80
_GRID_W = 10  # 10 x 8 grid


def gazetteer_arrays():
    """-> (terms list[str], lat_i int64[], lon_i int64[], weight int64[])

    city k sits at lon = 10.25 + 0.38 * (k % 10),
                   lat = 47.25 + 0.47 * (k // 10)   (fixed point)
    """
    k = np.arange(N_CITIES, dtype=np.int64)
    lon_i = 102_500_000 + 3_800_000 * (k % _GRID_W)
    lat_i = 472_500_000 + 4_700_000 * (k // _GRID_W)
    weight = (k % 17) + 1
    terms = [f"City{i:02d}" for i in range(N_CITIES)]
    return terms, lat_i, lon_i, weight


# ---------------------------------------------------------------
# page -> place planting (pure integer hash of doc_id)
# h = doc_id * 2654435761 mod 2^32  (Knuth multiplicative hash —
# reproducible in Spark SQL and DuckDB SQL as
#   (doc_id * 2654435761) % 4294967296
# for non-negative doc_id)
# d = h % 10:  0 -> no place (10%)
#              1..3 -> City00, the megacity (30%)
#              else -> City{h % N_CITIES}
# ---------------------------------------------------------------
HASH_MULT = 2_654_435_761
HASH_MOD = 1 << 32


def place_for_doc(doc_id):
    """Vectorized doc_id -> city index (-1 = no place)."""
    doc_id = np.asarray(doc_id, dtype=np.int64)
    h = (doc_id * HASH_MULT) % HASH_MOD
    d = h % 10
    city = (h // 10) % N_CITIES
    out = np.where(d == 0, -1, np.where(d <= 3, 0, city))
    return out.astype(np.int64)

