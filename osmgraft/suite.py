"""Driver-contract query suite: every entry pairs a Spark DataFrame
builder with an equivalent ANSI-SQL oracle that DuckDB runs on the
same parquet tables (CORRECTNESS gate, __spark_entry__.py).

Spatial queries derive deterministic fixed-point points from doc_id
with pure integer arithmetic reproducible in both dialects:

    lon_i = 100000000 + (doc_id * 2654435761) % 40000000   # [10,14)
    lat_i = 470000000 + (doc_id * 2246822519) % 40000000   # [47,51)

so the PIP / assignment / kNN / cell oracles check real geometry on
~60k distinct points at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .fixtures import fixture_polyset, gazetteer_arrays
from .geo.cells import DEFAULT_SHIFT, LAT_OFFSET, LON_OFFSET, _lon_bits
from .operators.knn import knn_broadcast, radius_pairs
from .operators.merge import diff, subtract, union_dedup
from .operators.spatial import (
    assign_regions,
    assign_regions_rtree,
    filter_border,
    with_cell,
)
from .operators.text import (
    dedup_exact,
    fingerprint,
    lang_id,
    ngram_jaccard_pairs,
    decontaminate_flags,
    quality_score,
    repetition_score,
    token_count,
)

LON_EXPR = "100000000 + (doc_id * 2654435761) % 40000000"
LAT_EXPR = "470000000 + (doc_id * 2246822519) % 40000000"

# ----------------------------------------------------------------
# deterministic tag synthesis (for the osmfilter-language queries):
# pure integer hash of doc_id, reproducible in Spark SQL and DuckDB.
# Values intentionally exercise the comparator's hard cases: leading
# zeros, decimals, absent keys.
# ----------------------------------------------------------------
_TAG_H = "((doc_id * 2654435761) % 4294967296)"
TAG_KEYS = ["place", "population", "name", "highway"]
_PLACE_SQL = (
    f"CASE ({_TAG_H} % 7) WHEN 0 THEN 'city' WHEN 1 THEN 'town' "
    "WHEN 2 THEN 'village' WHEN 3 THEN 'hamlet' WHEN 6 THEN 'suburb' "
    "ELSE NULL END"
)
_POP_SQL = (
    f"CASE WHEN ({_TAG_H} % 3) = 0 THEN NULL "
    f"WHEN ({_TAG_H} % 11) = 0 THEN "
    f"  '0' || CAST(({_TAG_H} // 7) % 1000000 AS VARCHAR) "
    f"WHEN ({_TAG_H} % 13) = 0 THEN "
    f"  CAST(({_TAG_H} // 7) % 1000000 AS VARCHAR) || '.5' "
    f"ELSE CAST(({_TAG_H} // 7) % 1000000 AS VARCHAR) END"
)
_NAME_SQL = (
    f"CASE WHEN ({_TAG_H} % 17) = 0 THEN NULL "
    f"ELSE 'Name' || CAST({_TAG_H} % 50 AS VARCHAR) END"
)
_HIGHWAY_SQL = (
    f"CASE WHEN ({_TAG_H} % 13) = 0 THEN 'primary' ELSE NULL END"
)
_TAGS_CTE = (
    "tg AS (SELECT doc_id, "
    f"{_PLACE_SQL} AS place, {_POP_SQL} AS population, "
    f"{_NAME_SQL} AS name, {_HIGHWAY_SQL} AS highway FROM documents)"
)
# Spark SQL: integer division is `div`, not `//`
_SPARK_TAG_EXPRS = {
    "place": _PLACE_SQL.replace("//", "div"),
    "population": _POP_SQL.replace("//", "div").replace(
        "AS VARCHAR", "AS STRING"
    ),
    "name": _NAME_SQL.replace("//", "div").replace(
        "AS VARCHAR", "AS STRING"
    ),
    "highway": _HIGHWAY_SQL,
}


def doc_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, tags map<string,string>) with
    deterministic tags; absent keys are genuinely missing from the
    map (osmfilter absent-key semantics apply)."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    pairs = []
    for k in TAG_KEYS:
        pairs += [F.lit(k), F.expr(_SPARK_TAG_EXPRS[k])]
    m = F.map_filter(
        F.map_from_arrays(
            F.array(*pairs[0::2]), F.array(*pairs[1::2])
        ),
        lambda k, v: v.isNotNull(),
    )
    return docs.withColumn("tags", m)


_INFER_GEN = (
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
)


def _tune(spark: SparkSession) -> None:
    """Merge the InferFiltersFromGenerate exclusion into the
    session (see osmgraft.session for the 6x rationale). Runs here
    because the driver harness calls the registered queries with
    ITS OWN SparkSession, not ours; idempotent, preserves any rules
    the caller already excluded."""
    cur = spark.conf.get("spark.sql.optimizer.excludedRules", None)
    if not cur:
        spark.conf.set("spark.sql.optimizer.excludedRules", _INFER_GEN)
    elif _INFER_GEN not in cur:
        spark.conf.set(
            "spark.sql.optimizer.excludedRules", cur + "," + _INFER_GEN
        )


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _tune(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def doc_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(LAT_EXPR).cast("long").alias("lat_i"),
        F.expr(LON_EXPR).cast("long").alias("lon_i"),
    )


_PTS_CTE = (
    f"pts AS (SELECT doc_id, CAST({LAT_EXPR} AS BIGINT) AS lat_i, "
    f"CAST({LON_EXPR} AS BIGINT) AS lon_i FROM documents)"
)

# planted doc->city mapping (fixtures.place_for_doc) as SQL: the
# geobase/geocode oracles (q36/q37)
_PLACED_CTE = """
WITH hashed AS (
  SELECT doc_id, (doc_id * 2654435761) % 4294967296 AS h
  FROM documents
),
placed AS (
  SELECT doc_id,
    CASE WHEN h % 10 = 0 THEN NULL
         WHEN h % 10 <= 3 THEN 0
         ELSE (h // 10) % 80 END AS city_idx
  FROM hashed
  WHERE h % 10 <> 0
)
"""


# ----------------------------------------------------------------
# SQL fragments generated from the parsed fixture polygons, so the
# oracle tests the geometry the engine actually broadcast.
# ----------------------------------------------------------------


def _edges_values(ps) -> str:
    rows = []
    for i, es in enumerate(ps.polys):
        for x1, y1, x2, y2 in zip(es.x1, es.y1, es.x2, es.y2):
            rows.append(f"({i},{x1},{y1},{x2},{y2})")
    return ",".join(rows)


def _polys_values(ps) -> str:
    rows = []
    for i, es in enumerate(ps.polys):
        bx1, by1, bx2, by2 = es.bbox
        rows.append(
            f"({i},'{ps.names[i]}',{int(ps.admin_levels[i])},"
            f"{bx1},{by1},{bx2},{by2})"
        )
    return ",".join(rows)


_CROSSING_PRED = (
    "e.x1 <= {lon} AND {lon} < e.x2 AND ("
    "(e.y1 > {lat} AND e.y2 > {lat}) OR "
    "((e.y1 > {lat} OR e.y2 > {lat}) AND "
    "({lat} - e.y1) * (e.x2 - e.x1) < ({lon} - e.x1) * (e.y2 - e.y1)))"
)


def pip_oracle_sql() -> str:
    """q02: inside/outside one even-odd border (Concavia + hole),
    osmconvert -B semantics with edge-derived enclosing bbox."""
    ps = fixture_polyset()
    es = ps.polys[1]  # Concavia (with hole)
    # osmconvert border bbox derives from edges, not raw vertices
    bx1 = int(es.x1.min())
    bx2 = int(es.x2.max())
    by1 = int(min(es.y1.min(), es.y2.min()))
    by2 = int(max(es.y1.max(), es.y2.max()))
    edges = ",".join(
        f"({x1},{y1},{x2},{y2})"
        for x1, y1, x2, y2 in zip(es.x1, es.y1, es.x2, es.y2)
    )
    pred = _CROSSING_PRED.format(lat="p.lat_i", lon="p.lon_i")
    return f"""
WITH {_PTS_CTE},
edges(x1, y1, x2, y2) AS (VALUES {edges}),
cr AS (
  SELECT p.doc_id, p.lat_i, p.lon_i,
         SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) AS crossings
  FROM pts p CROSS JOIN edges e
  WHERE p.lon_i >= {bx1} AND p.lon_i <= {bx2}
    AND p.lat_i >= {by1} AND p.lat_i <= {by2}
  GROUP BY p.doc_id, p.lat_i, p.lon_i
)
SELECT doc_id, lat_i, lon_i FROM cr WHERE crossings % 2 = 1
"""


def assign_oracle_sql() -> str:
    """q03: full multi-polygon region/subregion assignment.

    Uses the closed form of the reference's order-dependent selection
    (property-verified equivalent to the state machine at
    osmassignpoly.c:1758-1783 over 200k random traces):
      region    = inside poly with (admin, file_idx) minimal
      subregion = inside poly with (admin DESC, file_idx ASC) first,
                  iff max(admin) > min(admin)
    """
    ps = fixture_polyset()
    gx1, gy1, gx2, gy2 = ps.global_bbox
    pred = _CROSSING_PRED.format(lat="c.lat_i", lon="c.lon_i")
    return f"""
WITH {_PTS_CTE},
edges(poly_idx, x1, y1, x2, y2) AS (VALUES {_edges_values(ps)}),
polys(poly_idx, name, admin, bx1, by1, bx2, by2)
  AS (VALUES {_polys_values(ps)}),
cand AS (
  SELECT p.doc_id, p.lat_i, p.lon_i, po.poly_idx, po.name, po.admin
  FROM pts p JOIN polys po
    ON p.lon_i >= po.bx1 AND p.lon_i <= po.bx2
   AND p.lat_i >= po.by1 AND p.lat_i <= po.by2
  WHERE p.lon_i >= {gx1} AND p.lon_i <= {gx2}
    AND p.lat_i >= {gy1} AND p.lat_i <= {gy2}
),
ins AS (
  SELECT c.doc_id, c.poly_idx, c.name, c.admin
  FROM cand c JOIN edges e ON e.poly_idx = c.poly_idx
  GROUP BY c.doc_id, c.poly_idx, c.name, c.admin
  HAVING SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) % 2 = 1
),
ranked AS (
  SELECT doc_id, name, admin,
    ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY admin ASC, poly_idx ASC) AS rmin,
    ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY admin DESC, poly_idx ASC) AS rmax,
    MIN(admin) OVER (PARTITION BY doc_id) AS mn,
    MAX(admin) OVER (PARTITION BY doc_id) AS mx
  FROM ins
)
SELECT doc_id,
  MAX(CASE WHEN rmin = 1 THEN name END) AS region,
  MAX(CASE WHEN rmax = 1 AND mx > mn THEN name END) AS subregion
FROM ranked GROUP BY doc_id
"""


def _cities_values() -> str:
    terms, lat_i, lon_i, _ = gazetteer_arrays()
    return ",".join(
        f"('{t}',{la},{lo})"
        for t, la, lo in zip(terms, lat_i.tolist(), lon_i.tolist())
    )


# ----------------------------------------------------------------
# the suite
# ----------------------------------------------------------------


def q01_bbox_filter(spark, sf_dir):
    """P1: -b= fixed-point bbox clip."""
    pts = doc_points(spark, sf_dir)
    return pts.filter(
        (F.col("lon_i") >= 110000000)
        & (F.col("lon_i") <= 125000000)
        & (F.col("lat_i") >= 480000000)
        & (F.col("lat_i") <= 495000000)
    )


def q02_pip_border(spark, sf_dir):
    """P2: -B= exact ray-cast clip against Concavia (ring + hole)."""
    from .geo.pip import EdgeSet

    ps = fixture_polyset()
    es = ps.polys[1]
    # border (-B) bbox is edge-derived
    border = EdgeSet(es.x1, es.y1, es.x2, es.y2, bbox=None)
    pts = doc_points(spark, sf_dir)
    return filter_border(pts, border).select("doc_id", "lat_i", "lon_i")


def q03_assign_regions(spark, sf_dir):
    """G1/J5: flagship N-polygon assignment with admin tie-break."""
    pts = doc_points(spark, sf_dir)
    out = assign_regions(pts, fixture_polyset())
    return out.select("doc_id", "region", "subregion")


def q151_assign_rtree(spark, sf_dir):
    """G1/J5 via the broadcast STR-packed polygon R-tree
    (geo/rtree.py, spatial.assign_regions_rtree): same assignment
    semantics and oracle as q03, different candidate-discovery
    physics — O(log P) MBR descent instead of the O(P) bbox sweep,
    the scale path for thousands-of-polygons boundary sets."""
    pts = doc_points(spark, sf_dir)
    out = assign_regions_rtree(pts, fixture_polyset(), cap=4)
    return out.select("doc_id", "region", "subregion")


def q04_cell_tiles(spark, sf_dir):
    """G11: tile-cell encode + per-tile rollup (tile materializer)."""
    pts = with_cell(doc_points(spark, sf_dir))
    return pts.groupBy("cell").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
    )


def _hex_oracle_sql() -> str:
    a = 1 << 19
    b = round(a * 3 ** 0.5)
    return f"""
WITH {_PTS_CTE},
uv AS (
  SELECT lon_i + {LON_OFFSET} AS u, lat_i + {LAT_OFFSET} AS v
  FROM pts
),
k AS (
  SELECT u, v,
    ((u + {a}) // {2 * a}) * {2 * a} AS eu,
    ((v + {b}) // {2 * b}) * {2 * b} AS ev,
    (u // {2 * a}) * {2 * a} + {a} AS ou,
    (v // {2 * b}) * {2 * b} + {b} AS ov
  FROM uv
),
d AS (
  SELECT eu, ev, ou, ov,
    (u - eu) * (u - eu) + (v - ev) * (v - ev) AS de,
    (u - ou) * (u - ou) + (v - ov) * (v - ov) AS do_
  FROM k
),
pick AS (
  SELECT CASE WHEN (de, ev, eu) <= (do_, ov, ou)
              THEN ev ELSE ov END AS hex_v,
         CASE WHEN (de, ev, eu) <= (do_, ov, ou)
              THEN eu ELSE ou END AS hex_u
  FROM d
)
SELECT hex_v, hex_u, COUNT(*) AS n_docs
FROM pick GROUP BY 1, 2
"""


def q129_hex_heatmap(spark, sf_dir):
    """Hexagonal heatmap: exact two-sublattice integer-Voronoi hex
    binning (operators/spatial.hex_center_cols, a=2^19) + one
    groupBy — the H3-style companion to q04's square tiles, still
    scan + single shuffle at any scale."""
    from .operators.spatial import hex_center_cols

    hv, hu = hex_center_cols()
    return (
        doc_points(spark, sf_dir)
        .select(hv, hu)
        .groupBy("hex_v", "hex_u")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


def _geohash_oracle_sql() -> str:
    from .operators.spatial import geohash_oracle_expr

    return f"""
WITH {_PTS_CTE}
SELECT doc_id, {geohash_oracle_expr()} AS geohash FROM pts
"""


def _geohash_rollup_oracle_sql() -> str:
    from .operators.spatial import (
        geohash_bounds_oracle_exprs,
        geohash_oracle_expr,
    )

    lon_lo, lon_hi, lat_lo, lat_hi = geohash_bounds_oracle_exprs(
        "gh5", 5
    )
    return f"""
WITH {_PTS_CTE},
g AS (SELECT {geohash_oracle_expr(chars=5)} AS gh5 FROM pts),
agg AS (SELECT gh5, COUNT(*) AS n_docs FROM g GROUP BY gh5)
SELECT gh5, n_docs,
       {lon_lo} AS lon_lo, {lon_hi} AS lon_hi,
       {lat_lo} AS lat_lo, {lat_hi} AS lat_hi
FROM agg
"""


def q134_geohash(spark, sf_dir):
    """Standard geohash strings for every document point
    (operators/spatial.with_geohash, 9 chars) — exact integer
    quantization, no float midpoints, matches the published
    geohash test vectors (unit-tested) and the same-arithmetic
    DuckDB expression."""
    from .operators.spatial import with_geohash

    return with_geohash(doc_points(spark, sf_dir)).select(
        "doc_id", "geohash"
    )


def q135_geohash_rollup(spark, sf_dir):
    """Geohash-5 prefix rollup with exact decoded cell bounds:
    counts per 5-char geohash plus the half-open fixed-point bbox
    of each cell (operators/spatial.with_geohash_bounds — the
    exact integer inverse of the encoder, round-trip
    property-tested)."""
    from .operators.spatial import with_geohash, with_geohash_bounds

    gh = with_geohash(
        doc_points(spark, sf_dir), chars=5, out="gh5"
    )
    agg = gh.groupBy("gh5").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    return with_geohash_bounds(agg, "gh5", 5).select(
        "gh5", "n_docs", "lon_lo", "lon_hi", "lat_lo", "lat_hi"
    )


def q137_border_distance(spark, sf_dir):
    """Signed distance-to-border (spatial.border_distance): every
    document's squared distance to the nearest admin border
    segment (ALL boundary segments, including the exactly-vertical
    ones the ray-cast ignores), the owning polygon, the assigned
    region, and the signed variant (negative inside). Map-only:
    the ~30-segment constant folds in-row via a struct least —
    no join, no shuffle at any corpus size."""
    from .operators.spatial import border_distance

    return border_distance(
        doc_points(spark, sf_dir), fixture_polyset()
    )


def _border_distance_oracle_sql() -> str:
    from .operators.spatial import border_edge_list

    ps = fixture_polyset()
    bvals = ",".join(
        f"({pi},{eid},'{nm}',{ax},{ay},{bx},{by})"
        for pi, eid, nm, ax, ay, bx, by in border_edge_list(ps)
    )
    pred = _CROSSING_PRED.format(lat="c.lat_i", lon="c.lon_i")
    return f"""
WITH {_PTS_CTE},
be(pi, eid, nm, ax, ay, bx, by) AS (VALUES {bvals}),
cedges(poly_idx, x1, y1, x2, y2) AS (VALUES {_edges_values(ps)}),
polys(poly_idx, name, admin, bx1, by1, bx2, by2)
  AS (VALUES {_polys_values(ps)}),
pd AS (
  SELECT p.doc_id, e.pi, e.eid, e.nm,
    CAST(p.lon_i - e.ax AS DOUBLE) AS apx,
    CAST(p.lat_i - e.ay AS DOUBLE) AS apy,
    CAST(p.lon_i - e.bx AS DOUBLE) AS bpx,
    CAST(p.lat_i - e.by AS DOUBLE) AS bpy,
    CAST(e.bx - e.ax AS DOUBLE) AS abx,
    CAST(e.by - e.ay AS DOUBLE) AS aby,
    CAST(CAST(e.bx - e.ax AS BIGINT) * CAST(e.bx - e.ax AS BIGINT)
         + CAST(e.by - e.ay AS BIGINT) * CAST(e.by - e.ay AS BIGINT)
         AS DOUBLE) AS len2
  FROM pts p CROSS JOIN be e
),
sc AS (
  SELECT doc_id, pi, eid, nm, len2,
    apx * abx + apy * aby AS dot,
    apx * apx + apy * apy AS ap2,
    bpx * bpx + bpy * bpy AS bp2
  FROM pd
),
d AS (
  SELECT doc_id,
    MIN({{'d2': CASE WHEN dot <= 0 THEN ap2
                     WHEN dot >= len2 THEN bp2
                     ELSE ap2 - (dot / len2) * dot END,
         'pi': pi, 'eid': eid, 'nm': nm}}) AS w
  FROM sc GROUP BY doc_id
),
cand AS (
  SELECT p.doc_id, p.lat_i, p.lon_i, po.poly_idx, po.name, po.admin
  FROM pts p JOIN polys po
    ON p.lon_i >= po.bx1 AND p.lon_i <= po.bx2
   AND p.lat_i >= po.by1 AND p.lat_i <= po.by2
),
ins AS (
  SELECT c.doc_id, c.poly_idx, c.name, c.admin
  FROM cand c JOIN cedges e ON e.poly_idx = c.poly_idx
  GROUP BY c.doc_id, c.poly_idx, c.name, c.admin
  HAVING SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) % 2 = 1
),
ranked AS (
  SELECT doc_id, name,
    ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY admin ASC, poly_idx ASC) AS rmin
  FROM ins
),
reg AS (
  SELECT doc_id, MAX(CASE WHEN rmin = 1 THEN name END) AS region
  FROM ranked GROUP BY doc_id
)
SELECT p.doc_id, r.region, d.w.nm AS nearest, d.w.d2 AS dist2,
  CASE WHEN r.region IS NOT NULL THEN -d.w.d2 ELSE d.w.d2 END
    AS signed_d2
FROM pts p
JOIN d ON p.doc_id = d.doc_id
LEFT JOIN reg r ON p.doc_id = r.doc_id
"""


def _region_cte_sql(src: str, id_col: str) -> str:
    """The q03 closed-form region assignment as reusable CTE text:
    `reg({id_col}, region)` over source CTE `src` (which must
    expose {id_col}, lat_i, lon_i)."""
    ps = fixture_polyset()
    pred = _CROSSING_PRED.format(lat="c.lat_i", lon="c.lon_i")
    return f"""
cedges(poly_idx, x1, y1, x2, y2) AS (VALUES {_edges_values(ps)}),
polys(poly_idx, name, admin, bx1, by1, bx2, by2)
  AS (VALUES {_polys_values(ps)}),
cand AS (
  SELECT s.{id_col}, s.lat_i, s.lon_i, po.poly_idx, po.name,
         po.admin
  FROM {src} s JOIN polys po
    ON s.lon_i >= po.bx1 AND s.lon_i <= po.bx2
   AND s.lat_i >= po.by1 AND s.lat_i <= po.by2
),
ins AS (
  SELECT c.{id_col}, c.poly_idx, c.name, c.admin
  FROM cand c JOIN cedges e ON e.poly_idx = c.poly_idx
  GROUP BY c.{id_col}, c.poly_idx, c.name, c.admin
  HAVING SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) % 2 = 1
),
ranked AS (
  SELECT {id_col}, name,
    ROW_NUMBER() OVER (PARTITION BY {id_col}
                       ORDER BY admin ASC, poly_idx ASC) AS rmin
  FROM ins
),
reg AS (
  SELECT {id_col}, MAX(CASE WHEN rmin = 1 THEN name END) AS region
  FROM ranked GROUP BY {id_col}
)"""


def q138_od_matrix(spark, sf_dir):
    """Origin->destination region flow matrix (events.od_matrix):
    events get deterministic planted coordinates (same hash spread
    as document points), the region resolves in-row (q03's
    Catalyst assign path, outside = 'OUT'), and each user's
    time-ordered sequence contributes one trip per consecutive
    pair. Single user-keyed shuffle; output bounded by
    (#regions+1)^2."""
    from .operators.events import od_matrix
    from .operators.spatial import assign_regions

    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.expr(LAT_EXPR.replace("doc_id", "event_id"))
        .cast("long")
        .alias("lat_i"),
        F.expr(LON_EXPR.replace("doc_id", "event_id"))
        .cast("long")
        .alias("lon_i"),
    )
    located = assign_regions(
        ev, fixture_polyset(), keep_noregion=True
    )
    return od_matrix(located)


def _od_matrix_oracle_sql() -> str:
    lat = LAT_EXPR.replace("doc_id", "event_id")
    lon = LON_EXPR.replace("doc_id", "event_id")
    return f"""
WITH ev AS (
  SELECT event_id, user_id, ts,
         CAST({lat} AS BIGINT) AS lat_i,
         CAST({lon} AS BIGINT) AS lon_i
  FROM events
),
{_region_cte_sql("ev", "event_id")},
r AS (
  SELECT e.user_id, e.ts, e.event_id,
         COALESCE(g.region, 'OUT') AS region
  FROM ev e LEFT JOIN reg g ON e.event_id = g.event_id
),
seq AS (
  SELECT region AS to_region,
    LAG(region) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) AS from_region
  FROM r
)
SELECT from_region, to_region, COUNT(*) AS n_trips
FROM seq WHERE from_region IS NOT NULL GROUP BY 1, 2
"""


def q142_density_clusters(spark, sf_dir):
    """DBSCAN-style grid density clustering of the geocoded
    corpus (operators/density.grid_density_clusters): cells of
    side 2^22, core = 3x3 neighborhood holding >= 1/10 of the
    placed corpus (scale-invariant minPts), components by the
    engine's 12-pass bounded min-label idiom, border cells
    attached, noise = null. Finds the megacity hotspot cluster;
    one corpus shuffle, everything else on the per-cell table."""
    from .operators.density import grid_density_clusters

    docs = load(spark, sf_dir, "documents").select("doc_id")
    placed = docs.withColumn(
        "_h",
        (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296),
    ).where(F.col("_h") % 10 != 0)
    pos = placed.select(
        F.expr(
            "case when _h % 10 <= 3 then 0"
            " else (_h div 10) % 80 end"
        ).alias("_city")
    ).select(
        (F.lit(472500000) + F.lit(4700000) * F.expr("_city div 10"))
        .cast("long")
        .alias("lat_i"),
        (F.lit(102500000) + F.lit(3800000) * (F.col("_city") % 10))
        .cast("long")
        .alias("lon_i"),
    )
    return grid_density_clusters(pos, shift=22, density_denom=10)


def _density_oracle_sql() -> str:
    return """
WITH RECURSIVE hashed AS (
  SELECT doc_id, (doc_id * 2654435761) % 4294967296 AS h
  FROM documents
),
placed AS (
  SELECT CASE WHEN h % 10 <= 3 THEN 0
              ELSE (h // 10) % 80 END AS city_idx
  FROM hashed WHERE h % 10 <> 0
),
pos AS (
  SELECT CAST(472500000 + 4700000 * (city_idx // 10) AS BIGINT)
           AS lat_i,
         CAST(102500000 + 3800000 * (city_idx % 10) AS BIGINT)
           AS lon_i
  FROM placed
),
c AS (
  SELECT (lat_i + 900000000) >> 22 AS v,
         (lon_i + 1800000000) >> 22 AS u,
         COUNT(*) AS n_docs
  FROM pos GROUP BY 1, 2
),
nb AS (
  SELECT a.v, a.u, MIN(a.n_docs) AS n_docs,
         CAST(SUM(b.n_docs) AS BIGINT) AS nb9
  FROM c a JOIN c b
    ON b.v BETWEEN a.v - 1 AND a.v + 1
   AND b.u BETWEEN a.u - 1 AND a.u + 1
  GROUP BY a.v, a.u
),
cellsx AS (
  SELECT v, u, v * 1024 + u AS cell, n_docs, nb9,
         nb9 * 10 >= (SELECT SUM(n_docs) FROM c) AS is_core
  FROM nb
),
core AS (SELECT cell, v, u FROM cellsx WHERE is_core),
e0 AS (
  SELECT a.cell AS ua, b.cell AS ub
  FROM core a JOIN core b
    ON b.v BETWEEN a.v - 1 AND a.v + 1
   AND b.u BETWEEN a.u - 1 AND a.u + 1
   AND a.cell <> b.cell
),
reach(u, w, pass) AS (
  SELECT cell, cell, 0 FROM core
  UNION
  SELECT r.u, e.ub, r.pass + 1
  FROM reach r JOIN e0 e ON e.ua = r.w
  WHERE r.pass < 12
),
labels AS (
  SELECT u AS cell, MIN(w) AS lbl FROM reach GROUP BY u
),
border AS (
  SELECT x.cell, MIN(l.lbl) AS cluster
  FROM cellsx x
  JOIN core c2
    ON c2.v BETWEEN x.v - 1 AND x.v + 1
   AND c2.u BETWEEN x.u - 1 AND x.u + 1
   AND c2.cell <> x.cell
  JOIN labels l ON l.cell = c2.cell
  WHERE NOT x.is_core
  GROUP BY x.cell
)
SELECT x.cell, x.n_docs, x.nb9, x.is_core,
       COALESCE(l.lbl, b.cluster) AS cluster
FROM cellsx x
LEFT JOIN labels l ON l.cell = x.cell
LEFT JOIN border b ON b.cell = x.cell
"""


def q146_region_raster(spark, sf_dir):
    """Polygon -> filled raster mask
    (spatial.rasterize_polygons): every shift-20 cell whose center
    is inside each admin polygon — the region-mask primitive
    (filled-area counterpart of the way supercover). Candidate
    cells enumerate from the polygon bbox, bounded by raster
    resolution, corpus-independent; parity is the same relational
    ray cast as q127."""
    from .operators.spatial import rasterize_polygons

    return rasterize_polygons(spark, fixture_polyset(), shift=20)


def _region_raster_oracle_sql() -> str:
    ps = fixture_polyset()
    pred = _CROSSING_PRED.format(lat="c._py", lon="c._px")
    half = 1 << 19
    return f"""
WITH edges(poly_idx, x1, y1, x2, y2) AS (VALUES {_edges_values(ps)}),
polys(poly_idx, name, admin, bx1, by1, bx2, by2)
  AS (VALUES {_polys_values(ps)}),
cand AS (
  SELECT p.poly_idx, p.name, t.v, s.u,
         (s.u << 20) + {half - 1800000000} AS _px,
         (t.v << 20) + {half - 900000000} AS _py
  FROM polys p
  CROSS JOIN LATERAL (SELECT unnest(range(
      (p.by1 + 900000000) >> 20,
      ((p.by2 + 900000000) >> 20) + 1)) AS v) t
  CROSS JOIN LATERAL (SELECT unnest(range(
      (p.bx1 + 1800000000) >> 20,
      ((p.bx2 + 1800000000) >> 20) + 1)) AS u) s
)
SELECT c.poly_idx, c.name, c.v * 4096 + c.u AS cell
FROM cand c JOIN edges e ON e.poly_idx = c.poly_idx
GROUP BY c.poly_idx, c.name, c.v, c.u
HAVING SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) % 2 = 1
"""


def q155_region_overlap(spark, sf_dir):
    """Polygon x polygon spatial join via shared raster cells: for
    every pair of admin polygons, the number of shift-20 cells in
    BOTH masks (integer intersection area in cells) plus each
    side's own mask size — the overlap/containment matrix a
    boundary QA pipeline runs (Overia2 contains Overia6 by
    construction; Quadland/Concavia abut). One cell equi-join of
    the q146 mask with itself — polygon-polygon overlay without
    any geometry-geometry test, the standard raster-join plan at
    scale. Corpus-independent (mask derives from the polygons)."""
    from .operators.spatial import rasterize_polygons

    m = rasterize_polygons(spark, fixture_polyset(), shift=20).select(
        "name", "cell"
    )
    cnt = m.groupBy("name").agg(F.count("*").cast("long").alias("n"))
    a = m.select(F.col("name").alias("name_a"), "cell")
    b = m.select(
        F.col("name").alias("name_b"), F.col("cell").alias("b_cell")
    )
    pairs = (
        a.join(
            b,
            (F.col("cell") == F.col("b_cell"))
            & (F.col("name_a") < F.col("name_b")),
        )
        .groupBy("name_a", "name_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    ca = cnt.select(
        F.col("name").alias("name_a"), F.col("n").alias("n_a")
    )
    cb = cnt.select(
        F.col("name").alias("name_b"), F.col("n").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(ca), "name_a")
        .join(F.broadcast(cb), "name_b")
        .select("name_a", "name_b", "n_shared", "n_a", "n_b")
    )


def _region_overlap_oracle_sql() -> str:
    ps = fixture_polyset()
    pred = _CROSSING_PRED.format(lat="c._py", lon="c._px")
    half = 1 << 19
    return f"""
WITH edges(poly_idx, x1, y1, x2, y2) AS (VALUES {_edges_values(ps)}),
polys(poly_idx, name, admin, bx1, by1, bx2, by2)
  AS (VALUES {_polys_values(ps)}),
cand AS (
  SELECT p.poly_idx, p.name, t.v, s.u,
         (s.u << 20) + {half - 1800000000} AS _px,
         (t.v << 20) + {half - 900000000} AS _py
  FROM polys p
  CROSS JOIN LATERAL (SELECT unnest(range(
      (p.by1 + 900000000) >> 20,
      ((p.by2 + 900000000) >> 20) + 1)) AS v) t
  CROSS JOIN LATERAL (SELECT unnest(range(
      (p.bx1 + 1800000000) >> 20,
      ((p.bx2 + 1800000000) >> 20) + 1)) AS u) s
),
mask AS (
  SELECT c.name, c.v * 4096 + c.u AS cell
  FROM cand c JOIN edges e ON e.poly_idx = c.poly_idx
  GROUP BY c.poly_idx, c.name, c.v, c.u
  HAVING SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) % 2 = 1
),
cnt AS (
  SELECT name, CAST(COUNT(*) AS BIGINT) AS n FROM mask GROUP BY 1
)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared,
       MIN(ca.n) AS n_a, MIN(cb.n) AS n_b
FROM mask a
JOIN mask b ON a.cell = b.cell AND a.name < b.name
JOIN cnt ca ON ca.name = a.name
JOIN cnt cb ON cb.name = b.name
GROUP BY 1, 2
"""


def q147_raster_fidelity(spark, sf_dir):
    """Raster-approximation fidelity report: per polygon, the
    exact ray-cast document count vs the count under the shift-20
    raster mask (cell-center membership), plus the mask size — the
    audit that tells you whether mask-lookup assignment (one
    equi-join, no geometry) is good enough at a given resolution.
    All three aggregates are per-poly relational passes over
    broadcast literal edges / the corpus cell rollup."""
    from .operators.spatial import polyset_frames, rasterize_polygons

    ps = fixture_polyset()
    pts = doc_points(spark, sf_dir)
    edges, polys = polyset_frames(spark, ps)

    mask = rasterize_polygons(spark, ps, shift=20)
    n_cells = mask.groupBy("poly_idx", "name").agg(
        F.count("*").cast("long").alias("n_cells")
    )

    dcells = pts.select(
        (
            F.shiftright(F.col("lat_i") + 900000000, 20) * 4096
            + F.shiftright(F.col("lon_i") + 1800000000, 20)
        ).alias("cell")
    ).groupBy("cell").agg(F.count("*").cast("long").alias("nd"))
    raster_n = (
        mask.join(dcells, "cell")
        .groupBy("poly_idx")
        .agg(F.sum("nd").cast("long").alias("n_docs_raster"))
    )

    cand = pts.crossJoin(F.broadcast(edges))
    n1 = F.col("y1") > F.col("lat_i")
    n2 = F.col("y2") > F.col("lat_i")
    south = (F.col("lat_i") - F.col("y1")) * (
        F.col("x2") - F.col("x1")
    ) < (F.col("lon_i") - F.col("x1")) * (
        F.col("y2") - F.col("y1")
    )
    cross = (
        (F.col("x1") <= F.col("lon_i"))
        & (F.col("lon_i") < F.col("x2"))
        & ((n1 & n2) | ((n1 != n2) & south))
    )
    exact_n = (
        cand.groupBy("doc_id", "poly_idx")
        .agg(F.sum(F.when(cross, 1).otherwise(0)).alias("_c"))
        .where(F.col("_c") % 2 == 1)
        .groupBy("poly_idx")
        .agg(F.count("*").cast("long").alias("n_docs_exact"))
    )

    return (
        n_cells.join(raster_n, "poly_idx", "left")
        .join(exact_n, "poly_idx", "left")
        .select(
            "poly_idx",
            "name",
            "n_cells",
            F.coalesce("n_docs_raster", F.lit(0)).alias(
                "n_docs_raster"
            ),
            F.coalesce("n_docs_exact", F.lit(0)).alias(
                "n_docs_exact"
            ),
        )
    )


def _raster_fidelity_oracle_sql() -> str:
    ps = fixture_polyset()
    mask_sql = _region_raster_oracle_sql().strip()
    pred = _CROSSING_PRED.format(lat="p.lat_i", lon="p.lon_i")
    return f"""
WITH {_PTS_CTE},
mask AS ({mask_sql}),
ncells AS (
  SELECT m.poly_idx, m.name, COUNT(*) AS n_cells
  FROM mask m GROUP BY 1, 2
),
dcells AS (
  SELECT ((lat_i + 900000000) >> 20) * 4096
         + ((lon_i + 1800000000) >> 20) AS cell,
         COUNT(*) AS nd
  FROM pts GROUP BY 1
),
rn AS (
  SELECT m.poly_idx, SUM(d.nd) AS n_docs_raster
  FROM mask m JOIN dcells d ON m.cell = d.cell GROUP BY 1
),
pedges(poly_idx, x1, y1, x2, y2) AS (VALUES {_edges_values(ps)}),
en AS (
  SELECT poly_idx, COUNT(*) AS n_docs_exact FROM (
    SELECT p.doc_id, e.poly_idx
    FROM pts p CROSS JOIN pedges e
    GROUP BY p.doc_id, e.poly_idx
    HAVING SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) % 2 = 1
  ) GROUP BY 1
)
SELECT c.poly_idx, c.name, c.n_cells,
       CAST(COALESCE(r.n_docs_raster, 0) AS BIGINT)
         AS n_docs_raster,
       CAST(COALESCE(e.n_docs_exact, 0) AS BIGINT)
         AS n_docs_exact
FROM ncells c
LEFT JOIN rn r ON r.poly_idx = c.poly_idx
LEFT JOIN en e ON e.poly_idx = c.poly_idx
"""


def q05_knn_city(spark, sf_dir):
    """J8: exact kNN against broadcast gazetteer (k=3)."""
    terms, lat_i, lon_i, _ = gazetteer_arrays()
    pts = doc_points(spark, sf_dir)
    return knn_broadcast(pts, terms, lat_i, lon_i, k=3)


def q06_stats(spark, sf_dir):
    """A1: statistics aggregate over events."""
    ev = load(spark, sf_dir, "events")
    return ev.agg(
        F.count("*").cast("long").alias("n_events"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
        F.min(F.unix_timestamp("ts")).alias("min_ts_epoch"),
        F.max(F.unix_timestamp("ts")).alias("max_ts_epoch"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def q07_key_freq(spark, sf_dir):
    """A2/P9: --out-count key frequency."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.col("event_type").alias("key"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def _docs_v2(docs):
    return docs.filter(F.col("doc_id") % 3 == 0).withColumn(
        "text", F.concat(F.lit("v2 "), F.col("text"))
    )


def q08_union_dedup(spark, sf_dir):
    """J3: merge two files, last file wins per key."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    merged = union_dedup([docs, _docs_v2(docs)], ["doc_id"])
    return merged.select("doc_id", "text")


def q09_subtract(spark, sf_dir):
    """J4: --subtract anti-join."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    minus = docs.filter(F.col("doc_id") % 7 == 0)
    return subtract(docs, minus, ["doc_id"])


def q10_diff(spark, sf_dir):
    """J6: two-file diff -> create/modify/delete actions."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    new = (
        docs.filter(F.col("doc_id") % 5 != 0)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.lit("mod "), F.col("text")),
            ).otherwise(F.col("text")),
        )
        .unionByName(
            docs.filter(F.col("doc_id") < 100).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
    )
    return diff(docs, new, ["doc_id"], ["text"])


def q11_token_count(spark, sf_dir):
    return token_count(load(spark, sf_dir, "documents"))


def q12_quality(spark, sf_dir):
    return quality_score(load(spark, sf_dir, "documents"))


def q52_repetition(spark, sf_dir):
    """Gopher-style duplicate-3-gram fraction (public web-text
    quality heuristic) — map-only Catalyst pass."""
    return repetition_score(load(spark, sf_dir, "documents"))


def q53_decontaminate(spark, sf_dir):
    """Benchmark decontamination: corpus docs sharing a word
    3-gram with the (synthetic) eval slice doc_id % 97 == 0.
    Broadcast eval shingles; corpus never shuffles."""
    return decontaminate_flags(
        load(spark, sf_dir, "documents"),
        F.col("doc_id") % 97 == 0,
    )


def q56_chunk_dedup(spark, sf_dir):
    """Chunk-level corpus dedup (CCNet/RefinedWeb line-dedup analog
    on non-overlapping 8-token windows, operators/text.py). Corpus
    plants one exact copy per doc_id%7==0 doc and one 32-token
    truncation per doc_id%11==0 doc, so dup_chunk_ratio spans
    {0, fractional, 1}."""
    from .operators.text import chunk_dedup_stats

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    trunc = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 1, 32), " "
        ).alias("text"),
    )
    corpus = docs.unionByName(copies).unionByName(trunc)
    return chunk_dedup_stats(corpus)


def q73_dup_spans(spark, sf_dir):
    """Exact duplicate-span stats (Lee et al. 2022 ExactSubstr
    signal, operators/text.dup_span_stats): tokens covered by any
    5-token shingle occurring >= 2 times corpus-wide, merged into
    maximal spans per document."""
    from .operators.text import dup_span_stats

    return dup_span_stats(load(spark, sf_dir, "documents"), n=5)


def q74_bpe_pairs(spark, sf_dir):
    """Distributed BPE statistics (Sennrich et al. 2016,
    operators/tokenizer.bpe_pair_counts): top-50 adjacent
    character-pair frequencies weighted by word count — the
    per-iteration primitive of tokenizer training at corpus scale
    (the corpus is scanned once; iterations run on the vocabulary).
    """
    from .operators.tokenizer import bpe_pair_counts

    return bpe_pair_counts(
        load(spark, sf_dir, "documents"), top=50
    )


# Fixed literal merge table for q77 — the apply-side twin of q74's
# training statistics. Being a constant (not learned from the data
# at hand) is what makes the segmentation oracle-expressible: the
# oracle replays each merge as one boundary-safe string replace.
# Order matters; later merges build on earlier outputs (th+e, an+d,
# ou+r) so the oracle exercises the sequential-apply semantics.
_BPE_MERGES = [
    ("t", "h"),
    ("th", "e"),
    ("i", "n"),
    ("a", "n"),
    ("an", "d"),
    ("e", "r"),
    ("o", "u"),
    ("ou", "r"),
]


def q77_bpe_segment(spark, sf_dir):
    """BPE segmentation applied at corpus scale
    (operators/tokenizer.bpe_segment): per document, the symbol
    count after applying the fixed 8-merge table left-to-right
    non-overlapping per word — a map-only in-row fold, the apply
    half of q74's train half."""
    from .operators.tokenizer import bpe_segment

    return bpe_segment(
        load(spark, sf_dir, "documents"), _BPE_MERGES
    )


def _q77_oracle() -> str:
    """Oracle twin: each word becomes a marker-bracketed symbol
    string (chr(31) sym chr(30) per char), each merge is ONE
    replace() — left-to-right non-overlapping, exactly the fold's
    semantics; symbol count = count of chr(31) markers."""

    def mark(x: str) -> str:
        return f"chr(31)||'{x}'||chr(30)"

    s = "regexp_replace(w, '(.)', chr(31) || '\\1' || chr(30), 'g')"
    for a, b in _BPE_MERGES:
        s = f"replace({s}, {mark(a)}||{mark(b)}, {mark(a + b)})"
    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), w -> w <> '') AS ws
  FROM documents
),
seg AS (
  SELECT doc_id, len(ws) AS n_words,
         list_transform(ws, w -> {s}) AS segs
  FROM t
)
SELECT doc_id,
  CAST(n_words AS BIGINT) AS n_words,
  CAST(coalesce(list_sum(list_transform(segs,
    s -> length(s) - length(replace(s, chr(31), '')))), 0)
    AS BIGINT) AS n_bpe_symbols
FROM seg
"""


def q148_bpe_learn(spark, sf_dir):
    """BPE merge LEARNING at corpus scale
    (operators/tokenizer.bpe_train): the first 4 merges learned
    from the documents corpus — per iteration ONE distributed
    pair-count job over the cached vocabulary, a 1-row argmax
    collect (count desc, then the SEP-joined pair string for
    determinism), and an in-row fold applying the merge. Completes
    the tokenizer trilogy: q74 (per-iteration statistics), q148
    (the training loop itself), q77 (applying a merge table). The
    learned table is driver-sized by construction (4 rows), so
    returning it as a created DataFrame is the honest shape — the
    corpus never leaves the executors."""
    from .operators.tokenizer import bpe_train

    merges = bpe_train(load(spark, sf_dir, "documents"), 4)
    return spark.createDataFrame(
        [(i + 1, l, r) for i, (l, r) in enumerate(merges)],
        "merge_rank long, lhs string, rhs string",
    )


def _q148_oracle(n_merges: int = 4) -> str:
    """Oracle twin of bpe_train, fully unrolled: iteration state is
    the marker-bracketed segment string per vocabulary word (the
    q77 representation, injective in the word), pair counts come
    from adjacent positions of the split symbol list, the argmax
    tie-breaks on the chr(31)-joined pair exactly like the Spark
    orderBy, and applying a merge is ONE boundary-safe replace()
    (left-to-right non-overlapping — the fold's semantics, proved
    in tests/test_tokenizer.py)."""
    parts = [
        """
WITH wc AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT unnest(string_split(text, ' ')) AS word
        FROM documents)
  WHERE word <> '' GROUP BY word
),
v0 AS (
  SELECT regexp_replace(word, '(.)',
           chr(31) || '\\1' || chr(30), 'g') AS seg, n
  FROM wc
)"""
    ]
    for i in range(n_merges):
        parts.append(f""",
t{i} AS (
  SELECT seg, n, unnest(syms) AS sym,
         generate_subscripts(syms, 1) AS pos
  FROM (SELECT seg, n,
          string_split(substr(seg, 2, length(seg) - 2),
                       chr(30) || chr(31)) AS syms
        FROM v{i})
),
m{i} AS (
  SELECT a.sym AS l, b.sym AS r
  FROM t{i} a JOIN t{i} b
    ON a.seg = b.seg AND b.pos = a.pos + 1
  GROUP BY 1, 2
  ORDER BY SUM(a.n) DESC, a.sym || chr(31) || b.sym
  LIMIT 1
),
v{i + 1} AS (
  SELECT replace(v.seg,
           chr(31) || m.l || chr(30) || chr(31) || m.r || chr(30),
           chr(31) || m.l || m.r || chr(30)) AS seg, v.n
  FROM v{i} v, m{i} m
)""")
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST({i + 1} AS BIGINT) AS merge_rank,"
        f" l AS lhs, r AS rhs FROM m{i}"
        for i in range(n_merges)
    )
    return "".join(parts) + "\n" + sel


def q75_mix_plan(spark, sf_dir):
    """Temperature-based corpus-mixing plan over (lang, source)
    strata (operators/text.mix_plan): sqrt-weighted mixture with a
    100k-token budget — the data-mixture step before
    stratified_sample (q62) materializes the training mix."""
    from .operators.text import mix_plan

    return mix_plan(load(spark, sf_dir, "documents"))


def q76_dsir_lean(spark, sf_dir):
    """DSIR-style importance signal (operators/text.dsir_lean):
    hashed-bigram buckets over-represented in the lang='en' target
    slice, per-doc fraction of target-leaning bigrams — integer-
    exact (md5-prefix buckets, cross-product comparison)."""
    from .operators.text import dsir_lean

    return dsir_lean(
        load(spark, sf_dir, "documents"), F.col("lang") == "en"
    )


def q114_retention_cohorts(spark, sf_dir):
    """Weekly cohort retention matrix (events.retention_cohorts):
    users bucketed by first-activity week (integer DATE
    arithmetic), n_users active at each week offset — the
    offset-0 diagonal is the cohort size."""
    from .operators.events import retention_cohorts

    return retention_cohorts(load(spark, sf_dir, "events"))


def q117_event_spikes(spark, sf_dir):
    """Hourly rate anomalies per event type
    (events.event_spikes): hours at >= 2x the type's mean hourly
    rate, decided by exact integer cross-multiplication — no
    floats, both engines flag identical hours."""
    from .operators.events import event_spikes

    return event_spikes(load(spark, sf_dir, "events"))


def q150_interval_join(spark, sf_dir):
    """Batch interval join (events.interval_pairs): every error
    event paired with the same user's click events within ±1800 s,
    gap in exact microseconds — one user-keyed equi-join with the
    range as a secondary predicate (never a cross product); the
    stream-stream twin is streaming/joins.streaming_interval_join."""
    from .operators.events import interval_pairs

    ev = load(spark, sf_dir, "events")
    return interval_pairs(
        ev.filter(F.col("event_type") == "error"),
        ev.filter(F.col("event_type") == "click"),
        tolerance_s=1800,
    )


_STAY_SHIFT = 24


def q152_stay_points(spark, sf_dir):
    """Trajectory stay-point / dwell detection
    (events.stay_points): each user's fix sequence (planted event
    coordinates, q138's spread) collapses into maximal same-tile
    runs at shift 24; runs spanning >= 2 fixes and >= 1 h become
    stay rows with integer-microsecond dwell. One user-keyed
    shuffle, gaps-and-islands on the cell changing."""
    from .operators.events import stay_points
    from .operators.spatial import with_cell

    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.expr(LAT_EXPR.replace("doc_id", "event_id"))
        .cast("long")
        .alias("lat_i"),
        F.expr(LON_EXPR.replace("doc_id", "event_id"))
        .cast("long")
        .alias("lon_i"),
    )
    ev = with_cell(ev, shift=_STAY_SHIFT)
    return stay_points(ev, min_dwell_s=3600, min_points=2)


def _stay_points_oracle_sql() -> str:
    from .geo.cells import LAT_OFFSET, LON_OFFSET, _lon_bits

    lat = LAT_EXPR.replace("doc_id", "event_id")
    lon = LON_EXPR.replace("doc_id", "event_id")
    s = _STAY_SHIFT
    return f"""
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS tus,
    ((CAST({lat} AS BIGINT) + {LAT_OFFSET}) >> {s})
      * {1 << _lon_bits(s)}
    + ((CAST({lon} AS BIGINT) + {LON_OFFSET}) >> {s}) AS cell
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN lag(cell) OVER w IS NULL
                   OR lag(cell) OVER w <> cell
            THEN 1 ELSE 0 END AS is_new
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
),
runs AS (
  SELECT *, SUM(is_new) OVER (
    PARTITION BY user_id ORDER BY tus, event_id
    ROWS UNBOUNDED PRECEDING) AS run_id
  FROM flagged
),
edged AS (
  SELECT *,
    first_value(event_id) OVER wr AS enter_event_id,
    last_value(event_id) OVER wr AS exit_event_id
  FROM runs
  WINDOW wr AS (
    PARTITION BY user_id, run_id ORDER BY tus, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
),
agg AS (
  SELECT user_id, run_id, cell,
    MIN(enter_event_id) AS enter_event_id,
    MIN(exit_event_id) AS exit_event_id,
    CAST(COUNT(*) AS BIGINT) AS n_points,
    MAX(tus) - MIN(tus) AS dwell_us
  FROM edged GROUP BY 1, 2, 3
)
SELECT user_id, cell, enter_event_id, exit_event_id,
       n_points, CAST(dwell_us AS BIGINT) AS dwell_us
FROM agg
WHERE n_points >= 2 AND dwell_us >= 3600000000
"""


def q153_colocation(spark, sf_dir):
    """Spatio-temporal co-location join (events.colocation_pairs):
    unordered pairs of distinct users sharing a shift-24 tile in
    the same hour bucket — presence deduped to (user, cell,
    bucket), then one self-equi-join on the composite key.
    Density-guarded (max_group_users=64; inert below the sf0.1
    group max of 32, bites at the 10x input's 315 —
    colocation_overflow reports dropped groups)."""
    from .operators.events import colocation_pairs
    from .operators.spatial import with_cell

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.expr(LAT_EXPR.replace("doc_id", "event_id"))
        .cast("long")
        .alias("lat_i"),
        F.expr(LON_EXPR.replace("doc_id", "event_id"))
        .cast("long")
        .alias("lon_i"),
    )
    ev = with_cell(ev, shift=_STAY_SHIFT)
    return colocation_pairs(
        ev, bucket_s=3600, max_group_users=64
    )


def _colocation_oracle_sql() -> str:
    from .geo.cells import LAT_OFFSET, LON_OFFSET, _lon_bits

    lat = LAT_EXPR.replace("doc_id", "event_id")
    lon = LON_EXPR.replace("doc_id", "event_id")
    s = _STAY_SHIFT
    return f"""
WITH pres AS (
  SELECT DISTINCT user_id,
    ((CAST({lat} AS BIGINT) + {LAT_OFFSET}) >> {s})
      * {1 << _lon_bits(s)}
    + ((CAST({lon} AS BIGINT) + {LON_OFFSET}) >> {s}) AS cell,
    CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS bucket
  FROM events
)
SELECT a.user_id AS user_a, b.user_id AS user_b,
       CAST(COUNT(*) AS BIGINT) AS n_encounters,
       CAST(COUNT(DISTINCT a.cell) AS BIGINT) AS n_cells
FROM pres a JOIN pres b
  ON a.cell = b.cell AND a.bucket = b.bucket
 AND a.user_id < b.user_id
GROUP BY 1, 2
"""


def q158_dense_daily(spark, sf_dir):
    """Gap-filled daily activity time series: per event type, one
    row for EVERY day in the corpus span, zero-filled where no
    events landed — the calendar densification every BI/anomaly
    layer needs before windowed baselines. Integer day = FLOOR
    division of epoch micros by 86.4e9, computed exactly as
    (us - pmod(us, k)) div k. NOTE: DuckDB's integer `//` also
    TRUNCATES toward zero (-7 // 4 = -1), so the oracle applies the
    same positive-mod subtraction before dividing — both sides
    floor, even for pre-1970 timestamps. Plan: the day span is
    a 1-row aggregate (bounded funnel, documented class) exploded
    into the calendar and cross-joined with the tiny distinct
    type list (broadcast); actual counts LEFT-join onto the dense
    frame."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "(unix_micros(cast(ts as timestamp))"
            " - pmod(unix_micros(cast(ts as timestamp)),"
            " 86400000000)) div 86400000000"
        ).alias("day"),
    )
    counts = ev.groupBy("event_type", "day").agg(
        F.count("*").cast("long").alias("n_events")
    )
    span = ev.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    days = span.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    types = ev.select("event_type").distinct()
    dense = days.crossJoin(F.broadcast(types))
    return (
        dense.join(counts, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("n_events", F.lit(0)).cast("long").alias(
                "n_events"
            ),
        )
    )


def q163_user_skyline(spark, sf_dir):
    """Pareto frontier of users on (activity, spend): per-user
    event count vs summed value in integer cents, then the
    distributed skyline operator (operators/skyline.skyline_2d —
    bucket suffix-max map-side kill, per-x reduction, strict
    running max over the shrunken frontier band). The oracle is a
    direct NOT EXISTS dominance anti-join over the same per-user
    aggregate — quadratic, fine at oracle scale, impossible at
    engine scale, which is exactly why the operator exists."""
    from .operators.skyline import skyline_2d

    per_user = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("value_cents"),
        )
    )
    return skyline_2d(per_user, "n_events", "value_cents").select(
        "n_events",
        "value_cents",
        F.col("n_rows").alias("n_users"),
    )


def q159_home_cells(spark, sf_dir):
    """Home-location inference (the classic mobility heuristic:
    the cell a user frequents most during night hours 0-6 UTC,
    ties to the smallest cell id; users with no night fixes get
    no row). Integer end to end: hour = (epoch_us div 3.6e9)
    mod 24; one user-keyed aggregate + one argmin-by-struct —
    no window, no second shuffle."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.expr(
            "(unix_micros(cast(ts as timestamp)) div 3600000000)"
            " % 24"
        ).alias("hour"),
        F.expr(LAT_EXPR.replace("doc_id", "event_id"))
        .cast("long")
        .alias("lat_i"),
        F.expr(LON_EXPR.replace("doc_id", "event_id"))
        .cast("long")
        .alias("lon_i"),
    )
    from .operators.spatial import with_cell

    night = with_cell(ev, shift=_STAY_SHIFT).where(
        F.col("hour") < 6
    )
    per_cell = night.groupBy("user_id", "cell").agg(
        F.count("*").cast("long").alias("n_night")
    )
    return (
        per_cell.groupBy("user_id")
        .agg(
            F.max(
                F.struct(
                    "n_night", (-F.col("cell")).alias("_nc"), "cell"
                )
            ).alias("_m")
        )
        .select(
            "user_id",
            F.col("_m.cell").alias("home_cell"),
            F.col("_m.n_night").alias("n_night"),
        )
    )


def _home_cells_oracle_sql() -> str:
    from .geo.cells import LAT_OFFSET, LON_OFFSET, _lon_bits

    lat = LAT_EXPR.replace("doc_id", "event_id")
    lon = LON_EXPR.replace("doc_id", "event_id")
    s = _STAY_SHIFT
    return f"""
WITH night AS (
  SELECT user_id,
    ((CAST({lat} AS BIGINT) + {LAT_OFFSET}) >> {s})
      * {1 << _lon_bits(s)}
    + ((CAST({lon} AS BIGINT) + {LON_OFFSET}) >> {s}) AS cell
  FROM events
  WHERE (epoch_us(ts) // 3600000000) % 24 < 6
),
per_cell AS (
  SELECT user_id, cell, CAST(COUNT(*) AS BIGINT) AS n_night
  FROM night GROUP BY 1, 2
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id ORDER BY n_night DESC, cell ASC) AS rn
  FROM per_cell
)
SELECT user_id, cell AS home_cell, n_night
FROM ranked WHERE rn = 1
"""


def _power_iter_oracle_sql(iters: int = 3) -> str:
    """Unrolled power-iteration rounds mirroring
    operators/linalg.power_iteration_projection: per round a dot
    product keyed vec_id, the 2^13 floor-shrink, the per-dim
    contribution sum, and the value-adaptive power-of-two
    renormalizer. DuckDB's `//` TRUNCATES toward zero on negatives
    (-7 // 4 = -1), so every division first subtracts the positive
    mod ((a % p + p) % p) — after that the quotient is exact and
    truncate == floor == the engine's pmod form. y casts to BIGINT
    (it fits by construction) so bin() stays in long range."""
    rounds = []
    prev = "v0"
    for r in range(1, iters + 1):
        rounds.append(
            f"""
s{r} AS (
  SELECT x.vec_id, SUM(x.x * v.val) AS s
  FROM xq x JOIN {prev} v USING (dim) GROUP BY 1
),
sp{r} AS (
  SELECT vec_id,
    CAST((s - ((s % 8192 + 8192) % 8192)) // 8192 AS BIGINT) AS sp
  FROM s{r}
),
y{r} AS (
  SELECT x.dim, CAST(SUM(x.x * p.sp) AS BIGINT) AS y
  FROM xq x JOIN sp{r} p USING (vec_id) GROUP BY 1
),
m{r} AS (SELECT MAX(ABS(y)) AS mx FROM y{r}),
v{r} AS (
  SELECT dim,
    CAST((y - ((y % p + p) % p)) // p AS BIGINT) AS val
  FROM (
    SELECT dim, y,
      (CAST(1 AS BIGINT)
        << GREATEST(0, LENGTH(bin(mx)) - 21)) AS p
    FROM y{r}, m{r})
)"""
        )
        prev = f"v{r}"
    joined = ",".join(rounds)
    return f"""
WITH xq AS (
  SELECT vec_id, generate_subscripts(qv, 1) AS dim,
         unnest(qv) AS x
  FROM (
    SELECT vec_id,
      list_transform(embedding,
        e -> CAST(floor(CAST(e AS DOUBLE) * 128) AS BIGINT)) AS qv
    FROM embeddings
  )
),
v0 AS (
  SELECT DISTINCT dim, CAST(16384 AS BIGINT) AS val FROM xq
),{joined}
SELECT x.vec_id, CAST(SUM(x.x * v.val) AS BIGINT) AS proj
FROM xq x JOIN {prev} v USING (dim) GROUP BY 1
"""


def _gps_jumps_oracle_sql(max_cheb_per_s: int = 25000) -> str:
    lat = LAT_EXPR.replace("doc_id", "event_id")
    lon = LON_EXPR.replace("doc_id", "event_id")
    return f"""
WITH fixes AS (
  SELECT user_id, epoch_us(ts) AS us,
    CAST({lon} AS BIGINT) AS x, CAST({lat} AS BIGINT) AS y
  FROM events
),
moves AS (
  SELECT user_id,
    us - LAG(us) OVER w AS dt,
    ABS(x - LAG(x) OVER w) AS adx,
    ABS(y - LAG(y) OVER w) AS ady
  FROM fixes
  WINDOW w AS (PARTITION BY user_id ORDER BY us, x, y)
),
cls AS (
  SELECT user_id,
    dt IS NOT NULL AS is_move,
    CASE WHEN dt IS NULL THEN FALSE
         WHEN dt = 0 THEN GREATEST(adx, ady) > 0
         ELSE (GREATEST(adx, ady) * 1000000) // dt
              > {max_cheb_per_s} END AS is_jump,
    CASE WHEN dt IS NOT NULL AND dt > 0
         THEN (GREATEST(adx, ady) * 1000000) // dt END AS speed
  FROM moves
)
SELECT user_id,
  CAST(COUNT(*) AS BIGINT) AS n_fixes,
  CAST(SUM(CASE WHEN is_move THEN 1 ELSE 0 END) AS BIGINT)
    AS n_moves,
  CAST(SUM(CASE WHEN is_jump THEN 1 ELSE 0 END) AS BIGINT)
    AS n_jumps,
  CAST(MAX(speed) AS BIGINT) AS max_speed
FROM cls GROUP BY 1
"""


def _segment_oracle_sql(
    max_word_len: int = 12, max_token_len: int = 4, top_n: int = 32
) -> str:
    """q179: the min-token DP unrolled as one CTE per position —
    cost[r] = min over in-vocab (or single-char) suffixes ending at
    r of cost[r-k] + 1. Vocabulary = top-N char 2..4-grams by
    (count DESC, gram ASC), exactly the engine's ranking. The
    round CTEs are AS MATERIALIZED: DuckDB inlines plain CTEs, and
    the chained union referencing each previous round twice would
    otherwise blow up exponentially (observed as a hang at 12
    rounds)."""
    rounds = []
    prev = "pall0"
    for r in range(1, max_word_len + 1):
        rounds.append(
            f"""
p{r} AS MATERIALIZED (
  SELECT w.doc_id, {r} AS pos, MIN(p.cost + 1) AS cost
  FROM words w JOIN {prev} p ON p.doc_id = w.doc_id
    AND p.pos >= {r} - {max_token_len} AND p.pos <= {r} - 1
  WHERE length(w.word) >= {r}
    AND ({r} - p.pos = 1
         OR substr(w.word, p.pos + 1, {r} - p.pos)
            IN (SELECT gram FROM vocab))
  GROUP BY 1
),
pall{r} AS MATERIALIZED (
  SELECT * FROM {prev} UNION ALL SELECT * FROM p{r}
)"""
        )
        prev = f"pall{r}"
    joined = ",".join(rounds)
    return f"""
WITH words AS (
  SELECT doc_id,
    substr(string_split(text, ' ')[1], 1, {max_word_len}) AS word
  FROM documents
  WHERE length(substr(string_split(text, ' ')[1],
                      1, {max_word_len})) >= 1
),
grams AS (
  SELECT substr(word, i.i, k.k) AS gram
  FROM words
  CROSS JOIN (SELECT unnest(range(2, {max_token_len + 1})) AS k) k
  CROSS JOIN (SELECT unnest(range(1, {max_word_len})) AS i) i
  WHERE i.i + k.k - 1 <= length(word)
),
vocab AS (
  SELECT gram FROM (
    SELECT gram,
      ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, gram) AS rn
    FROM grams GROUP BY gram)
  WHERE rn <= {top_n}
),
pall0 AS (SELECT doc_id, 0 AS pos, 0 AS cost FROM words),{joined}
SELECT w.doc_id, w.word,
  CAST(length(w.word) AS BIGINT) AS word_len,
  CAST(p.cost AS BIGINT) AS n_tokens
FROM words w JOIN {prev} p
  ON p.doc_id = w.doc_id AND p.pos = length(w.word)
"""


def _lpa_oracle_sql(iters: int = 4) -> str:
    """Unrolled synchronous LPA rounds: per round a neighbor-label
    count, a windowed argmax (count DESC, label ASC — the engine's
    min-tie-break), and a coalescing carry for nodes whose
    neighborhood vanished. Mirrors q172's planted 4-block graph."""
    rounds = []
    prev = "l0"
    for r in range(1, iters + 1):
        rounds.append(
            f"""
c{r} AS (
  SELECT e.src AS node, l.label, COUNT(*) AS c
  FROM und e JOIN {prev} l ON l.node = e.dst GROUP BY 1, 2
),
b{r} AS (
  SELECT node, label FROM (
    SELECT node, label,
      ROW_NUMBER() OVER (PARTITION BY node
                         ORDER BY c DESC, label) AS rn
    FROM c{r}) WHERE rn = 1
),
l{r} AS (
  SELECT p.node,
         CAST(COALESCE(b.label, p.label) AS BIGINT) AS label
  FROM {prev} p LEFT JOIN b{r} b ON b.node = p.node
)"""
        )
        prev = f"l{r}"
    joined = ",".join(rounds)
    return f"""
WITH raw AS (
  SELECT doc_id % 120 AS u,
    CASE WHEN doc_id % 17 = 0 THEN (doc_id % 120 + 30) % 120
         ELSE (doc_id % 120) - ((doc_id % 120) % 30)
              + ((doc_id * 2654435761) % 4294967296) % 30
    END AS v
  FROM documents
),
und AS (
  SELECT u AS src, v AS dst FROM raw WHERE u <> v
  UNION
  SELECT v, u FROM raw WHERE u <> v
),
l0 AS (
  SELECT DISTINCT CAST(src AS BIGINT) AS node,
         CAST(src AS BIGINT) AS label FROM und
),{joined}
SELECT node, label AS community FROM {prev}
"""


_DENSE_DAILY_ORACLE = """
WITH ev AS (
  SELECT event_type,
    (epoch_us(ts)
      - ((epoch_us(ts) % 86400000000 + 86400000000) % 86400000000))
      // 86400000000 AS day
  FROM events
),
counts AS (
  SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM ev GROUP BY 1, 2
),
span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
days AS (
  SELECT unnest(range(d0, d1 + 1)) AS day FROM span
),
types AS (SELECT DISTINCT event_type FROM ev)
SELECT t.event_type, d.day,
       CAST(COALESCE(c.n_events, 0) AS BIGINT) AS n_events
FROM days d CROSS JOIN types t
LEFT JOIN counts c
  ON c.event_type = t.event_type AND c.day = d.day
"""


def q118_star_rollup(spark, sf_dir):
    """Classic star join over the relational side tables: orders
    joined to the customer and nation dims (both broadcast — tiny
    next to the fact side), revenue rolled up per nation x month.
    Money is summed as exact integer cents (double -> cents is one
    IEEE-pinned multiply per value; bigint sums are order-
    invariant, unlike double sums, which is what makes the rollup
    oracle-checkable)."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        orders.select(
            "o_custkey",
            F.month("o_orderdate").cast("long").alias("month"),
            cents.alias("cents"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", "month")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("cents").alias("revenue_cents"),
        )
    )


def q121_grouped_quantiles(spark, sf_dir):
    """Per-language token-count percentile sketch
    (sketches.grouped_binned_quantiles): the q105 certified
    [lo,hi] brackets, partitioned by the lang column — every
    window/argmin is group-keyed, no SinglePartition funnel."""
    from .operators.sketches import grouped_binned_quantiles

    docs = load(spark, sf_dir, "documents").select(
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("ntok"),
    )
    return grouped_binned_quantiles(
        docs, "lang", "ntok", (50, 90, 99), 3
    )


def q122_k_core(spark, sf_dir):
    """2-core of a sparsified host graph (linkgraph.k_core):
    iterative peel, one driver job per pass, lazily checkpointed
    passes — monotone, so the early-stopped fixed point equals the
    oracle's fully-unrolled 12 passes."""
    from .operators.linkgraph import k_core

    d = F.col("doc_id")
    dst_idx = F.pmod(
        F.pmod(d * F.lit(2654435761), F.lit(4294967296)), F.lit(97)
    )
    edges = (
        load(spark, sf_dir, "documents")
        .filter(d % 7 == 0)
        .select(
            F.concat(F.lit("host"), (d % 97).cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("host"), dst_idx.cast("string")).alias(
                "dst"
            ),
        )
    )
    return k_core(edges, k=2)


def _kcore_oracle(k: int = 2, passes: int = 12) -> str:
    stages = ["""e0 AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM (
    SELECT 'host' || CAST(doc_id % 97 AS VARCHAR) AS src,
           'host' || CAST((doc_id * 2654435761) % 4294967296 % 97
                          AS VARCHAR) AS dst
    FROM documents WHERE doc_id % 7 = 0
  ) WHERE src <> dst
)"""]
    for i in range(1, passes + 1):
        stages.append(f"""d{i} AS MATERIALIZED (
  SELECT v, COUNT(*) AS d FROM (
    SELECT a AS v FROM e{i - 1}
    UNION ALL SELECT b FROM e{i - 1}
  ) GROUP BY 1
),
e{i} AS MATERIALIZED (
  SELECT e.a, e.b FROM e{i - 1} e
  JOIN d{i} x ON x.v = e.a AND x.d >= {k}
  JOIN d{i} y ON y.v = e.b AND y.d >= {k}
)""")
        
    return (
        "WITH " + ",\n".join(stages)
        + f"""
SELECT DISTINCT host FROM (
  SELECT a AS host FROM e{passes}
  UNION ALL SELECT b FROM e{passes}
)"""
    )


def q123_tile_blur(spark, sf_dir):
    """3x3 integer kernel smoothing of the shift-20 doc-density
    rollup (tiles.tile_blur): separable binomial weights
    4/2/1 div 16, scatter + bounded groupBy over the cells-sized
    rollup — the corpus is read once for the rollup itself."""
    from .operators.tiles import tile_blur

    cells = doc_points(spark, sf_dir).select(
        (
            F.shiftleft(
                F.shiftright(F.col("lat_i") + F.lit(900_000_000), 20),
                12,
            )
            + F.shiftright(F.col("lon_i") + F.lit(1_800_000_000), 20)
        ).alias("cell")
    )
    rollup = cells.groupBy("cell").agg(
        F.count("*").cast("long").alias("n")
    )
    return tile_blur(rollup, shift=20)


def q124_spatial_shards(spark, sf_dir):
    """Spatially-contiguous export shards
    (export.spatial_shard_plan): docs ranked along the Hilbert
    curve and cut into 8 equal ranges — each shard is a compact
    region; rank via the three-pass distributed index, no global
    sort funnel."""
    from .operators.export import spatial_shard_plan

    return spatial_shard_plan(doc_points(spark, sf_dir))


def _q124_oracle() -> str:
    from .geo.hilbert import hilbert_sql

    stages = hilbert_sql("src", "cu", "cv", 12)
    return f"""
WITH {_PTS_CTE},
src AS (
  SELECT doc_id AS carry,
         ((lon_i + 1800000000) >> 20) AS cu,
         ((lat_i + 900000000) >> 20) AS cv
  FROM pts
),
{stages},
ranked AS (
  SELECT carry AS doc_id, hd,
    CAST(ROW_NUMBER() OVER (ORDER BY hd, carry) - 1 AS BIGINT)
      AS pos
  FROM hfinal
)
SELECT doc_id, hd,
  CAST((pos * 8) // (SELECT COUNT(*) FROM pts) AS BIGINT) AS shard
FROM ranked
"""


def q125_transitions(spark, sf_dir):
    """Per-user event transition matrix (events.event_transitions):
    (prev_type, type, n) over time-ordered per-user sequences —
    one user-keyed window + one bounded groupBy."""
    from .operators.events import event_transitions

    return event_transitions(load(spark, sf_dir, "events"))


def q126_asof_enrich(spark, sf_dir):
    """Temporal as-of join (merge.asof_join, SURVEY J9): every
    event picks the profile version in force at its timestamp
    (latest version row with vts <= ts per user). ONE keyed
    shuffle-sort (tagged-union sweep) — the oracle is the
    INDEPENDENT correlated-subquery formulation, so the sweep's
    semantics are checked, not replayed."""
    from .operators.merge import asof_join

    ev = load(spark, sf_dir, "events")
    vers = (
        ev.where(F.col("event_id") % 5 == 0)
        .select(
            "user_id",
            F.to_date("ts").cast("timestamp").alias("vts"),
            F.expr(
                "datediff(to_date(ts), DATE'1970-01-01')"
            ).cast("long").alias("version_day"),
        )
        .distinct()
    )
    out = asof_join(
        ev.select("event_id", "user_id", "ts"),
        vers,
        key="user_id",
        left_ts="ts",
        right_ts="vts",
        payload_cols=["version_day"],
    )
    return out.select("event_id", "user_id", "version_day")


def q127_assign_partitioned(spark, sf_dir):
    """G1/J5 without the broadcast
    (spatial.assign_regions_partitioned): the polygon side as
    DATA — a lon-strip shuffle equi-join pairs points with
    strip-local edges and the exact ray cast runs as a relational
    crossing-parity aggregate, admin tie-break as min_by. Same
    oracle as q03; this is the physical plan that survives a
    polygon side too big for any driver-built index."""
    from .operators.spatial import (
        assign_regions_partitioned,
        polyset_frames,
    )

    pts = doc_points(spark, sf_dir)
    edges, polys = polyset_frames(spark, fixture_polyset())
    return assign_regions_partitioned(pts, edges, polys)


def q78_sessionize(spark, sf_dir):
    """Event sessionization (operators/events.sessionize):
    gaps-and-islands with a 30-minute inactivity gap over the
    user-keyed event stream — one user-keyed shuffle, no global
    sort; the batch twin of a streaming session window."""
    from .operators.events import sessionize

    return sessionize(load(spark, sf_dir, "events"), gap_s=1800)


def q79_bloom_seen(spark, sf_dir):
    """Bloom-filter crawl dedup (operators/bloom.py): the even
    doc_id half of the corpus is the committed seen-set, the odd
    half the incoming crawl; the filter is 32 longs (1024 bits —
    32 used per word so shifts stay checked-safe cross-engine —
    k=4, deliberately small so the deterministic false-positive
    set is non-empty at this SF), built by one bit_or aggregation
    and broadcast to a map-only probe. Exact ground truth attached
    so FPs are visible; `maybe_seen=false` rows are guaranteed
    unseen (no false negatives)."""
    from .operators.bloom import bloom_seen_report

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.substring("text", 1, 40)).alias("fp"),
    )
    committed = (
        d.filter(F.col("doc_id") % 2 == 0).select("fp").distinct()
    )
    incoming = (
        d.filter(F.col("doc_id") % 2 == 1).select("fp").distinct()
    )
    return bloom_seen_report(
        committed, incoming, key="fp", n_words=32, k=4
    )


def q80_lm_fluency(spark, sf_dir):
    """KenLM-style n-gram LM fluency gate (operators/lm.lm_score),
    integer-exact: bigram counts over the lang='en' reference
    slice, every document scored by the mean floor-log2 count of
    its bigrams (binary digit count — exact in any engine) plus
    its OOV rate. One corpus scan; the model and the scoring join
    share the per-(doc, gram) histogram."""
    from .operators.lm import lm_score

    return lm_score(
        load(spark, sf_dir, "documents"), F.col("lang") == "en"
    )


def q81_classifier_gate(spark, sf_dir):
    """fastText-shaped quality-classifier inference
    (operators/lm.classify): tokens hash into 4096 buckets, the
    per-doc bucket histogram dot-products against a broadcast
    weight table (deterministic synthetic weights — the trained
    model would arrive as a parquet read), keep = logit > 0.
    Map-only over the corpus + one (doc, bucket) partial agg."""
    from .operators.lm import classify, hashed_weights

    return classify(
        load(spark, sf_dir, "documents"),
        hashed_weights(spark, n_buckets=4096),
        n_buckets=4096,
    )


def q82_kmeans_ivf_train(spark, sf_dir):
    """Distributed Lloyd k-means over embeddings
    (operators/clustering.kmeans_assign) — the IVF coarse-quantizer
    trainer, integer-exact (fixed-point vectors, bigint distances,
    truncating-div centroid means) so the post-2-pass assignment
    is bit-reproducible and the oracle replays the passes unrolled
    in pure SQL. Per pass: broadcast K-row centroids, map-only
    assignment, one groupBy(cluster) update."""
    from .operators.clustering import kmeans_assign

    return kmeans_assign(
        load(spark, sf_dir, "embeddings"), k=8, n_iter=2
    )


def q83_export_shards(spark, sf_dir):
    """Training-export shard plan (operators/export.shard_plan):
    deterministic keyed-hash corpus shuffle into 8 shards —
    membership map-only, within-shard position one keyed shuffle,
    no global sort. Reproducible across partitionings/retries;
    epoch reshuffle = change the salt."""
    from .operators.export import shard_plan

    return shard_plan(
        load(spark, sf_dir, "documents"), n_shards=8
    )


def q84_token_percentiles(spark, sf_dir):
    """Exact corpus order statistics
    (operators/indexing.exact_percentiles): p50/p90/p99 of
    tokens-per-document via a distinct-value histogram + integer
    ceil-rank — the oracle-checkable replacement for
    approx_percentile, whose sketch merge is partition-order
    dependent."""
    from .operators.indexing import exact_percentiles

    docs = load(spark, sf_dir, "documents").select(
        F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    return exact_percentiles(docs, "n_tokens")


def q108_weighted_sample(spark, sf_dir):
    """Deterministic PPS sampling (export.weighted_systematic_
    sample): ~80 documents picked proportionally to token count by
    systematic selection over the integer weight prefix sum — no
    rand(), so the sample is identical across engines,
    partitionings, and retries; `hits` carries the multiplicity
    for weighted estimators."""
    from .operators.export import weighted_systematic_sample

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("w"),
    )
    return weighted_systematic_sample(
        docs, ["doc_id"], "w", target_n=80
    )


def q87_ivf_trained(spark, sf_dir):
    """The full vector-index build: Lloyd-trained coarse quantizer
    (q82's clustering.kmeans_centroid_vectors) feeding the IVF
    probe plan (q47's dedup.embed_ann_ivf via its `centroids`
    table input) — train and serve composed in one lineage. The
    centroid table is K rows, broadcast everywhere it appears."""
    from .operators.clustering import kmeans_centroid_vectors
    from .operators.dedup import embed_ann_ivf

    emb = load(spark, sf_dir, "embeddings")
    cents = kmeans_centroid_vectors(emb, k=8, n_iter=2)
    return embed_ann_ivf(
        emb,
        query_filter=F.col("vec_id") % 50 == 0,
        n_probe=2,
        k=3,
        centroids=cents,
    )


def q88_incremental_dedup(spark, sf_dir):
    """Cross-snapshot near-dedup (dedup.incremental_near_dups):
    a NEW batch (planted near-dups of corpus docs + fresh docs) is
    deduped against the EXISTING corpus by probing the corpus's
    stored LSH index (dedup.minhash_bands) with the batch's band
    rows — one equi-join keyed on (band_idx, band_val) — then
    verifying candidates with exact 3-gram Jaccard. The corpus is
    never self-joined or re-signed: the monthly-crawl-vs-corpus
    plan at 100 TB. Batch ids are offset so the two snapshots'
    id spaces are disjoint."""
    from .operators.dedup import incremental_near_dups

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") % 3 == 0)
    batch = (
        docs.filter(F.col("doc_id") % 21 == 0)
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.lit("dup "), F.col("text")).alias("text"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 3 == 1).select(
                (F.col("doc_id") + 2000000).alias("doc_id"),
                "text",
            )
        )
    )
    return incremental_near_dups(corpus, batch, threshold=0.5)


def _q88_oracle() -> str:
    """Replay of the composed incremental plan: both snapshots'
    band rows from the identical salted-md5 signature arithmetic
    (q29/q17), candidates restricted to batch x corpus, exact
    Jaccard on candidates only."""
    n_hashes, band_rows = 12, 2
    sig_aggs = ",\n    ".join(
        f"MIN(md5('{i}:' || gram)) AS s{i}" for i in range(n_hashes)
    )
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band_idx, "
        f"s{band_rows * b} || '|' || s{band_rows * b + 1} "
        "AS band_val FROM sigs"
        for b in range(n_hashes // band_rows)
    )
    return f"""
WITH both_snaps AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 1000000, 'dup ' || text
  FROM documents WHERE doc_id % 21 = 0
  UNION ALL
  SELECT doc_id + 2000000, text
  FROM documents WHERE doc_id % 3 = 1
),
docs AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM both_snaps
),
grams AS (
  SELECT DISTINCT doc_id,
    array_to_string(toks[CAST(i.i AS BIGINT):CAST(i.i + 2 AS BIGINT)],
                    ' ') AS gram
  FROM docs
  CROSS JOIN LATERAL (
    SELECT unnest(range(1, greatest(len(toks) - 2, 1) + 1)) AS i
  ) i
),
sigs AS (
  SELECT doc_id,
    {sig_aggs}
  FROM grams GROUP BY doc_id
),
bands AS (
{band_selects}
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y
    ON x.band_idx = y.band_idx AND x.band_val = y.band_val
  WHERE x.doc_id >= 1000000 AND y.doc_id < 1000000
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY 1),
inter AS (
  SELECT c.a, c.b, COUNT(*) AS inter
  FROM cand c
  JOIN grams g1 ON g1.doc_id = c.a
  JOIN grams g2 ON g2.doc_id = c.b AND g2.gram = g1.gram
  GROUP BY 1, 2
)
SELECT i.a AS batch_doc, i.b AS corpus_doc, i.inter,
  i.inter * 1.0 / (sa.sz + sb.sz - i.inter) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.a
JOIN sizes sb ON sb.doc_id = i.b
WHERE i.inter * 1.0 / (sa.sz + sb.sz - i.inter) >= 0.5
"""


def q89_pq_codes(spark, sf_dir):
    """Product-quantization encode (pq.pq_encode): every dim-64
    embedding compresses to m=8 one-byte subspace codes against a
    first-16-seeded integer codebook — map-only (posexplode +
    broadcast codebook + in-row argmin), zero data shuffles; the
    codes table is the 8-byte-per-vector artifact you persist at
    100 TB instead of the 256-byte vectors."""
    from .operators.pq import pq_encode

    return pq_encode(load(spark, sf_dir, "embeddings"))


def q90_pq_adc_topk(spark, sf_dir):
    """PQ asymmetric-distance top-k search (pq.pq_adc_topk): each
    query builds an m x k lookup table of exact subspace
    distances (one broadcast join), candidates are scored by
    folding their code arrays through the broadcast LUT in-row —
    the corpus side never rereads vectors, only 8-byte code rows.
    Integer-exact, ties -> lowest vec_id."""
    from .operators.pq import pq_adc_topk

    return pq_adc_topk(
        load(spark, sf_dir, "embeddings"),
        F.col("vec_id") % 50 == 0,
        topk=3,
    )


def q93_ivf_pq_topk(spark, sf_dir):
    """IVF-PQ composed search (pq.ivf_pq_topk): coarse integer
    centroids route each query to n_probe=2 inverted lists, ADC
    scores only those lists' 8-byte code rows through the query's
    broadcast LUT — the full compressed-and-routed 100-TB vector
    plan (per query: n_probe/kc of the corpus' CODES, never the
    vectors). Integer-exact end to end."""
    from .operators.pq import ivf_pq_topk

    return ivf_pq_topk(
        load(spark, sf_dir, "embeddings"),
        F.col("vec_id") % 50 == 0,
        kc=8,
        n_probe=2,
        topk=3,
    )


def _ivf_pq_oracle(
    kc: int = 8, n_probe: int = 2, topk: int = 3, dim: int = 64
) -> str:
    return f"""
WITH {_pq_ctes()},
cents AS (
  SELECT vec_id AS cid, q AS cv FROM e WHERE vec_id < {kc}
),
vdist AS (
  SELECT e.vec_id, c.cid,
    list_sum(list_transform(range(1, {dim} + 1),
      i -> (e.q[i] - c.cv[i]) * (e.q[i] - c.cv[i]))) AS d2
  FROM e CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, cid AS cluster
  FROM (SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY d2, cid) AS rk FROM vdist)
  WHERE rk = 1
),
probes AS (
  SELECT vec_id AS qid, cid AS cluster
  FROM (SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY d2, cid) AS rk
        FROM vdist WHERE vec_id % 50 = 0)
  WHERE rk <= {n_probe}
),
lut AS (
  SELECT vec_id AS qid, s, e, d2 FROM scored
  WHERE vec_id % 50 = 0
),
adc AS (
  SELECT p.qid, a.vec_id, a.cluster,
         CAST(SUM(l.d2) AS BIGINT) AS adist2
  FROM probes p
  JOIN assign a ON a.cluster = p.cluster
                AND a.vec_id <> p.qid
  JOIN codes co ON co.vec_id = a.vec_id
  JOIN lut l ON l.qid = p.qid AND l.s = co.s AND l.e = co.code
  GROUP BY 1, 2, 3
)
SELECT qid, vec_id, cluster, adist2, CAST(rk AS BIGINT) AS rk
FROM (SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY adist2, vec_id) AS rk
      FROM adc)
WHERE rk <= {topk}
"""


def q94_pq_trained_codes(spark, sf_dir):
    """Trained-PQ encode: per-subspace codebooks Lloyd-trained
    JOINTLY (pq.pq_trained_codebook — the subspace id rides the
    cluster key, so one assign + one update job per pass trains
    all 8 codebooks; pass count independent of m), then the q89
    map-only encode against the trained (s, e, cv) table. The
    train-and-serve composition for the compressed vector path,
    integer-exact end to end."""
    from .operators.pq import pq_encode, pq_trained_codebook

    emb = load(spark, sf_dir, "embeddings")
    cb = pq_trained_codebook(emb, m=8, k=8, dim=64, n_iter=1)
    return pq_encode(emb, m=8, k=8, dim=64, codebook=cb)


def _pq_trained_oracle(
    m: int = 8, k: int = 8, dim: int = 64, n_iter: int = 1
) -> str:
    """Unrolled joint-Lloyd replay: one (s, cluster)-keyed
    assign/update chain per pass covers all m subspaces (the SQL
    twin of the one-job-per-pass claim), then the exact-argmin
    encode against the trained codebooks."""
    sub = dim // m
    d2 = (
        f"list_sum(list_transform(range(1, {sub} + 1),"
        " i -> (v.sv[i] - c.cv[i]) * (v.sv[i] - c.cv[i])))"
    )
    parts = [
        f"""e AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000)
                AS BIGINT)) AS q
  FROM embeddings
),
subs AS (
  SELECT vec_id, CAST(s.s AS BIGINT) AS s,
         q[CAST(s.s * {sub} + 1 AS BIGINT):
           CAST(s.s * {sub} + {sub} AS BIGINT)] AS sv
  FROM e CROSS JOIN LATERAL (
    SELECT unnest(range(0, {m})) AS s
  ) s
),
c0 AS (
  SELECT s, vec_id AS e, sv AS cv FROM subs WHERE vec_id < {k}
)"""
    ]
    for it in range(1, n_iter + 1):
        parts.append(
            f"""d{it} AS (
  SELECT v.vec_id, v.s, v.sv, c.e, {d2} AS d2
  FROM subs v JOIN c{it - 1} c ON c.s = v.s
),
a{it} AS (
  SELECT s, e AS cluster, sv
  FROM (SELECT *, row_number() OVER (
          PARTITION BY vec_id, s ORDER BY d2, e) AS rk
        FROM d{it})
  WHERE rk = 1
),
u{it} AS (
  SELECT s, cluster, i, CAST(SUM(sv[i]) AS BIGINT) AS sm,
         COUNT(*) AS n
  FROM a{it}, UNNEST(range(1, {sub} + 1)) AS r(i)
  GROUP BY 1, 2, 3
),
c{it} AS (
  SELECT s, cluster AS e,
         list(CAST(sm // n AS BIGINT) ORDER BY i) AS cv
  FROM u{it} GROUP BY 1, 2
)"""
        )
    parts.append(
        f"""df AS (
  SELECT v.vec_id, v.s, c.e, {d2} AS d2
  FROM subs v JOIN c{n_iter} c ON c.s = v.s
),
codes AS (
  SELECT vec_id, s, e AS code
  FROM (SELECT *, row_number() OVER (
          PARTITION BY vec_id, s ORDER BY d2, e) AS rk
        FROM df)
  WHERE rk = 1
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT vec_id, CAST(s AS BIGINT) AS s, code FROM codes
"""
    )


def q95_residual_ivf_pq(spark, sf_dir):
    """Residual IVF-PQ — the IVFADC layout (pq.residual_ivf_pq_topk):
    PQ codes quantize each vector's RESIDUAL from its coarse
    centroid; queries build a residual LUT per probed list and
    ADC-score that list's 8-byte code rows. Fixed-point
    subtraction keeps the whole chain in longs, so the oracle
    replays it exactly."""
    from .operators.pq import residual_ivf_pq_topk

    return residual_ivf_pq_topk(
        load(spark, sf_dir, "embeddings"),
        F.col("vec_id") % 50 == 0,
        kc=8,
        m=8,
        k=8,
        n_probe=2,
        topk=3,
    )


def _residual_ivf_pq_oracle(
    kc: int = 8,
    m: int = 8,
    k: int = 8,
    dim: int = 64,
    n_probe: int = 2,
    topk: int = 3,
) -> str:
    sub = dim // m
    d2full = (
        f"list_sum(list_transform(range(1, {dim} + 1),"
        " i -> (e.q[i] - c.cv[i]) * (e.q[i] - c.cv[i])))"
    )
    d2sub = (
        f"list_sum(list_transform(range(1, {sub} + 1),"
        " i -> (v.sv[i] - c.cv[i]) * (v.sv[i] - c.cv[i])))"
    )
    return f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000)
                AS BIGINT)) AS q
  FROM embeddings
),
cents AS (
  SELECT vec_id AS cid, q AS cv FROM e WHERE vec_id < {kc}
),
vdist AS (
  SELECT e.vec_id, c.cid, {d2full} AS d2
  FROM e CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, cid AS cluster
  FROM (SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY d2, cid) AS rk FROM vdist)
  WHERE rk = 1
),
rv AS (
  SELECT e.vec_id, a.cluster,
         list_transform(range(1, {dim} + 1),
           i -> e.q[i] - c.cv[i]) AS q
  FROM e
  JOIN assign a ON a.vec_id = e.vec_id
  JOIN cents c ON c.cid = a.cluster
),
rsubs AS (
  SELECT vec_id, CAST(s.s AS BIGINT) AS s,
         q[CAST(s.s * {sub} + 1 AS BIGINT):
           CAST(s.s * {sub} + {sub} AS BIGINT)] AS sv
  FROM rv CROSS JOIN LATERAL (
    SELECT unnest(range(0, {m})) AS s
  ) s
),
rcb AS (
  SELECT s, vec_id AS e, sv AS cv FROM rsubs WHERE vec_id < {k}
),
rscored AS (
  SELECT v.vec_id, v.s, c.e, {d2sub} AS d2
  FROM rsubs v JOIN rcb c ON c.s = v.s
),
codes AS (
  SELECT vec_id, s, e AS code
  FROM (SELECT *, row_number() OVER (
          PARTITION BY vec_id, s ORDER BY d2, e) AS rk
        FROM rscored)
  WHERE rk = 1
),
probes AS (
  SELECT vec_id AS qid, cid AS cluster
  FROM (SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY d2, cid) AS rk
        FROM vdist WHERE vec_id % 50 = 0)
  WHERE rk <= {n_probe}
),
qres AS (
  SELECT p.qid, p.cluster,
         list_transform(range(1, {dim} + 1),
           i -> e.q[i] - c.cv[i]) AS q
  FROM probes p
  JOIN e ON e.vec_id = p.qid
  JOIN cents c ON c.cid = p.cluster
),
qrsubs AS (
  SELECT qid, cluster, CAST(s.s AS BIGINT) AS s,
         q[CAST(s.s * {sub} + 1 AS BIGINT):
           CAST(s.s * {sub} + {sub} AS BIGINT)] AS sv
  FROM qres CROSS JOIN LATERAL (
    SELECT unnest(range(0, {m})) AS s
  ) s
),
lut AS (
  SELECT v.qid, v.cluster, v.s, c.e, {d2sub} AS d2
  FROM qrsubs v JOIN rcb c ON c.s = v.s
),
adc AS (
  SELECT l.qid, a.vec_id, a.cluster,
         CAST(SUM(l.d2) AS BIGINT) AS adist2
  FROM lut l
  JOIN assign a ON a.cluster = l.cluster
                AND a.vec_id <> l.qid
  JOIN codes co ON co.vec_id = a.vec_id
                AND co.s = l.s AND co.code = l.e
  GROUP BY 1, 2, 3
)
SELECT qid, vec_id, cluster, adist2, CAST(rk AS BIGINT) AS rk
FROM (SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY adist2, vec_id) AS rk
      FROM adc)
WHERE rk <= {topk}
"""


def q96_corpus_delta(spark, sf_dir):
    """Snapshot delta (text.corpus_delta) — the webtext twin of
    the OSM diff (J6): old = documents, new = documents with
    doc_id%13==0 deleted, doc_id%7==0 texts edited, and 50 fresh
    ids appended. One digest-projected full-outer join; the
    output is the work list an incremental pipeline feeds to the
    q88 index probe and the filter gates."""
    from .operators.text import corpus_delta

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    new = (
        docs.filter(F.col("doc_id") % 13 != 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.lit("edited "), F.col("text")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") < 50).select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                "text",
            )
        )
    )
    return corpus_delta(docs, new)


_Q96_ORACLE = """
WITH old AS (SELECT doc_id, text FROM documents),
new AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN 'edited ' || text
              ELSE text END AS text
  FROM documents WHERE doc_id % 13 <> 0
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 50
),
o AS (SELECT doc_id, md5(text) AS ho FROM old),
n AS (SELECT doc_id, md5(text) AS hn FROM new),
j AS (
  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id, o.ho, n.hn
  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
)
SELECT doc_id,
  CASE WHEN ho IS NULL THEN 'added'
       WHEN hn IS NULL THEN 'deleted'
       WHEN ho <> hn THEN 'modified'
       ELSE 'same' END AS change
FROM j
WHERE (CASE WHEN ho IS NULL THEN 'added'
            WHEN hn IS NULL THEN 'deleted'
            WHEN ho <> hn THEN 'modified'
            ELSE 'same' END) <> 'same'
"""


def q97_countmin_sketch(spark, sf_dir):
    """Count-min sketch of corpus word frequencies
    (sketches.countmin_sketch): d=4 hash rows x w=512 columns as
    joinable (row, col, cnt) longs — one in-row explode + one
    map-side-combined groupBy bounded by d*w; snapshots' sketches
    merge by elementwise addition. The counting member of the
    mergeable-sketch family (Bloom: membership, HLL: distinct)."""
    from .operators.sketches import countmin_sketch

    words = load(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("word")
    )
    return countmin_sketch(words, "word", d=4, w=512)


def q98_countmin_estimates(spark, sf_dir):
    """Count-min point queries vs ground truth
    (sketches.countmin_lookup): estimate each probe word's frequency
    from the broadcast sketch (min over d cells) next to the true
    count — est >= true always (the one-sided guarantee heavy-
    hitter cutoffs rely on); probe set = the distinct words of
    docs 0-4."""
    from .operators.sketches import countmin_lookup, countmin_sketch

    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split("text", " ")).alias("word")
    )
    sketch = countmin_sketch(words, "word", d=4, w=512)
    probes = (
        docs.filter(F.col("doc_id") < 5)
        .select(F.explode(F.split("text", " ")).alias("word"))
        .distinct()
    )
    est = countmin_lookup(sketch, probes, "word", d=4, w=512)
    true_cnt = words.groupBy(
        F.col("word").alias("key")
    ).agg(F.count("*").cast("long").alias("true_cnt"))
    return est.join(true_cnt, "key")


def _countmin_cells_sql(d: int = 4, w: int = 512) -> str:
    rows = "\n    UNION ALL\n".join(
        f"    SELECT CAST({i} AS BIGINT) AS row,"
        f" CAST(('0x' || substr(md5('{i}:' || word), 1, 12))"
        f" AS BIGINT) % {w} AS col FROM words"
        for i in range(d)
    )
    return f"""words AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
cells AS (
  SELECT row, col, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
{rows}
  ) GROUP BY 1, 2
)"""


def _countmin_sketch_oracle() -> str:
    return f"""
WITH {_countmin_cells_sql()}
SELECT row, col, cnt FROM cells
"""


def _countmin_estimates_oracle(d: int = 4, w: int = 512) -> str:
    hashes = "\n    UNION ALL\n".join(
        f"    SELECT key, CAST({i} AS BIGINT) AS row,"
        f" CAST(('0x' || substr(md5('{i}:' || key), 1, 12))"
        f" AS BIGINT) % {w} AS col FROM probes"
        for i in range(d)
    )
    return f"""
WITH {_countmin_cells_sql()},
probes AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS key
  FROM documents WHERE doc_id < 5
),
hashed AS (
{hashes}
),
est AS (
  SELECT h.key, MIN(c.cnt) AS est
  FROM hashed h
  JOIN cells c ON c.row = h.row AND c.col = h.col
  GROUP BY 1
),
truec AS (
  SELECT word AS key, CAST(COUNT(*) AS BIGINT) AS true_cnt
  FROM words GROUP BY 1
)
SELECT e.key, e.est, t.true_cnt
FROM est e JOIN truec t USING (key)
"""


def q115_hilbert_key(spark, sf_dir):
    """Hilbert key over the shift-20 tile cells (geo/hilbert.py):
    the locality-improved sibling of the q99 Morton key — every
    curve step is between physically adjacent cells, so
    range-partitioning by this key packs spatial neighbors
    strictly tighter (locality measured vs Morton in tests).
    Pure staged integer arithmetic; the oracle unrolls the same
    12 per-level transforms as chained CTEs."""
    from .geo.hilbert import with_hilbert

    cells = doc_points(spark, sf_dir).select(
        "doc_id",
        F.shiftright(F.col("lon_i") + F.lit(1_800_000_000), 20)
        .alias("cu"),
        F.shiftright(F.col("lat_i") + F.lit(900_000_000), 20)
        .alias("cv"),
    )
    return with_hilbert(cells, "cu", "cv", order=12).select(
        "doc_id", "hd"
    )


def q99_zorder_key(spark, sf_dir):
    """Morton z key over the tile-cell bands (geo/zorder.py,
    operators/spatial.with_zorder): pure integer bit-spread in
    whole-stage codegen, no UDF. The storage-layout key the engine
    z-sorts tables by so bbox queries become O(output) row-group
    reads; the reference's band-major coco key (osmgeobase.c:2547)
    has no such locality across latitude bands."""
    from .operators.spatial import with_zorder

    pts = doc_points(spark, sf_dir)
    return with_zorder(pts).select("doc_id", "zkey")


def _q115_oracle() -> str:
    from .geo.hilbert import hilbert_sql

    stages = hilbert_sql("src", "cu", "cv", 12)
    return f"""
WITH {_PTS_CTE},
src AS (
  SELECT doc_id AS carry,
         ((lon_i + 1800000000) >> 20) AS cu,
         ((lat_i + 900000000) >> 20) AS cv
  FROM pts
),
{stages}
SELECT carry AS doc_id, hd FROM hfinal
"""


def _q99_oracle() -> str:
    from .geo.zorder import morton_sql

    z = morton_sql("latb", "lonb", "duckdb")
    return f"""
WITH {_PTS_CTE},
bands AS (
  SELECT doc_id,
         ((lat_i + 900000000) >> 14) AS latb,
         ((lon_i + 1800000000) >> 14) AS lonb
  FROM pts
)
SELECT doc_id, {z} AS zkey FROM bands
"""


# bbox for q100, inside the synthesized coord window
# (lat 470-510M, lon 100-140M fixed-point 1e-7 deg)
_Z_BBOX = (112_000_000, 481_000_000, 131_500_000, 502_000_000)


def q100_zorder_bbox(spark, sf_dir):
    """bbox filter routed through the Morton index
    (operators/spatial.zorder_bbox_filter): driver plans <= 64
    merged z ranges covering the box (O(max_ranges), never
    O(data)), the scan keeps only z-in-ranges rows, an exact coord
    refine closes the superset — output EQUALS the plain bbox
    filter (the oracle). On a z-sorted stored table the range
    disjunction reaches the parquet scan as PushedFilters →
    row-group pruning (test_zorder.py asserts it)."""
    from .operators.spatial import zorder_bbox_filter

    pts = doc_points(spark, sf_dir)
    return zorder_bbox_filter(pts, _Z_BBOX).select(
        "doc_id", "lat_i", "lon_i"
    )


def q116_hilbert_bbox(spark, sf_dir):
    """bbox filter through the Hilbert index
    (operators/spatial.hilbert_bbox_filter): <= 64 coarse curve
    prefixes planned on the driver, single-evaluation InSet probe
    on the computed hd, exact coord refine — output equals the
    plain bbox filter (the oracle), like q100 but with the curve
    whose covers merge into fewer ranges."""
    from .operators.spatial import hilbert_bbox_filter

    pts = doc_points(spark, sf_dir)
    return hilbert_bbox_filter(pts, _Z_BBOX).select(
        "doc_id", "lat_i", "lon_i"
    )


def _q100_oracle() -> str:
    x1, y1, x2, y2 = _Z_BBOX
    return f"""
WITH {_PTS_CTE}
SELECT doc_id, lat_i, lon_i FROM pts
WHERE lon_i BETWEEN {x1} AND {x2}
  AND lat_i BETWEEN {y1} AND {y2}
"""


def q101_heavy_hitters(spark, sf_dir):
    """Exact heavy bigrams via the sketch-then-verify plan
    (sketches.heavy_hitters): count-min pass bounded by d*w, hot
    cells become d map-side InSet gates (a key is heavy only if
    ALL its cells are hot — never-undercount makes the gate
    lossless), exact groupBy over survivors only. The oracle is
    the plain GROUP BY HAVING — the sketch is pure pruning, so
    the output is exact by construction."""
    from .operators.sketches import heavy_hitters
    from .operators.text import _with_word_grams

    docs = load(spark, sf_dir, "documents")
    grams = _with_word_grams(docs, "text", 2).select(
        F.explode("_grams").alias("g")
    )
    return heavy_hitters(grams, "g", threshold=40)


_Q101_ORACLE = """
WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
g AS (
  SELECT w[i] || chr(31) || w[i + 1] AS key
  FROM t, UNNEST(range(1, len(w))) AS r(i)
)
SELECT key, CAST(COUNT(*) AS BIGINT) AS cnt
FROM g GROUP BY 1 HAVING COUNT(*) >= 40
"""


def q102_ppl_buckets(spark, sf_dir):
    """CCNet-style perplexity bucketing: every document into
    head/middle/tail by per-language fluency tertile (lm.lm_score's
    integer-exact floor-log2 bigram score stands in for -log PPL;
    higher = more fluent = head). Exact ntile(3) over
    (fluency desc, doc_id) — deterministic, oracle-able. At 100 TB
    the same gate runs with percentile_approx cutoffs instead of a
    per-lang total sort (the q84 pattern); this exact-quantile
    twin IS the oracle for that path."""
    from .operators.lm import lm_score

    docs = load(spark, sf_dir, "documents")
    scored = lm_score(docs, F.col("lang") == "en").select(
        "doc_id", "fluency_milli"
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc("fluency_milli"), F.asc("doc_id")
    )
    return (
        docs.select("doc_id", "lang")
        .join(scored, "doc_id")
        .withColumn("t", F.ntile(3).over(w))
        .select(
            "doc_id",
            "lang",
            "fluency_milli",
            F.element_at(
                F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
                F.col("t"),
            ).alias("bucket"),
        )
    )


_Q102_ORACLE = """
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
),
g AS (
  SELECT doc_id, (lang = 'en') AS is_ref,
         w[i] || chr(31) || w[i + 1] AS g
  FROM t, UNNEST(range(1, len(w))) AS r(i)
),
pg AS (
  SELECT doc_id, is_ref, g, CAST(COUNT(*) AS BIGINT) AS n
  FROM g GROUP BY 1, 2, 3
),
m AS (
  SELECT g,
         CAST(length(printf('%b', CAST(SUM(n) AS BIGINT)))
              AS BIGINT) AS bits
  FROM pg WHERE is_ref GROUP BY 1
),
s AS (
  SELECT pg.doc_id,
         CAST(SUM(n) AS BIGINT) AS n_grams,
         CAST(SUM(n * COALESCE(m.bits, 0)) AS BIGINT) AS bits_sum
  FROM pg LEFT JOIN m ON pg.g = m.g GROUP BY 1
),
f AS (
  SELECT d.doc_id, d.lang,
         CAST(CASE WHEN COALESCE(n_grams, 0) > 0
              THEN (1000 * bits_sum) // n_grams
              ELSE 0 END AS BIGINT) AS fluency_milli
  FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
)
SELECT doc_id, lang, fluency_milli,
       (['head', 'middle', 'tail'])[
         ntile(3) OVER (PARTITION BY lang
                        ORDER BY fluency_milli DESC, doc_id)
       ] AS bucket
FROM f
"""


def q103_cover_assign(spark, sf_dir):
    """q03's N-polygon assignment routed through the decided-cell
    cover (geo/cover.py + operators/spatial.assign_regions_cover) —
    the S2-style two-stage spatial join. A driver-built broadcast
    grid classifies every cell as boundary vs decided; decided
    cells carry a precomputed constant assignment (two shifts + an
    array load per point), and only the ~perimeter/area boundary
    fraction runs the exact ray-cast kernel. Output is EXACTLY
    q03 — same oracle; the cover is pure work elision, never an
    approximation (boundary marking is a proven superset, see the
    module docstring)."""
    from .operators.spatial import assign_regions_cover

    pts = doc_points(spark, sf_dir)
    out = assign_regions_cover(pts, fixture_polyset())
    return out.select("doc_id", "region", "subregion")


def q104_city_knn(spark, sf_dir):
    """Reverse kNN (operators/knn.city_knn_cells): per city, the 3
    nearest DOCUMENTS — top-k over the 100-TB side, so the plan is
    the certified cell-prefix join: 3x3-neighborhood broadcast join
    + per-city window, a geometric certificate (kth dist <= cell
    side) finalizes cities in-plan, and only uncertified deserts
    take the brute-force pass restricted to themselves. Exact —
    the oracle is the plain cross-join row_number."""
    from .fixtures import gazetteer_arrays
    from .operators.knn import city_knn_cells

    terms, lat_i, lon_i, _ = gazetteer_arrays()
    pts = doc_points(spark, sf_dir)
    out = city_knn_cells(pts, terms, lat_i, lon_i, k=3)
    return out.select(
        "neighbor",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        "dist2",
    )


def q105_quantile_sketch(spark, sf_dir):
    """Binned-histogram quantile sketch
    (operators/sketches.binned_quantiles): p50/p90/p99 of tokens-
    per-document with sketch state capped at range/2^4 bins
    regardless of distinct-value count — the bounded-state,
    snapshot-mergeable twin of q84's exact percentiles, with a
    deterministic [lo, hi] certificate per answer. One corpus
    pass; everything after the bin groupBy runs over the tiny bin
    table."""
    from .operators.sketches import binned_quantiles

    docs = load(spark, sf_dir, "documents").select(
        F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    return binned_quantiles(docs, "n_tokens", bin_shift=4)


def _pq_ctes(m: int = 8, k: int = 16, dim: int = 64) -> str:
    """Shared CTE chain replaying the PQ encode: quantize ->
    subvector rows -> first-k codebook -> exact integer argmin.
    Integer folds exactly as in _kmeans_ctes."""
    sub = dim // m
    return f"""e AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000)
                AS BIGINT)) AS q
  FROM embeddings
),
subs AS (
  SELECT vec_id, CAST(s.s AS BIGINT) AS s,
         q[CAST(s.s * {sub} + 1 AS BIGINT):
           CAST(s.s * {sub} + {sub} AS BIGINT)] AS sv
  FROM e CROSS JOIN LATERAL (
    SELECT unnest(range(0, {m})) AS s
  ) s
),
cb AS (
  SELECT s, vec_id AS e, sv AS cv FROM subs WHERE vec_id < {k}
),
scored AS (
  SELECT v.vec_id, v.s, c.e,
    list_sum(list_transform(range(1, {sub} + 1),
      i -> (v.sv[i] - c.cv[i]) * (v.sv[i] - c.cv[i]))) AS d2
  FROM subs v JOIN cb c ON c.s = v.s
),
codes AS (
  SELECT vec_id, s, e AS code
  FROM (SELECT *, row_number() OVER (
          PARTITION BY vec_id, s ORDER BY d2, e) AS rk
        FROM scored)
  WHERE rk = 1
)"""


def _pq_codes_oracle() -> str:
    return f"""
WITH {_pq_ctes()}
SELECT vec_id, CAST(s AS BIGINT) AS s, code FROM codes
"""


def _pq_adc_oracle(topk: int = 3) -> str:
    return f"""
WITH {_pq_ctes()},
lut AS (
  SELECT vec_id AS qid, s, e, d2 FROM scored
  WHERE vec_id % 50 = 0
),
adc AS (
  SELECT l.qid, co.vec_id, CAST(SUM(l.d2) AS BIGINT) AS adist2
  FROM codes co
  JOIN lut l ON l.s = co.s AND l.e = co.code
  WHERE l.qid <> co.vec_id
  GROUP BY 1, 2
)
SELECT qid, vec_id, adist2, CAST(rk AS BIGINT) AS rk
FROM (SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY adist2, vec_id) AS rk
      FROM adc)
WHERE rk <= {topk}
"""


def _hll_pages(spark, sf_dir):
    """Synthetic (domain, url) crawl rows: 23 domains, urls
    repeat across ~3 docs (doc_id div 3) so distinct-per-domain
    differs from row counts."""
    d = F.col("doc_id")
    return load(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("host"),
            (d % 23).cast("string"),
            F.lit(".example.com"),
        ).alias("grp"),
        F.concat(
            F.lit("https://host"),
            (d % 23).cast("string"),
            F.lit(".example.com/p/"),
            F.expr("doc_id div 3").cast("string"),
        ).alias("url"),
    )


def q91_hll_registers(spark, sf_dir):
    """Distinct-URLs-per-domain HLL sketch as joinable register
    rows (sketches.hll_registers): 64 integer registers per
    domain via one map-side-combined groupBy max — the mergeable,
    persistable alternative to an exact count_distinct shuffle at
    100 TB (snapshots' sketches union with hll_merge)."""
    from .operators.sketches import hll_registers

    return hll_registers(
        _hll_pages(spark, sf_dir), "grp", "url", p=6
    )


def q92_hll_summary(spark, sf_dir):
    """Per-domain HLL summary over the q91 register table
    (sketches.hll_summary): exact integer zeros / Z-numerator and
    the raw estimate via IEEE-pinned double multiply/divide only
    (no ln — the linear-counting branch is the caller's, fed by
    `zeros`)."""
    from .operators.sketches import hll_registers, hll_summary

    return hll_summary(
        hll_registers(_hll_pages(spark, sf_dir), "grp", "url", p=6),
        p=6,
    )


_HLL_CTES = """pages AS (
  SELECT 'host' || CAST(doc_id % 23 AS VARCHAR)
           || '.example.com' AS grp,
         'https://host' || CAST(doc_id % 23 AS VARCHAR)
           || '.example.com/p/'
           || CAST(doc_id // 3 AS VARCHAR) AS url
  FROM documents
),
hashed AS (
  SELECT grp,
    CAST(('0x' || substr(md5(url), 1, 12)) AS BIGINT) AS h
  FROM pages
),
rr AS (SELECT grp, h % 64 AS reg, h // 64 AS w FROM hashed),
regs AS (
  SELECT grp, reg,
    CAST(MAX(CASE WHEN w = 0 THEN 43
             ELSE 43 - length(printf('%b', w)) END)
         AS BIGINT) AS rho
  FROM rr GROUP BY 1, 2
)"""


_KMV_CTES = """pages AS (
  SELECT doc_id,
         'host' || CAST(doc_id % 23 AS VARCHAR)
           || '.example.com' AS grp,
         'https://host' || CAST(doc_id % 23 AS VARCHAR)
           || '.example.com/p/'
           || CAST(doc_id // 3 AS VARCHAR) AS url
  FROM documents
)"""


def _kmv_registers_oracle() -> str:
    return f"""
WITH {_KMV_CTES},
dh AS (
  SELECT DISTINCT grp,
    CAST(('0x' || substr(md5(url), 1, 12)) AS BIGINT) AS h
  FROM pages
),
rk AS (
  SELECT grp, h,
    CAST(ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h)
         AS BIGINT) AS rank
  FROM dh
)
SELECT grp, rank, h FROM rk WHERE rank <= 32
"""


def _kmv_intersect_oracle() -> str:
    # same double order of operations as sketches.kmv_intersect
    return f"""
WITH {_KMV_CTES},
da AS (
  SELECT DISTINCT grp,
    CAST(('0x' || substr(md5(url), 1, 12)) AS BIGINT) AS h
  FROM pages WHERE doc_id % 3 <> 2
),
db AS (
  SELECT DISTINCT grp,
    CAST(('0x' || substr(md5(url), 1, 12)) AS BIGINT) AS h
  FROM pages WHERE doc_id % 3 <> 0
),
ska AS (
  SELECT grp, h FROM (
    SELECT grp, h,
      ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS r
    FROM da) WHERE r <= 32
),
skb AS (
  SELECT grp, h FROM (
    SELECT grp, h,
      ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS r
    FROM db) WHERE r <= 32
),
u AS (
  SELECT grp, h FROM (
    SELECT grp, h,
      ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS r
    FROM (SELECT grp, h FROM ska UNION SELECT grp, h FROM skb))
  WHERE r <= 32
),
flags AS (
  SELECT u.grp, u.h,
    CASE WHEN EXISTS (SELECT 1 FROM ska a
                      WHERE a.grp = u.grp AND a.h = u.h)
          AND EXISTS (SELECT 1 FROM skb b
                      WHERE b.grp = u.grp AND b.h = u.h)
         THEN 1 ELSE 0 END AS b
  FROM u
),
agg AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS u_eff,
         MAX(h) AS h_k, CAST(SUM(b) AS BIGINT) AS c
  FROM flags GROUP BY 1
)
SELECT grp, u_eff, h_k, c,
  CAST(c AS DOUBLE) / CAST(u_eff AS DOUBLE) AS jacc,
  (CAST(c AS DOUBLE) / CAST(u_eff AS DOUBLE))
    * (CASE WHEN u_eff < 32 THEN CAST(u_eff AS DOUBLE)
       ELSE CAST(u_eff - 1 AS DOUBLE) * 281474976710656.0
            / CAST(h_k AS DOUBLE) END) AS inter_est
FROM agg
"""


def _ranked_search_oracle() -> str:
    vals = ", ".join(
        f"({i}, '{t}')" for i, t in enumerate(_Q113_QUERIES)
    )
    return f"""
WITH q(query_id, qtext) AS (VALUES {vals}),
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY 1, 2
),
dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df
  FROM tf GROUP BY 1
),
qt AS (
  SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) AS term
  FROM q
),
scored AS (
  SELECT qt.query_id, tf.doc_id,
         CAST(SUM(tf.tf * ((SELECT COUNT(*) FROM documents) // d.df))
              AS BIGINT) AS score
  FROM tf JOIN qt USING (term) JOIN dfreq d USING (term)
  GROUP BY 1, 2
),
rk AS (
  SELECT query_id, doc_id, score,
    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      ORDER BY score DESC, doc_id) AS BIGINT) AS rank
  FROM scored
)
SELECT CAST(query_id AS BIGINT) AS query_id, rank, doc_id, score
FROM rk WHERE rank <= 5
"""


def _hll_registers_oracle() -> str:
    return f"""
WITH {_HLL_CTES}
SELECT grp, reg, rho FROM regs
"""


def _hll_summary_oracle() -> str:
    m = 64
    alpha_m2 = (0.7213 / (1.0 + 1.079 / m)) * m * m
    pow2r = float(1 << 43)
    return f"""
WITH {_HLL_CTES},
agg AS (
  SELECT grp, COUNT(*) AS n,
    CAST(SUM(CAST(1 AS BIGINT) << CAST(43 - rho AS INTEGER))
         AS BIGINT) AS z_present
  FROM regs GROUP BY 1
)
SELECT grp,
  CAST({m} - n AS BIGINT) AS zeros,
  CAST(z_present + ({m} - n) * (CAST(1 AS BIGINT) << 43)
       AS BIGINT) AS z_num,
  CAST({alpha_m2!r} AS DOUBLE) * CAST({pow2r!r} AS DOUBLE)
    / CAST(z_present + ({m} - n) * (CAST(1 AS BIGINT) << 43)
           AS DOUBLE) AS raw_est
FROM agg
"""


def q110_kmv_registers(spark, sf_dir):
    """KMV/theta sketch of distinct URLs per domain
    (sketches.kmv_sketch): the k=32 smallest distinct md5-48
    hashes as exact integer rows — the set-operations member of
    the sketch family (q91 HLL counts, q97 count-min counts
    frequency, KMV also intersects). Salted two-stage top-k, no
    SinglePartition window."""
    from .operators.sketches import kmv_sketch

    return kmv_sketch(_hll_pages(spark, sf_dir), "grp", "url", k=32)


def q111_kmv_intersect(spark, sf_dir):
    """Theta-sketch set operations: two overlapping crawl
    snapshots (doc_id % 3 != 2 vs != 0) sketched independently,
    then sketches.kmv_intersect estimates per-domain overlap —
    exact integer sample counts (u_eff, h_k, c) plus jacc and
    inter_est from IEEE-pinned multiply/divide only."""
    from .operators.sketches import kmv_intersect, kmv_sketch

    d = F.col("doc_id")
    pages = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("host"), (d % 23).cast("string"),
            F.lit(".example.com"),
        ).alias("grp"),
        F.concat(
            F.lit("https://host"), (d % 23).cast("string"),
            F.lit(".example.com/p/"),
            F.expr("doc_id div 3").cast("string"),
        ).alias("url"),
    )
    a = kmv_sketch(
        pages.where(d % 3 != 2), "grp", "url", k=32
    )
    b = kmv_sketch(
        pages.where(d % 3 != 0), "grp", "url", k=32
    )
    return kmv_intersect(a, b, k=32)


def q113_ranked_search(spark, sf_dir):
    """Disjunctive ranked retrieval (search.ranked_search): top-5
    docs per query by integer tf-idf (idf = N div df, no floats),
    query terms broadcast into the term-frequency table — the
    corpus is scanned once, not per query."""
    from .operators.search import ranked_search

    qs = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("long").alias("query_id"),
                        F.lit(t).alias("qtext"),
                    )
                    for i, t in enumerate(_Q113_QUERIES)
                ]
            )
        ).alias("q")
    ).select("q.query_id", "q.qtext")
    return ranked_search(
        load(spark, sf_dir, "documents"), qs, k=5
    )


_Q113_QUERIES = [
    "hash join",
    "slow scan merge",
    "spark window sort",
    "customer table filter",
    "batch column order nation",
]


def q85_inverted_index(spark, sf_dir):
    """Corpus inverted index (operators/search.inverted_index):
    salted two-stage holistic posting-list build (hot terms spread
    over 16 salt reducers — the tile_doc_lists megacity pattern),
    df-banded to drop hapaxes and the stopword class. Postings
    canonicalized as a joined string for the oracle compare."""
    from .operators.search import inverted_index

    idx = inverted_index(
        load(spark, sf_dir, "documents"), min_df=2, max_df=400
    )
    return idx.select(
        "term",
        "doc_freq",
        F.array_join(
            F.transform("postings", lambda d: d.cast("string")),
            ",",
        ).alias("postings_str"),
    )


def q86_distinctive_terms(spark, sf_dir):
    """Per-document top-3 distinctive terms
    (operators/search.distinctive_terms): integer TF-IDF — rank by
    (tf desc, doc_freq asc, term asc), no float log so the ranking
    is engine-exact. One tf shuffle, one term-keyed df join (AQE
    skew), one per-doc window."""
    from .operators.search import distinctive_terms

    return distinctive_terms(load(spark, sf_dir, "documents"), k=3)


def _kmeans_ctes(
    k: int = 8,
    n_iter: int = 2,
    dim: int = 64,
    final_assign: bool = True,
) -> tuple[list[str], str]:
    """Shared CTE chain for the unrolled-iteration k-means oracles:
    quantize -> (assign -> update) x n_iter [-> final assign].
    Returns (parts, last_cte_name) — a{n_iter+1} when final_assign,
    else the trained centroid table c{n_iter}. Truncating `//` ==
    Spark `div`; `range(1, dim+1)` lambdas give exact integer
    dist2."""
    d2 = (
        f"list_sum(list_transform(range(1, {dim + 1}),"
        " i -> (q[i]-cv[i])*(q[i]-cv[i])))"
    )
    parts = [
        f"""e AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000)
                AS BIGINT)) AS q
  FROM embeddings
),
c0 AS (SELECT vec_id AS cid, q AS cv FROM e WHERE vec_id < {k})"""
    ]
    last_it = n_iter + 1 if final_assign else n_iter
    for it in range(1, last_it + 1):
        parts.append(
            f"""d{it} AS (
  SELECT e.vec_id, e.q, c.cid, {d2} AS d2
  FROM e CROSS JOIN c{it - 1} c
),
a{it} AS (
  SELECT vec_id, q, cid AS cluster, d2
  FROM (SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY d2, cid) AS rk FROM d{it})
  WHERE rk = 1
)"""
        )
        if it <= n_iter:
            parts.append(
                f"""u{it} AS (
  SELECT cluster, i, CAST(SUM(q[i]) AS BIGINT) AS s, COUNT(*) AS n
  FROM a{it}, UNNEST(range(1, {dim + 1})) AS r(i)
  GROUP BY 1, 2
),
c{it} AS (
  SELECT cluster AS cid,
         list(CAST(s // n AS BIGINT) ORDER BY i) AS cv
  FROM u{it} GROUP BY 1
)"""
            )
    return parts, (
        f"a{last_it}" if final_assign else f"c{n_iter}"
    )


def _kmeans_oracle(k: int = 8, n_iter: int = 2, dim: int = 64) -> str:
    parts, last = _kmeans_ctes(k, n_iter, dim, final_assign=True)
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
       CAST(d2 AS BIGINT) AS dist2
FROM {last}"""
    )


def _ivf_trained_oracle(
    k: int = 8,
    n_iter: int = 2,
    dim: int = 64,
    n_probe: int = 2,
    topk: int = 3,
) -> str:
    """IVF probe (the q47 plan) over kmeans-TRAINED centroids:
    the _kmeans_ctes chain yields the fixed-point centroid table,
    de-quantized to doubles; cosines then follow the exact q47
    operation order so doubles agree bit-for-bit."""
    parts, cent = _kmeans_ctes(k, n_iter, dim, final_assign=False)
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
cf AS (
  SELECT cid,
         list_transform(cv,
           x -> CAST(x AS DOUBLE) / 1000000.0) AS cv
  FROM {cent}
),
cents AS (
  SELECT cid, cv, list_dot_product(cv, cv) AS cn2 FROM cf
),
e2 AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
nn AS (
  SELECT vec_id, v, list_dot_product(v, v) AS n2 FROM e2
),
scored AS (
  SELECT nn.vec_id, c.cid,
    list_dot_product(nn.v, c.cv) / sqrt(nn.n2) / sqrt(c.cn2) AS cc
  FROM nn CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, cid AS cluster FROM (
    SELECT vec_id, cid,
      ROW_NUMBER() OVER (PARTITION BY vec_id
                         ORDER BY cc DESC, cid ASC) AS r
    FROM scored
  ) WHERE r = 1
),
qq AS (
  SELECT vec_id AS query_id, v AS qv, n2 AS qn2 FROM nn
  WHERE vec_id % 50 = 0
),
qs AS (
  SELECT qq.query_id, qq.qv, qq.qn2, c.cid,
    list_dot_product(qq.qv, c.cv) / sqrt(qq.qn2) / sqrt(c.cn2)
      AS cc
  FROM qq CROSS JOIN cents c
),
probes AS (
  SELECT query_id, qv, qn2, cid AS cluster FROM (
    SELECT *,
      ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY cc DESC, cid ASC) AS r
    FROM qs
  ) WHERE r <= {n_probe}
),
cand AS (
  SELECT p.query_id, p.qv, p.qn2, nn.vec_id, nn.v, nn.n2
  FROM probes p
  JOIN assign a ON a.cluster = p.cluster
  JOIN nn ON nn.vec_id = a.vec_id
  WHERE nn.vec_id <> p.query_id
),
sc AS (
  SELECT query_id, vec_id AS neighbor_id,
    list_dot_product(qv, v) / sqrt(qn2) / sqrt(n2) AS c
  FROM cand
),
rk AS (
  SELECT query_id, neighbor_id, c,
    ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY c DESC, neighbor_id ASC) AS rank
  FROM sc
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       round(c, 6) AS cos_r
FROM rk WHERE rank <= {topk}"""
    )


def q13_lang_id(spark, sf_dir):
    return lang_id(load(spark, sf_dir, "documents"))


def q14_fingerprint(spark, sf_dir):
    return fingerprint(load(spark, sf_dir, "documents"))


def q15_dedup_exact(spark, sf_dir):
    return dedup_exact(
        load(spark, sf_dir, "documents"), prefix=40
    )


def q16_radius_pairs(spark, sf_dir):
    """J8: all point pairs within a fixed radius via cell join.
    Subset (doc_id % 5 == 0) keeps the oracle cross join tractable."""
    pts = doc_points(spark, sf_dir).filter(F.col("doc_id") % 5 == 0)
    return radius_pairs(pts, radius_fix=2_000_000)


def q17_ngram_jaccard(spark, sf_dir):
    """near-dup: exact 3-gram Jaccard >= 0.5 computed ONLY on
    MinHash-LSH candidate pairs — the 100-TB plan (round-2 fix):
    the corpus never gram-self-joins; candidates come from the
    banded signature join and exact Jaccard runs in-row on the
    joined gram arrays. text.ngram_jaccard_pairs remains the
    all-pairs small-scale twin (tests/test_dedup_ann.py proves the
    composed result ⊆ all-pairs and recalls every planted dup).
    Corpus: mod-11 sample plus planted near-duplicates."""
    from .operators.dedup import (
        jaccard_on_candidates,
        minhash_lsh_pairs,
    )

    docs = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 11 == 0
    ).select("doc_id", "text")
    dups = docs.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.lit("dup "), F.col("text")).alias("text"),
    )
    corpus = docs.unionByName(dups)
    cand = minhash_lsh_pairs(corpus, n_hashes=12, band_rows=2)
    return jaccard_on_candidates(
        corpus, cand, threshold=0.5
    ).select("a", "b", "inter", "jaccard")


def _containment_oracle() -> str:
    """q174: planted snippets + rare-gram blocking + exact
    containment, the gram CTE identical to _q17_oracle's."""
    return """
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 11 = 0
  UNION ALL
  SELECT doc_id + 2000000, substr(text, 21)
  FROM documents WHERE doc_id % 33 = 0
),
docs AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM corpus
),
grams AS (
  SELECT DISTINCT doc_id,
    array_to_string(toks[CAST(i.i AS BIGINT):CAST(i.i + 2 AS BIGINT)],
                    ' ') AS gram
  FROM docs
  CROSS JOIN LATERAL (
    SELECT unnest(range(1, greatest(len(toks) - 2, 1) + 1)) AS i
  ) i
),
rare AS (
  SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) <= 5
),
rp AS (SELECT g.doc_id, g.gram FROM grams g JOIN rare r USING (gram)),
cand AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM rp x JOIN rp y
    ON x.gram = y.gram AND x.doc_id < y.doc_id
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY 1),
inter AS (
  SELECT c.a, c.b, CAST(COUNT(*) AS BIGINT) AS inter
  FROM cand c
  JOIN grams g1 ON g1.doc_id = c.a
  JOIN grams g2 ON g2.doc_id = c.b AND g2.gram = g1.gram
  GROUP BY 1, 2
)
SELECT i.a, i.b, i.inter,
  i.inter / LEAST(sa.sz, sb.sz) AS containment
FROM inter i
JOIN sizes sa ON sa.doc_id = i.a
JOIN sizes sb ON sb.doc_id = i.b
WHERE i.inter / LEAST(sa.sz, sb.sz) >= 0.8
"""


def _q17_oracle() -> str:
    """Oracle for the composed q17 plan: MinHash-LSH candidates
    (identical salted-md5 signature arithmetic to q29) followed by
    exact Jaccard restricted to those candidates."""
    n_hashes, band_rows = 12, 2
    sig_aggs = ",\n    ".join(
        f"MIN(md5('{i}:' || gram)) AS s{i}" for i in range(n_hashes)
    )
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band_idx, "
        f"s{band_rows * b} || '|' || s{band_rows * b + 1} "
        "AS band_val FROM sigs"
        for b in range(n_hashes // band_rows)
    )
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 11 = 0
  UNION ALL
  SELECT doc_id + 1000000, 'dup ' || text
  FROM documents WHERE doc_id % 11 = 0
),
docs AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM corpus
),
grams AS (
  SELECT DISTINCT doc_id,
    array_to_string(toks[CAST(i.i AS BIGINT):CAST(i.i + 2 AS BIGINT)],
                    ' ') AS gram
  FROM docs
  CROSS JOIN LATERAL (
    SELECT unnest(range(1, greatest(len(toks) - 2, 1) + 1)) AS i
  ) i
),
sigs AS (
  SELECT doc_id,
    {sig_aggs}
  FROM grams GROUP BY doc_id
),
bands AS (
{band_selects}
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y
    ON x.band_idx = y.band_idx AND x.band_val = y.band_val
   AND x.doc_id < y.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY 1),
inter AS (
  SELECT c.a, c.b, COUNT(*) AS inter
  FROM cand c
  JOIN grams g1 ON g1.doc_id = c.a
  JOIN grams g2 ON g2.doc_id = c.b AND g2.gram = g1.gram
  GROUP BY 1, 2
)
SELECT i.a, i.b, i.inter,
  i.inter * 1.0 / (sa.sz + sb.sz - i.inter) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.a
JOIN sizes sb ON sb.doc_id = i.b
WHERE i.inter * 1.0 / (sa.sz + sb.sz - i.inter) >= 0.5
"""


_KEEP_EXPR = "place=city or ( place=town and population>=10000 )"
_KEEP_EXPR2 = "( name=*7 or name=Name1* ) and place!=city"


def q18_keep_filter(spark, sf_dir):
    """P3: osmfilter --keep boolean tag predicate (numeric >=,
    brackets, and/or precedence) compiled to pure Catalyst."""
    from .filterlang import keep_column, parse

    tg = doc_tags(spark, sf_dir)
    return tg.filter(keep_column(F.col("tags"), parse(_KEEP_EXPR))).select(
        "doc_id"
    )


def q19_keep_wildcards(spark, sf_dir):
    """P3: wildcards + '!=' matches-absent-key rule."""
    from .filterlang import keep_column, parse

    tg = doc_tags(spark, sf_dir)
    return tg.filter(
        keep_column(F.col("tags"), parse(_KEEP_EXPR2))
    ).select("doc_id")


def q20_keep_tags(spark, sf_dir):
    """P5: --keep-tags projection ('all place population'): unlisted
    tags dropped; output canonicalized as sorted k=v string."""
    from .filterlang import tags_filter_column

    tg = doc_tags(spark, sf_dir)
    kept = tags_filter_column(F.col("tags"), keep="all place= population=")
    return tg.select(
        "doc_id",
        F.array_join(
            F.array_sort(
                F.transform(
                    F.map_entries(kept),
                    lambda e: F.concat(e.key, F.lit("="), e.value),
                )
            ),
            ";",
        ).alias("tags_str"),
    )


def q21_tag_key_freq(spark, sf_dir):
    """P9/A2: --out-key tag-key frequency."""
    tg = doc_tags(spark, sf_dir)
    return (
        tg.select(F.explode(F.map_keys("tags")).alias("key"))
        .groupBy("key")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def q22_csv_projection(spark, sf_dir):
    """K4: CSV sink projection — pseudo-cols @id @lon @lat plus tag
    columns pulled out of the map (csv_ osmconvert.c:3165-3351)."""
    tg = doc_tags(spark, sf_dir)
    pts = doc_points(spark, sf_dir)
    return tg.join(pts, "doc_id").select(
        F.col("doc_id").alias("id"),
        F.col("lon_i").alias("lon"),
        F.col("lat_i").alias("lat"),
        F.try_element_at(F.col("tags"), F.lit("place")).alias("place"),
        F.try_element_at(F.col("tags"), F.lit("name")).alias("name"),
    )


from .suite_addr import ADDR_QUERIES, addr_oracle_sqls  # noqa: E402
from .suite_bbox import bbox_oracle_sql, q28_bbox_tags  # noqa: E402
from .suite_ml import ML_QUERIES, ml_oracle_sqls  # noqa: E402
from .filterlang.modify import (  # noqa: E402
    modify_sql_tags_str,
    modify_tags_str,
    parse_modify,
)
from .operators.merge import change_apply  # noqa: E402
from .suite_graph import (  # noqa: E402
    _GRAPH_CTES,
    GRAPH_QUERIES,
    graph_oracle_sqls,
)

_MODIFY_ARG = (
    "place=city to =metropolis population>100000 add big=yes "
    "name=Name1* to label="
)


def q33_modify_tags(spark, sf_dir):
    """P6 --modify-tags: value rewrite, numeric-matched add, and
    wildcard-matched key rename — first matching rule wins per tag;
    output canonicalized as a sorted k=v string."""
    tg = doc_tags(spark, sf_dir)
    rules = parse_modify(_MODIFY_ARG)
    return tg.select(
        "doc_id", modify_tags_str(F.col("tags"), rules).alias("tags_str")
    )


def q34_change_apply(spark, sf_dir):
    """C1/J7: change-file apply (upsert + tombstone delete), the
    MERGE INTO pattern. Changes: mod-9 docs rewritten, mod-13 docs
    deleted, 50 new ids appended."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    changes = (
        docs.filter((F.col("doc_id") % 9 == 0) | (F.col("doc_id") % 13 == 0))
        .select(
            "doc_id",
            F.concat(F.lit("upd "), F.col("text")).alias("text"),
            (F.col("doc_id") % 13 == 0).alias("deleted"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") < 50).select(
                (F.col("doc_id") + 2000000).alias("doc_id"),
                F.concat(F.lit("new "), F.col("text")).alias("text"),
                F.lit(False).alias("deleted"),
            )
        )
    )
    return change_apply(docs, changes, ["doc_id"])


def q35_media_metadata(spark, sf_dir):
    """Multimodal plumbing: binary payload synthesis (mapInPandas)
    -> Arrow-batched header decode -> typed metadata. The oracle
    recomputes the metadata from doc_id directly, validating the
    whole binary round-trip."""
    from .operators.multimodal import decode_metadata, synth_media

    n = load(spark, sf_dir, "documents").count()
    media = synth_media(spark, n)
    return decode_metadata(media).select(
        "doc_id",
        "kind",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("sample_rate").cast("long").alias("sample_rate"),
        F.col("n_samples").cast("long").alias("n_samples"),
        "n_bytes",
    )


def q164_image_ahash(spark, sf_dir):
    """Perceptual average-hash over the binary image payloads
    (operators/multimodal.image_ahash): decode -> 8x8 luma sample
    -> mean threshold -> 64 bits packed as two sign-safe longs.
    The oracle recomputes every bit from doc_id arithmetic without
    seeing a payload, validating the full decode->hash path."""
    from .operators.multimodal import image_ahash, synth_media

    n = load(spark, sf_dir, "documents").count()
    return image_ahash(synth_media(spark, n))


def q165_image_neardup(spark, sf_dir):
    """Image near-duplicate pairs: q164's aHashes -> four 16-bit
    LSH bands as the candidate generator (bucket join, never
    all-pairs) -> exact Hamming verify via bit_count
    (operators/multimodal.ahash_neardup_pairs). The multimodal
    twin of the text SimHash near-dup path."""
    from .operators.multimodal import (
        ahash_neardup_pairs,
        image_ahash,
        synth_media,
    )

    n = load(spark, sf_dir, "documents").count()
    return ahash_neardup_pairs(
        image_ahash(synth_media(spark, n)), max_hamming=6
    )


def q167_bmp_decode(spark, sf_dir):
    """REAL image decode: synthesize genuine uncompressed 24-bit
    BMP files (bottom-up rows, 4-byte-padded strides — any standard
    viewer opens them), decode them with the pure-numpy BMP decoder
    (operators/multimodal.decode_bmp: honors data offset, stride
    padding, and both row orders), and emit exact per-channel pixel
    sums. The pixel values are a pure function of (doc_id, x, y),
    so the oracle recomputes every sum arithmetically without
    touching a payload — a full-fidelity check of the decode path
    itself, not just header plumbing."""
    from .operators.multimodal import bmp_channel_stats, synth_bmp

    n = load(spark, sf_dir, "documents").count()
    return bmp_channel_stats(synth_bmp(spark, n))


def q169_bmp_ahash(spark, sf_dir):
    """REAL perceptual hash: q167's genuine BMP files decoded to
    pixels, then the full aHash pipeline over the DECODED content
    (integer luma -> 8x8 block-average pooling -> global mean
    threshold -> 64 packed bits; operators/multimodal.bmp_ahash) —
    contrast q164, which hashes the FIMG header fake. Every step
    is integer arithmetic, so the oracle rebuilds the identical
    hash from the pixel planting formula without decoding
    anything."""
    from .operators.multimodal import bmp_ahash, synth_bmp

    n = load(spark, sf_dir, "documents").count()
    return bmp_ahash(synth_bmp(spark, n))


def q168_wav_decode(spark, sf_dir):
    """REAL audio decode: genuine RIFF/WAVE mono 16-bit PCM files
    (with a LIST chunk planted between fmt and data so the decoder
    must walk chunks, not assume layout), decoded by the pure-numpy
    chunk walker (operators/multimodal.decode_wav) into exact
    integer signal statistics (peak, L1, L2). The audio twin of
    q167."""
    from .operators.multimodal import synth_wav, wav_pcm_stats

    n = load(spark, sf_dir, "documents").count()
    return wav_pcm_stats(synth_wav(spark, n))


def q235_jpeg_decode(spark, sf_dir):
    """REAL lossy-image decode: genuine baseline JFIF grayscale
    files (vendored pure-numpy T.81 codec, operators/jpeg.py —
    spec-conformant Huffman entropy coding, any standard viewer
    opens them) decoded through the FULL inverse pipeline (segment
    walk, canonical Huffman rebuild, DC-predictive + RLE/EOB/ZRL
    entropy decode, dezigzag, dequantize, float IDCT) into exact
    integer pixel statistics. Every 8x8 block is constant, so the
    lossy round trip has the integer closed form
    min(l + l % 2, 255) per block (derived in jpeg.py) and the
    oracle recomputes every statistic arithmetically without
    touching a payload — full-fidelity coverage of a real
    entropy-coded decode path, completing the BMP/WAV family
    (q167/q168)."""
    from .operators.multimodal import jpeg_gray_stats, synth_jpeg

    n = load(spark, sf_dir, "documents").count()
    return jpeg_gray_stats(synth_jpeg(spark, n))


def q170_edit_neardup(spark, sf_dir):
    """Character-level near-duplicate pairs: 40-char text prefixes
    within Levenshtein distance 1, candidates from the EXACT
    SymSpell deletion-neighborhood blocking (operators/editsim —
    each title explodes to <= 41 deletion keys, one hash shuffle,
    builtin `levenshtein` verify; never an all-pairs join). The
    oracle IS the all-pairs definition (quadratic cross join on
    DuckDB's levenshtein), deliberately independent of the
    blocking, so the hash match also proves candidate recall."""
    from .operators.editsim import edit_neardup_pairs

    return edit_neardup_pairs(load(spark, sf_dir, "documents"))


def q171_cusum_alarms(spark, sf_dir):
    """Change-point detection: one-sided CUSUM mean-shift statistic
    over q158's gap-filled daily series, computed exactly via the
    prefix identity S_t = P_t - min(0, running_min(P)) — the reset
    recurrence becomes two windows over ONE event_type shuffle
    (operators/events.cusum_mean_shift). Integer-exact: everything
    is scaled by the series length so the mean never becomes a
    float. The oracle replays the same identity in SQL windows —
    and a unit test checks the identity against the literal
    sequential recurrence."""
    from .operators.events import cusum_mean_shift

    return cusum_mean_shift(q158_dense_daily(spark, sf_dir))


def q172_lpa_communities(spark, sf_dir):
    """Community detection: 4 deterministic synchronous rounds of
    label propagation (operators/linkgraph.lpa_communities —
    neighbor-majority label, ties to the smallest, min-id init)
    over a planted 4-block graph: every doc wires its node
    (doc%120) inside its 30-node block via a Knuth-hash neighbor,
    and every 17th doc adds a cross-block bridge — so the graph is
    CONNECTED (one component; any reachability resolver returns a
    single cluster) yet LPA must still recover the dense blocks.
    The oracle unrolls all 4 rounds as windowed-argmax CTEs."""
    from .operators.linkgraph import lpa_communities

    d = F.col("doc_id")
    u = F.pmod(d, F.lit(120))
    h = F.pmod(d * F.lit(2654435761), F.lit(4294967296))
    intra = u - F.pmod(u, F.lit(30)) + F.pmod(h, F.lit(30))
    inter = F.pmod(u + F.lit(30), F.lit(120))
    edges = (
        load(spark, sf_dir, "documents")
        .select(
            u.cast("long").alias("src"),
            F.when(d % 17 == 0, inter)
            .otherwise(intra)
            .cast("long")
            .alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    return lpa_communities(edges, iters=4)


def q173_power_iteration(spark, sf_dir):
    """Distributed PCA direction: 3 rounds of integer-exact power
    iteration on the embedding Gram matrix via the matvec identity
    y = sum_rows x (x . v) — G itself never materializes
    (operators/linalg.power_iteration_projection; O(d) per row per
    round, the tall-skinny plan RowMatrix uses). Output: each
    vector's integer projection onto the estimated dominant
    eigenvector. The oracle unrolls the same three matvec +
    floor-renormalize rounds as CTEs — every floor-division is the
    pmod form that makes Spark's truncating div equal DuckDB's
    flooring //."""
    from .operators.linalg import power_iteration_projection

    return power_iteration_projection(
        load(spark, sf_dir, "embeddings"), iters=3
    )


def q174_containment(spark, sf_dir):
    """Asymmetric containment dedup (operators/dedup.
    containment_on_rare_grams): snippet-inside-page pairs that
    Jaccard/MinHash structurally miss. Corpus = the mod-11 sample
    plus planted snippets (the tail from char 21 of every mod-33
    doc, id + 2000000). Candidates from rare-gram blocking
    (df <= 5, >= 2 shared), exact array_intersect verify,
    containment = inter / min(|A|,|B|) >= 0.8. The oracle replays
    the planting and the full blocking+verify chain in SQL."""
    from .operators.dedup import containment_on_rare_grams

    docs = load(spark, sf_dir, "documents").where(
        F.col("doc_id") % 11 == 0
    )
    snippets = docs.where(F.col("doc_id") % 33 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.expr("substring(text, 21)").alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(snippets)
    return containment_on_rare_grams(corpus)


def q175_quality_calibration(spark, sf_dir):
    """Cross-lingual quality calibration (operators/text.
    quality_calibrate): rank-normalized quality deciles WITHIN each
    language, so one keep-fraction threshold means the same thing
    for every lang — integer composite score, explicit
    floor-arithmetic bucketing (not NTILE), one shuffle on lang."""
    from .operators.text import quality_calibrate

    return quality_calibrate(load(spark, sf_dir, "documents"))


def q176_rendezvous_shards(spark, sf_dir):
    """Consistent placement: rendezvous (HRW) shard assignment over
    16 shards plus the re-assignment after shard 7 leaves
    (operators/export.rendezvous_shards). Map-only in-row argmin —
    zero shuffles — and the output carries the minimal-movement
    property the unit test asserts: moved == (shard = 7)."""
    from .operators.export import rendezvous_shards

    return rendezvous_shards(
        load(spark, sf_dir, "documents"), n_shards=16, drop_shard=7
    )


def q177_sequence_funnel(spark, sf_dir):
    """Ordered-sequence funnel view->click->purchase with
    deterministic next-step matching (operators/events.
    sequence_funnel): each step is the EARLIEST same-user event of
    the next type strictly after the previous step and within one
    day of it. Candidate pairing per step is the bucketed
    interval-join (fan-out exactly 2, equi-join on (user, bucket)),
    never a range cross-join. Oracle: correlated min-joins
    replaying the same chain."""
    from .operators.events import sequence_funnel

    return sequence_funnel(
        load(spark, sf_dir, "events"),
        steps=["view", "click", "purchase"],
        step_window_s=86400,
    )


def q178_label_scatter(spark, sf_dir):
    """Embedding-cluster quality report (operators/linalg.
    label_scatter): per-label scaled within-class scatter via the
    centroid-free identity n*sum||x||^2 - ||sum x||^2 — all sums of
    fixed-point code products, so exact in any engine. Two
    combiner-friendly groupBys; nothing corpus-sized shuffles."""
    from .operators.linalg import label_scatter

    return label_scatter(load(spark, sf_dir, "embeddings"))


def q179_segment_optimal(spark, sf_dir):
    """Optimal min-token segmentation (operators/tokenizer.
    segment_optimal): the SentencePiece-style Viterbi DP over each
    doc's first word against the corpus top-32 subword vocabulary —
    the optimality guarantee greedy BPE (q77) lacks. The DP runs
    in-row as one F.aggregate fold (word <= 12 chars, vocab as a
    literal array, zero extra shuffles); the oracle unrolls the
    same 12 position rounds as relational CTEs, deliberately a
    different computational shape."""
    from .operators.tokenizer import segment_optimal

    return segment_optimal(load(spark, sf_dir, "documents"))


def q180_anchor_text(spark, sf_dir):
    """Anchor-text index (operators/search.anchor_text_index): per
    link target, the top-3 terms by which pages link to it — the
    crawl-graph twin of q68's PageRank, fed by the same
    deterministic link synthesis (every mod-3 doc links host
    doc%23 -> Knuth-hashed host; anchor = the doc's first two
    tokens). Per-host window over the bounded anchor vocabulary;
    hot targets absorb into map-side combine."""
    from .operators.search import anchor_text_index

    d = F.col("doc_id")
    dst_idx = F.pmod(
        F.pmod(d * F.lit(2654435761), F.lit(4294967296)), F.lit(23)
    )
    links = (
        load(spark, sf_dir, "documents")
        .filter(d % 3 == 0)
        .select(
            F.concat(F.lit("host"), dst_idx.cast("string")).alias(
                "dst_host"
            ),
            F.concat_ws(
                " ",
                F.split(F.col("text"), " ")[0],
                F.split(F.col("text"), " ")[1],
            ).alias("anchor_text"),
        )
    )
    return anchor_text_index(links, top_n=3)


def q181_robust_spikes(spark, sf_dir):
    """Median/MAD rate anomalies over the hourly counts
    (operators/events.robust_spikes): the robust sibling of q117 —
    lower medians via the exact row_number rank trick (never
    percentile_approx), all integer, spikes = x - med > 3*mad.
    Everything partitions by event_type; no global funnel."""
    from .operators.events import hour_counts, robust_spikes

    return robust_spikes(
        hour_counts(load(spark, sf_dir, "events"))
    )


def q182_gps_jumps(spark, sf_dir):
    """Trajectory hygiene (operators/events.gps_jump_profile):
    per-user fix/move/jump profile with integer Chebyshev speeds —
    the cleaning gate before stay-point/co-location/map-matching
    analytics. One user-keyed window + same-key groupBy."""
    from .operators.events import gps_jump_profile

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
        F.expr(LON_EXPR.replace("doc_id", "event_id"))
        .cast("long")
        .alias("x"),
        F.expr(LAT_EXPR.replace("doc_id", "event_id"))
        .cast("long")
        .alias("y"),
    )
    return gps_jump_profile(ev, max_cheb_per_s=25000)


def q185_burst_collapse(spark, sf_dir):
    """Retry-burst deduplication (operators/events.collapse_bursts):
    same-user same-type events within one day collapse to one
    logical event with its absorbed count — gaps-and-islands on the
    composite key, one shuffle, groupBy rides the window
    partitioning."""
    from .operators.events import collapse_bursts

    return collapse_bursts(
        load(spark, sf_dir, "events"), window_s=86400
    )


def q186_length_drift(spark, sf_dir):
    """Snapshot drift tripwire (operators/text.length_drift): exact
    total-variation-distance terms between the doc-length
    histograms of two corpus halves (mod-2 split as the stand-in
    snapshots) — integers end to end via cross-multiplied
    normalizers, so the drift number is an exact rational any
    engine reproduces."""
    from .operators.text import length_drift

    docs = load(spark, sf_dir, "documents")
    return length_drift(
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1),
    )


def q187_seasonal_anomaly(spark, sf_dir):
    """Seasonality-aligned anomaly detection
    (operators/events.seasonal_anomaly): hour-of-week cells judged
    against their own weekly series via exact lower-median/MAD —
    the aligned axis q181's global hourly median is blind to. All
    integer; state bounded by 168 x |event types| baseline rows."""
    from .operators.events import seasonal_anomaly

    return seasonal_anomaly(load(spark, sf_dir, "events"), k_mad=2)


def q188_mirror_hosts(spark, sf_dir):
    """Mirror detection (operators/urls.mirror_hosts): host pairs
    sharing identical content fingerprints, exact overlap +
    per-host set sizes. Hosts via the q180 Knuth-hash synthesis, fp
    = md5 of the 160-char text head (so the corpus' planted
    duplicate docs create real cross-host mirrors). Fingerprint-
    bucketed self-join behind a boilerplate cap — no all-pairs."""
    from .operators.urls import mirror_hosts

    d = F.col("doc_id")
    host_idx = F.pmod(
        F.pmod(d * F.lit(2654435761), F.lit(4294967296)), F.lit(23)
    )
    pages = load(spark, sf_dir, "documents").select(
        F.concat(F.lit("host"), host_idx.cast("string")).alias(
            "host"
        ),
        F.md5(
            F.col("text").substr(1, 160).cast("binary")
        ).alias("fp"),
    )
    return mirror_hosts(pages, max_hosts_per_fp=16, min_shared=1)


def q189_pmi_pairs(spark, sf_dir):
    """Collocation mining (operators/search.pmi_pairs): exact
    integer PMI lift over the top-60 vocabulary — co*N vs n1*n2
    cross-multiplied so no float/log enters; TakeOrdered vocab
    broadcast back as the explosion gate."""
    from .operators.search import pmi_pairs

    return pmi_pairs(
        load(spark, sf_dir, "documents"), vocab_k=60, min_co=2
    )


def q190_conflate_places(spark, sf_dir):
    """POI conflation (operators/conflate.conflate_places): place
    records sharing a name key within 0.5 fixed-degrees merge into
    one canonical entity — (name_key, cell) blocked pairs, exact
    distance gate, min-label components. Places = doc points named
    by their first text token."""
    from .operators.conflate import conflate_places

    docs = load(spark, sf_dir, "documents")
    places = docs.select(
        F.col("doc_id").alias("place_id"),
        F.lower(F.split(F.col("text"), " ")[0]).alias("name_key"),
        F.expr(LAT_EXPR).cast("long").alias("lat_i"),
        F.expr(LON_EXPR).cast("long").alias("lon_i"),
    )
    return conflate_places(places, radius_fix=5_000_000)


def q191_crawl_plan(spark, sf_dir):
    """Politeness-bounded crawl schedule (operators/urls.crawl_plan):
    every URL gets a deterministic fetch round with <= 3 hits per
    host per round; one host-keyed window, skew = the semantics.
    URL synthesis mirrors q59's canonical shapes."""
    from .operators.urls import crawl_plan

    d = F.col("doc_id")
    urls = load(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("https://host"),
            F.pmod(d, F.lit(11)).cast("string"),
            F.lit(".example.com/doc/"),
            d.cast("string"),
        ).alias("url")
    )
    return crawl_plan(urls, per_round=3)


def q194_idw_surface(spark, sf_dir):
    """Exact-rational IDW interpolation (operators/interp.
    idw_surface): leave-one-out estimate at every mod-5 doc point
    with the integer kernel r^2 - d^2, value = n_chars — num/den
    ship separately so the surface is engine-reproducible. Same
    cell-join population as q16."""
    from .operators.interp import idw_surface

    pts = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select(
            "doc_id",
            F.col("n_chars").alias("value"),
            F.expr(LAT_EXPR).cast("long").alias("lat_i"),
            F.expr(LON_EXPR).cast("long").alias("lon_i"),
        )
    )
    return idw_surface(pts, radius_fix=2_000_000)


def q195_spatial_outliers(spark, sf_dir):
    """Local robust anomalies (operators/interp.spatial_outliers):
    q181's median/MAD rule on the SPATIAL axis — a point whose
    n_chars deviates > 3 MADs from its radius-neighborhood's lower
    median, neighborhoods under 3 points skipped. All integer."""
    from .operators.interp import spatial_outliers

    pts = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select(
            "doc_id",
            F.col("n_chars").alias("value"),
            F.expr(LAT_EXPR).cast("long").alias("lat_i"),
            F.expr(LON_EXPR).cast("long").alias("lon_i"),
        )
    )
    return spatial_outliers(
        pts, radius_fix=8_000_000, k_mad=3, min_neighbors=3
    )


def q196_jaccard_prefix(spark, sf_dir):
    """Exact set-similarity self-join (operators/dedup.
    jaccard_prefix_join): word-3-gram-set Jaccard >= 1/2 pairs via
    lossless prefix filtering under the global rarity order — the
    zero-false-negative complement to the q29 MinHash family. The
    oracle verifies against the UNPRUNED all-pairs join, proving
    the prefix filter drops nothing."""
    from .operators.dedup import jaccard_prefix_join

    return jaccard_prefix_join(
        load(spark, sf_dir, "documents"),
        threshold_num=1,
        threshold_den=2,
        gram_n=3,
    )


def q197_url_templates(spark, sf_dir):
    """Crawler-trap template mining (operators/urls.url_templates):
    digit runs collapse to {n}, per-(host, template) profile with
    n_urls >= 30 flagged — template cardinality is orders below URL
    cardinality, so the groupBy output is the bounded side."""
    from .operators.urls import url_templates

    d = F.col("doc_id")
    urls = load(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("https://host"),
            F.pmod(d, F.lit(11)).cast("string"),
            F.lit(".example.com/item/"),
            d.cast("string"),
            F.lit("/view"),
        ).alias("url")
    )
    return url_templates(urls, trap_threshold=30)


def q198_recrawl_estimate(spark, sf_dir):
    """Recrawl change-rate estimation (operators/urls.
    recrawl_estimate): 5 synthetic crawls per URL (1 for mod-4-3
    urls) with planted change patterns — every-crawl, once, never —
    so all four tiers (hot 2 / mid 1 / static 0 / single-crawl
    unknown 1) appear; rate is the exact rational
    n_changes/n_intervals."""
    from .operators.urls import recrawl_estimate

    d = F.col("doc_id")
    crawls = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(4))).alias("k"),
        )
        .where((d % 4 != 3) | (F.col("k") == 0))
        .select(
            F.concat(
                F.lit("https://h.example.com/p/"), d.cast("string")
            ).alias("url"),
            F.col("k").cast("long").alias("warc_ts"),
            F.when(d % 4 == 0, F.col("k").cast("string"))
            .when(
                d % 4 == 1,
                (F.col("k") >= 2).cast("int").cast("string"),
            )
            .otherwise(F.lit("0"))
            .alias("fp"),
        )
    )
    return recrawl_estimate(crawls)


def q199_skipgrams(spark, sf_dir):
    """Skip-gram pair counts (operators/search.skipgram_counts):
    directional (center, context) frequencies within a forward
    window of 2 — the word2vec/GloVe preprocessing table, built by
    offset-explode + exact positional equi-join (len*k linear, no
    per-doc quadratic)."""
    from .operators.search import skipgram_counts

    return skipgram_counts(
        load(spark, sf_dir, "documents"), window_k=2, min_count=2
    )


def q200_decayed_scores(spark, sf_dir):
    """Exact exponential freshness (operators/events.
    decayed_counts): per event-type activity score with 7-day
    half-life over a 56-day horizon, carried as the integer pair
    num/2^8 — reproducible ranking, no float pow. Reference day =
    the snapshot's own max event day (1-row whitelisted funnel)."""
    from .operators.events import decayed_counts

    return decayed_counts(
        load(spark, sf_dir, "events"),
        half_life_days=7,
        horizon_days=56,
    )


def q201_sorted_neighborhood(spark, sf_dir):
    """Sorted-neighborhood blocking (operators/conflate.
    sorted_neighborhood_pairs): candidate pairs within 4 positions
    of the (first-token, n_chars, doc_id) sort order — the
    equality-free blocking family; rank-bucket equi-join, each
    pair meets on exactly one key."""
    from .operators.conflate import sorted_neighborhood_pairs

    docs = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("place_id"),
        F.lower(F.split(F.col("text"), " ")[0]).alias("name_key"),
        F.col("n_chars"),
    )
    return sorted_neighborhood_pairs(
        docs,
        order_cols=["name_key", "n_chars", "place_id"],
        window=4,
    )


def q203_key_skew(spark, sf_dir):
    """Shuffle-skew spectrum (operators/indexing.key_skew_report):
    log2 frequency histogram of the events user_id key with the
    hottest key named per bucket — the partitioning-decision
    input, <= 64 output rows at any scale, floor(log2) on the
    binary string so no float log."""
    from .operators.indexing import key_skew_report

    return key_skew_report(
        load(spark, sf_dir, "events"), key_cols=["user_id"]
    )


def q204_crawl_pipeline(spark, sf_dir):
    """Composed crawl frontier plan (pipeline.crawl_frontier_plan):
    robots gate -> trap-template exclusion -> politeness rounds,
    end to end over q193's URL population plus a planted mod-2
    calendar trap on host0 (flagged at threshold 100 at sf0.01).
    The oracle recomposes the same three stages in SQL."""
    from .pipeline import crawl_frontier_plan

    d = F.col("doc_id")
    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        F.concat(
            F.lit("https://host"),
            F.pmod(d, F.lit(11)).cast("string"),
            F.lit(".example.com/doc/"),
            d.cast("string"),
        ).alias("url")
    )
    cal = docs.where(d % 2 == 0).select(
        F.concat(
            F.lit("https://host0.example.com/cal/"),
            d.cast("string"),
            F.lit("/x"),
        ).alias("url")
    )
    urls = base.unionByName(cal)
    rules = spark.createDataFrame(
        [
            (f"host{h}.example.com", p, a)
            for h in range(11)
            for p, a in (("/", 1), ("/doc/1", 0), ("/doc/13", 1))
        ],
        "host string, path_prefix string, allow long",
    )
    return crawl_frontier_plan(
        urls, rules, trap_threshold=100, per_round=3
    )


def q205_trend_slopes(spark, sf_dir):
    """Exact OLS activity trends (operators/events.trend_slopes):
    per event-type least-squares slope over the daily series as
    the integer cross-product pair num/den — growth is a sign
    test, never a float. One (key, day) rollup + one per-key
    5-sum aggregate."""
    from .operators.events import trend_slopes

    return trend_slopes(load(spark, sf_dir, "events"))


def q206_olap_rollup(spark, sf_dir):
    """Hierarchical OLAP rollup over the q118 star join: revenue
    per (nation, month) WITH nation subtotals and the grand total
    in ONE pass via DataFrame.rollup — Catalyst's Expand operator
    replicates each row once per grouping set before a single
    shuffle, so the subtotal hierarchy costs one aggregation, not
    three (the 100-TB argument for rollup over UNION ALL of
    re-aggregations). gid = grouping_id disambiguates real NULLs
    from subtotal rows; money in exact integer cents."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    fact = (
        orders.select(
            "o_custkey",
            F.month("o_orderdate").cast("long").alias("month"),
            cents.alias("cents"),
        )
        .join(
            F.broadcast(cust),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    return fact.rollup("n_name", "month").agg(
        F.sum("cents").cast("long").alias("revenue_cents"),
        F.count("*").cast("long").alias("n_orders"),
        F.grouping_id().cast("long").alias("gid"),
    )


def q207_conflate_snapshots(spark, sf_dir):
    """Cross-snapshot gazetteer diff (operators/conflate.
    conflate_snapshots): odd-doc places (new) matched to even-doc
    places (old) by name key + nearest-within-radius — matched /
    born / dead verdicts, bipartite cell block, per-new-place
    argmin window."""
    from .operators.conflate import conflate_snapshots

    docs = load(spark, sf_dir, "documents")
    places = docs.select(
        F.col("doc_id").alias("place_id"),
        F.lower(F.split(F.col("text"), " ")[0]).alias("name_key"),
        F.expr(LAT_EXPR).cast("long").alias("lat_i"),
        F.expr(LON_EXPR).cast("long").alias("lon_i"),
    )
    return conflate_snapshots(
        places.where(F.col("place_id") % 2 == 0),
        places.where(F.col("place_id") % 2 == 1),
        radius_fix=5_000_000,
    )


def q36_geobase_build(spark, sf_dir):
    """G13 geobase build: per-term used-by posting aggregates over
    the planted doc->city mapping (osmgeobase.c:2422-2444). Pure
    Catalyst replay of the planting hash, grouped by term."""
    from .fixtures import HASH_MOD, HASH_MULT, N_CITIES

    docs = load(spark, sf_dir, "documents").select("doc_id")
    h = (F.col("doc_id") * F.lit(HASH_MULT)) % F.lit(HASH_MOD)
    d = h % 10
    city = F.expr(
        f"((doc_id * {HASH_MULT}) % {HASH_MOD} div 10) % {N_CITIES}"
    )
    idx = F.when(d == 0, F.lit(None)).when(d <= 3, F.lit(0)).otherwise(
        city
    )
    placed = docs.withColumn("city_idx", idx).filter(
        F.col("city_idx").isNotNull()
    )
    return placed.groupBy("city_idx").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    ).select(
        F.concat(
            F.lit("City"), F.lpad(F.col("city_idx").cast("string"), 2, "0")
        ).alias("term"),
        "n_docs",
        "min_doc",
        "max_doc",
    )


def q37_geocode_text(spark, sf_dir):
    """G12 geocode: synthesize the pages table (mapInPandas), run
    the JVM-side regex geocoder over the EXTRACTED TEXT, and emit
    resolved coordinates — checked against the planting rule, i.e.
    an end-to-end test of make_html -> extract_text -> geocode."""
    from .pages import geocode, synth_pages

    n = load(spark, sf_dir, "documents").count()
    pages = synth_pages(spark, int(n))
    out = geocode(pages).filter(F.col("lat_i").isNotNull())
    return out.select("doc_id", "lat_i", "lon_i")


def q40_tile_doc_lists(spark, sf_dir):
    """Salted holistic tile aggregate: per-cell sorted document-id
    list via two-stage (cell, salt) -> cell aggregation (megacity
    skew handling, tiles.py). Output canonicalized as a joined
    string."""
    from .operators.spatial import with_cell
    from .operators.tiles import tile_doc_lists

    pts = with_cell(doc_points(spark, sf_dir))
    out = tile_doc_lists(pts)
    return out.select(
        "cell",
        "n_docs",
        F.array_join(
            F.transform("doc_ids", lambda d: d.cast("string")), ","
        ).alias("ids_str"),
    )


def q49_tile_raster(spark, sf_dir):
    """raster side of the raster<->vector tile materializer
    (north_rule): dense 16x16 per-cell count grids, serialized
    row-major (q40's canonical-string convention)."""
    from .operators.spatial import with_cell
    from .operators.tiles import rasterize_tiles

    pts = with_cell(doc_points(spark, sf_dir))
    return rasterize_tiles(pts)


def q50_tile_vector(spark, sf_dir):
    """vector side: occupied sub-pixels back as exact fixed-point
    boxes (the inverse quantization)."""
    from .operators.spatial import with_cell
    from .operators.tiles import vectorize_tiles

    pts = with_cell(doc_points(spark, sf_dir))
    return vectorize_tiles(pts)


def q54_tile_pyramid(spark, sf_dir):
    """G11 follow-on: multi-resolution tile pyramid — per-cell
    stats at 4 zoom levels (shift 14..17) in ONE posexplode + ONE
    algebraic shuffle (tiles.tile_pyramid), not one job per level."""
    from .operators.tiles import tile_pyramid

    return tile_pyramid(doc_points(spark, sf_dir), levels=4)


_QT_CAP, _QT_LEAF, _QT_LEVELS = 8, 20, 6


def q136_quadtree_tiles(spark, sf_dir):
    """Adaptive quadtree tiling (tiles.quadtree_rollup): cells
    split while population > 8, shifts 25 down to 20 — the
    skew-adaptive tile materializer (hotspots get fine tiles,
    sparse areas stay coarse). One shuffle over the corpus; the
    whole tree decision runs on the per-leaf-cell count table."""
    from .operators.tiles import quadtree_rollup

    return quadtree_rollup(
        doc_points(spark, sf_dir),
        cap=_QT_CAP,
        leaf_shift=_QT_LEAF,
        levels=_QT_LEVELS,
    )


def _quadtree_oracle_sql(src: str = "pts", extra: str = "") -> str:
    top = _QT_LEVELS - 1
    vals = ", ".join(
        f"({lvl}, ((latb >> {top - lvl})"
        f" * {1 << _lon_bits(_QT_LEAF + top - lvl)})"
        f" + (lonb >> {top - lvl}))"
        for lvl in range(_QT_LEVELS)
    )
    return f"""
WITH {_PTS_CTE},{extra}
fine AS (
  SELECT (lat_i + {LAT_OFFSET}) >> {_QT_LEAF} AS latb,
         (lon_i + {LON_OFFSET}) >> {_QT_LEAF} AS lonb, doc_id
  FROM {src}
),
fcnt AS (
  SELECT latb, lonb, COUNT(*) AS n, MIN(doc_id) AS min_doc
  FROM fine GROUP BY 1, 2
),
anc AS (
  SELECT latb, lonb, n, min_doc, t.l, t.cell
  FROM fcnt, LATERAL (VALUES {vals}) AS t(l, cell)
),
lvlcnt AS (
  SELECT l, cell, SUM(n) AS ln FROM anc GROUP BY 1, 2
),
asg0 AS (
  SELECT a.latb, a.lonb, MIN(a.n) AS n, MIN(a.min_doc) AS min_doc,
         MIN(CASE WHEN c.ln <= {_QT_CAP}
             THEN {{'l': a.l, 'cell': a.cell}} END) AS w
  FROM anc a JOIN lvlcnt c ON a.l = c.l AND a.cell = c.cell
  GROUP BY 1, 2
),
placed AS (
  SELECT COALESCE(w.l, {top}) AS level,
         COALESCE(w.cell,
                  latb * {1 << _lon_bits(_QT_LEAF)} + lonb) AS qcell,
         n, min_doc
  FROM asg0
)
SELECT level, qcell, CAST(SUM(n) AS BIGINT) AS n_docs,
       MIN(min_doc) AS min_doc
FROM placed GROUP BY 1, 2
"""


_QT_CHANGES_CTE = """
changes AS (
  SELECT doc_id, lat_i + 1000000 AS lat_i, lon_i,
         doc_id % 17 = 0 AS deleted
  FROM pts WHERE doc_id % 11 = 0 OR doc_id % 17 = 0
  UNION ALL
  SELECT doc_id + 3000000, lat_i + 2000000, lon_i + 1500000, FALSE
  FROM pts WHERE doc_id < 40
),
applied AS (
  SELECT doc_id, lat_i, lon_i FROM pts
  WHERE doc_id NOT IN (SELECT doc_id FROM changes)
  UNION ALL
  SELECT doc_id, lat_i, lon_i FROM changes WHERE NOT deleted
),"""


def q145_quadtree_incremental(spark, sf_dir):
    """Incrementally-maintained adaptive quadtree
    (tiles.quadtree_rollup_incremental): the q58 changefile (mod-11
    docs moved, mod-17 deleted, 40 appended) refreshes ONLY the
    affected leaf-cell counts, then the whole tree re-derives at
    count-table cost — splits/merges anywhere in the tree for
    free. The oracle recomputes the post-change quadtree from
    scratch; equality proves the affected-set maintenance loses
    nothing."""
    from .operators.tiles import quadtree_rollup_incremental

    pts = doc_points(spark, sf_dir)
    moved = pts.filter(
        (F.col("doc_id") % 11 == 0) | (F.col("doc_id") % 17 == 0)
    ).select(
        "doc_id",
        (F.col("lat_i") + F.lit(1000000)).alias("lat_i"),
        "lon_i",
        (F.col("doc_id") % 17 == 0).alias("deleted"),
    )
    added = pts.filter(F.col("doc_id") < 40).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        (F.col("lat_i") + F.lit(2000000)).alias("lat_i"),
        (F.col("lon_i") + F.lit(1500000)).alias("lon_i"),
        F.lit(False).alias("deleted"),
    )
    return quadtree_rollup_incremental(
        pts,
        moved.unionByName(added),
        cap=_QT_CAP,
        leaf_shift=_QT_LEAF,
        levels=_QT_LEVELS,
    )


def q58_tile_incremental(spark, sf_dir):
    """C1 x G11: incremental tile-view maintenance — apply a
    changefile (mod-11 docs moved ~0.1 deg north, mod-17 docs
    deleted, 40 new docs appended) and refresh the per-tile rollup
    by recomputing ONLY affected tiles
    (tiles.tile_rollup_incremental), the osmupdate daily-diff role
    as Iceberg-style partition overwrite. The oracle recomputes the
    post-change world from scratch; equality proves the affected-set
    logic loses nothing."""
    from .operators.tiles import tile_rollup_incremental

    pts = with_cell(doc_points(spark, sf_dir))
    base_tiles = pts.groupBy("cell").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )
    moved = pts.filter(
        (F.col("doc_id") % 11 == 0) | (F.col("doc_id") % 17 == 0)
    ).select(
        "doc_id",
        (F.col("lat_i") + F.lit(1000000)).alias("lat_i"),
        "lon_i",
        (F.col("doc_id") % 17 == 0).alias("deleted"),
    )
    added = pts.filter(F.col("doc_id") < 40).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        (F.col("lat_i") + F.lit(2000000)).alias("lat_i"),
        (F.col("lon_i") + F.lit(1500000)).alias("lon_i"),
        F.lit(False).alias("deleted"),
    )
    changes = with_cell(moved.unionByName(added))
    return tile_rollup_incremental(base_tiles, pts, changes)


def q59_url_dedup(spark, sf_dir):
    """Web-corpus front door: URL canonicalization (RFC 3986 §6 —
    case, default port, fragment, query order, trailing slash) +
    latest-crawl-wins dedup (operators/urls.py), the reference's
    last-version-wins object merge (A5) over the web-page key space.
    Synthesizes a messy 3-generation crawl log from documents
    (mod-7 docs re-crawled twice under different raw spellings);
    canonicalization must collapse each doc's spellings to ONE url
    and keep the newest crawl."""
    from .operators.urls import url_dedup_latest

    docs = load(spark, sf_dir, "documents").select("doc_id")
    crawls = docs.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.when(F.col("doc_id") % 7 == 0, F.lit(2)).otherwise(
                    F.lit(0)
                ),
            )
        ).alias("g"),
    )
    d, g = F.col("doc_id"), F.col("g")
    hostcase = (d + g) % 3 == 0
    url = F.concat(
        F.when((d + g) % 2 == 0, F.lit("HTTPS")).otherwise(
            F.lit("https")
        ),
        F.lit("://"),
        F.when(hostcase, F.lit("HoSt")).otherwise(F.lit("host")),
        (d % 23).cast("string"),
        F.when(hostcase, F.lit(".Example.COM")).otherwise(
            F.lit(".example.com")
        ),
        F.when((d + g) % 5 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/p/"),
        d.cast("string"),
        F.when((d + g) % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            d % 3 == 0,
            F.when((d + g) % 2 == 0, F.lit("?b=2&a=1")).otherwise(
                F.lit("?a=1&b=2")
            ),
        ).otherwise(F.lit("")),
        F.when(
            (d + g) % 6 == 0, F.concat(F.lit("#s"), g.cast("string"))
        ).otherwise(F.lit("")),
    )
    pages = crawls.select(
        "doc_id",
        url.alias("url"),
        (d * 3 + g * 1000000).cast("long").alias("warc_ts"),
    )
    return url_dedup_latest(pages)


def q60_host_stats(spark, sf_dir):
    """Registered-domain (eTLD+1, PSL-lite) corpus profile: pages +
    distinct hosts per registered domain (operators/urls.py
    host_stats) — the crawl-frontier/politeness view. Synthesis
    mixes plain, www- and sub-prefixed hosts over .example.com /
    .co.uk / .org / .com.au so the multi-label-suffix branch is
    exercised both ways."""
    from .operators.urls import host_stats

    docs = load(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    suffix = F.element_at(
        F.array(
            F.lit(".example.com"),
            F.lit(".co.uk"),
            F.lit(".org"),
            F.lit(".com.au"),
        ),
        (d % 4 + 1).cast("int"),
    )
    sub = (
        F.when(d % 5 == 0, F.lit("www."))
        .when(
            d % 7 == 0,
            F.concat(F.lit("sub"), (d % 3).cast("string"), F.lit(".")),
        )
        .otherwise(F.lit(""))
    )
    url = F.concat(
        F.lit("https://"),
        sub,
        F.lit("host"),
        (d % 23).cast("string"),
        suffix,
        F.lit("/p/"),
        d.cast("string"),
    )
    return host_stats(docs.select("doc_id", url.alias("url")))


def q143_host_geo_spread(spark, sf_dir):
    """Per-registered-domain geographic footprint (webtext x geo
    fusion): each document's planted point rolls up per eTLD+1
    domain to doc count, distinct shift-20 tiles, the fixed-point
    bbox, and the max axis span — the "is this site local or
    global" signal used for geo-aware corpus mixing. One scan +
    one domain-keyed shuffle; the eTLD+1 parse is pure codegen
    (operators/urls.with_registered_domain)."""
    from .operators.urls import with_registered_domain

    pts = doc_points(spark, sf_dir)
    d = F.col("doc_id")
    suffix = F.element_at(
        F.array(
            F.lit(".example.com"),
            F.lit(".co.uk"),
            F.lit(".org"),
            F.lit(".com.au"),
        ),
        (d % 4 + 1).cast("int"),
    )
    sub = (
        F.when(d % 5 == 0, F.lit("www."))
        .when(
            d % 7 == 0,
            F.concat(F.lit("sub"), (d % 3).cast("string"), F.lit(".")),
        )
        .otherwise(F.lit(""))
    )
    url = F.concat(
        F.lit("https://"),
        sub,
        F.lit("host"),
        (d % 23).cast("string"),
        suffix,
        F.lit("/p/"),
        d.cast("string"),
    )
    withd = with_registered_domain(
        pts.withColumn("url", url), "url", "reg_domain"
    )
    cell = (
        F.shiftright(F.col("lat_i") + 900000000, 20) * 4096
        + F.shiftright(F.col("lon_i") + 1800000000, 20)
    )
    agg = withd.groupBy("reg_domain").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct(cell).cast("long").alias("n_cells"),
        F.min("lat_i").alias("lat_min"),
        F.max("lat_i").alias("lat_max"),
        F.min("lon_i").alias("lon_min"),
        F.max("lon_i").alias("lon_max"),
    )
    return agg.withColumn(
        "span",
        F.greatest(
            F.col("lat_max") - F.col("lat_min"),
            F.col("lon_max") - F.col("lon_min"),
        ),
    )


_Q143_ORACLE = f"""
WITH {_PTS_CTE},
raw AS (
  SELECT doc_id,
    (CASE WHEN doc_id%5=0 THEN 'www.'
          WHEN doc_id%7=0 THEN 'sub' || CAST(doc_id%3 AS VARCHAR)
            || '.'
          ELSE '' END)
    || 'host' || CAST(doc_id%23 AS VARCHAR)
    || (CASE doc_id%4 WHEN 0 THEN '.example.com'
         WHEN 1 THEN '.co.uk' WHEN 2 THEN '.org'
         ELSE '.com.au' END) AS host
  FROM documents
),
reg AS (
  SELECT doc_id,
    CASE WHEN len(string_split(host, '.')) <= 2 THEN host
         WHEN array_to_string(list_slice(string_split(host, '.'),
             len(string_split(host, '.')) - 1,
             len(string_split(host, '.'))), '.')
           IN ('co.uk','org.uk','ac.uk','gov.uk','com.au','net.au',
               'org.au','co.jp','ne.jp','or.jp','com.br','com.cn',
               'co.in','co.kr','com.mx')
         THEN array_to_string(list_slice(string_split(host, '.'),
             len(string_split(host, '.')) - 2,
             len(string_split(host, '.'))), '.')
         ELSE array_to_string(list_slice(string_split(host, '.'),
             len(string_split(host, '.')) - 1,
             len(string_split(host, '.'))), '.')
    END AS reg_domain
  FROM raw
),
j AS (
  SELECT r.reg_domain, p.lat_i, p.lon_i,
         ((p.lat_i + 900000000) >> 20) * 4096
         + ((p.lon_i + 1800000000) >> 20) AS cell
  FROM reg r JOIN pts p ON p.doc_id = r.doc_id
),
agg AS (
  SELECT reg_domain, COUNT(*) AS n_docs,
         COUNT(DISTINCT cell) AS n_cells,
         MIN(lat_i) AS lat_min, MAX(lat_i) AS lat_max,
         MIN(lon_i) AS lon_min, MAX(lon_i) AS lon_max
  FROM j GROUP BY 1
)
SELECT *, GREATEST(lat_max - lat_min, lon_max - lon_min) AS span
FROM agg
"""


def q144_region_text_stats(spark, sf_dir):
    """Geo-sliced corpus report: token/length/long-doc rollups per
    admin region (outside = 'OUT') — the per-region slice a
    geo-aware training mix is built from. ONE scan of documents
    (points derive from doc_id in-row, region resolves in the
    same Catalyst pass), one bounded groupBy; sums stay integer so
    the report is engine-exact."""
    from .operators.spatial import assign_regions

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    pts = docs.select(
        "doc_id",
        "text",
        F.expr(LAT_EXPR).cast("long").alias("lat_i"),
        F.expr(LON_EXPR).cast("long").alias("lon_i"),
    )
    located = assign_regions(
        pts, fixture_polyset(), keep_noregion=True
    )
    tl = F.length("text").cast("long")
    ntok = F.size(F.split(F.col("text"), " ")).cast("long")
    return located.groupBy(
        F.coalesce("region", F.lit("OUT")).alias("region")
    ).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(ntok).cast("long").alias("sum_tokens"),
        F.sum(tl).cast("long").alias("sum_len"),
        F.sum(F.when(tl >= 300, 1).otherwise(0))
        .cast("long")
        .alias("n_long"),
    )


def _region_text_oracle_sql() -> str:
    return f"""
WITH {_PTS_CTE},
{_region_cte_sql("pts", "doc_id")},
j AS (
  SELECT COALESCE(g.region, 'OUT') AS region,
    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
    CAST(length(d.text) AS BIGINT) AS text_len
  FROM documents d LEFT JOIN reg g ON d.doc_id = g.doc_id
)
SELECT region, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(SUM(text_len) AS BIGINT) AS sum_len,
       CAST(SUM(CASE WHEN text_len >= 300 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_long
FROM j GROUP BY 1
"""


def q61_corpus_filter(spark, sf_dir):
    """Composed corpus filter (FineWeb/CCNet shape): per-document
    keep verdict = lang=='en' AND len>=300 AND dup_frac<=0.2 AND
    exact-dedup keeper, with per-rule booleans kept for drop
    attribution (operators/text.corpus_filter_verdict). One scan
    pass + one fingerprint shuffle."""
    from .operators.text import corpus_filter_verdict

    return corpus_filter_verdict(load(spark, sf_dir, "documents"))


def q62_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling (corpus-mix assembly):
    per-language keep rates en=0.5/de=0.25/fr=0.25/other=0.1 via a
    pure hash of doc_id (operators/text.stratified_sample) —
    membership reproducible across runs, partitionings, and
    resumes, unlike df.sample()."""
    from .operators.text import stratified_sample

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample(
        docs,
        {"en": 0.5, "de": 0.25, "fr": 0.25},
        seed=7,
        default_frac=0.1,
    )


def q63_pack_plan(spark, sf_dir):
    """Sequence-packing plan: assign each document its starting
    512-token training window from the inclusive running token
    total over doc_id order — SUM() OVER (ORDER BY) computed as a
    distributed prefix sum (operators/indexing.with_running_total),
    not a one-task global window."""
    from .operators.indexing import with_running_total

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    out = with_running_total(
        docs, order_cols=["doc_id"], value_col="n_tokens",
        out_col="cum_tokens",
    )
    start = F.col("cum_tokens") - F.col("n_tokens")
    return out.select(
        "doc_id",
        "n_tokens",
        "cum_tokens",
        F.expr("(cum_tokens - n_tokens) div 512").alias("bin"),
        F.pmod(start, F.lit(512)).alias("bin_offset"),
    )


def q64_tile_quality(spark, sf_dir):
    """The two graft axes joined: per-TILE corpus quality — each
    document's composed keep verdict (q61) aggregated over its tile
    cell (q04). One co-keyed join on doc_id, then the algebraic
    cell rollup; the per-tile keep rate is the map a
    crawl-prioritization loop feeds back into the frontier."""
    from .operators.text import corpus_filter_verdict

    pts = with_cell(doc_points(spark, sf_dir))
    verdict = corpus_filter_verdict(
        load(spark, sf_dir, "documents")
    ).select("doc_id", "keep")
    return (
        pts.join(verdict, "doc_id")
        .groupBy("cell")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.col("keep").cast("long")).alias("n_keep"),
        )
        .withColumn(
            "keep_rate",
            F.round(F.col("n_keep") / F.col("n_docs"), 6),
        )
    )


def q65_pii_scrub(spark, sf_dir):
    """PII redaction audit (operators/text.pii_scrub): emails,
    dotted IPv4s, and NNN-NNN-NNNN phones replaced by typed
    placeholders; per-category counts on the original text; md5 of
    the scrubbed text proves byte-identical redaction vs the
    oracle. The synthetic documents carry no organic PII, so the
    query plants a deterministic PII tail per doc (same expression
    on both sides): every doc one email + one IP, mod-3 docs a
    second email, mod-4 docs a phone."""
    from .operators.text import pii_scrub

    d = F.col("doc_id")
    tail = F.concat(
        F.lit(" contact user"),
        d.cast("string"),
        F.lit("@mail"),
        (d % 5).cast("string"),
        F.lit(".example.com"),
        F.when(
            d % 3 == 0,
            F.concat(
                F.lit(" cc admin"),
                (d % 97).cast("string"),
                F.lit("@example.org"),
            ),
        ).otherwise(F.lit("")),
        F.lit(" from 10."),
        (d % 256).cast("string"),
        F.lit(".0.1"),
        F.when(
            d % 4 == 0,
            F.concat(
                F.lit(" tel 555-"),
                F.lpad((d % 1000).cast("string"), 3, "0"),
                F.lit("-0199"),
            ),
        ).otherwise(F.lit("")),
    )
    planted = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.substring("text", 1, 60), tail).alias("text"),
    )
    out = pii_scrub(planted)
    return out.select(
        "doc_id",
        "n_emails",
        "n_ipv4",
        "n_phones",
        F.md5(F.col("scrubbed").cast("binary")).alias("scrub_md5"),
    )


def q66_blocklist(spark, sf_dir):
    """Domain-blocklist crawl hygiene (operators/urls.
    blocklist_filter): drop pages whose registered domain (eTLD+1,
    PSL-lite) is on a blocklist TABLE — broadcast LEFT ANTI join,
    pages never shuffle. Reuses q60's host synthesis; the blocklist
    holds 'example.com' (a registered domain that collapses every
    www./sub-prefixed .example.com host — the PSL point), two
    specific hosts under multi-label suffixes, and a never-matching
    row."""
    from .operators.urls import blocklist_filter

    docs = load(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    suffix = F.element_at(
        F.array(
            F.lit(".example.com"),
            F.lit(".co.uk"),
            F.lit(".org"),
            F.lit(".com.au"),
        ),
        (d % 4 + 1).cast("int"),
    )
    sub = (
        F.when(d % 5 == 0, F.lit("www."))
        .when(
            d % 7 == 0,
            F.concat(F.lit("sub"), (d % 3).cast("string"), F.lit(".")),
        )
        .otherwise(F.lit(""))
    )
    url = F.concat(
        F.lit("https://"),
        sub,
        F.lit("host"),
        (d % 23).cast("string"),
        suffix,
        F.lit("/p/"),
        d.cast("string"),
    )
    pages = docs.select("doc_id", url.alias("url"))
    # LocalRelation blocklist (explode of a literal array) — a
    # Python-RDD-backed createDataFrame costs a driver roundtrip
    # per construction; this stays JVM-side
    bl = spark.range(1).select(
        F.explode(
            F.array(
                F.lit("example.com"),
                F.lit("host3.co.uk"),
                F.lit("host7.org"),
                F.lit("never.example.net"),
            )
        ).alias("domain")
    )
    return blocklist_filter(pages, bl)


def q67_boilerplate(spark, sf_dir):
    """CCNet-style boilerplate-line removal (operators/text.
    boilerplate_strip): lines appearing in >30% of the corpus (nav
    menu on every doc, a copyright footer on half) are stripped;
    each document is rebuilt from its remaining lines in order.
    Line structure is planted deterministically (same concat_ws on
    the oracle side): every doc gets a nav line + its body + a
    unique tail; mod-2 docs a copyright footer; mod-10 docs a
    share bar (10% — below threshold, must survive)."""
    from .operators.text import boilerplate_strip

    d = F.col("doc_id")
    text2 = F.concat_ws(
        "\n",
        F.lit("NAV HOME ABOUT CONTACT"),
        F.substring("text", 1, 60),
        F.when(d % 2 == 0, F.lit("COPYRIGHT 2026 EXAMPLE CORP")),
        F.when(d % 10 == 0, F.lit("SHARE LIKE SUBSCRIBE")),
        F.concat(F.lit("tail "), d.cast("string")),
    )
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", text2.alias("text")
    )
    return boilerplate_strip(docs, doc_frac=0.3)


def q119_triangles(spark, sf_dir):
    """Exact per-host triangle counts over the q68 link graph
    (linkgraph.triangle_count): the degree-ordered wedge-join plan
    whose post-orientation out-degree is O(sqrt(m)) — hub-proof at
    web scale; all-integer, oracle replays the same joins."""
    from .operators.linkgraph import triangle_count

    d = F.col("doc_id")
    dst_idx = F.pmod(
        F.pmod(d * F.lit(2654435761), F.lit(4294967296)), F.lit(23)
    )
    edges = (
        load(spark, sf_dir, "documents")
        .filter(d % 3 == 0)
        .select(
            F.concat(F.lit("host"), (d % 23).cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("host"), dst_idx.cast("string")).alias(
                "dst"
            ),
        )
    )
    return triangle_count(edges)


def q68_host_pagerank(spark, sf_dir):
    """Crawl-frontier host PageRank (operators/linkgraph.
    host_pagerank): 3 synchronous iterations, damping 85/100, over
    a deterministic host link graph. Every mod-3 doc links its host
    (doc%23) to a Knuth-hashed destination host, so out-degrees
    vary host to host (any dst derived from doc%23 alone would
    collapse to a rank-preserving permutation). All-integer
    fixed-point arithmetic makes the ranks bit-identical to the
    unrolled SQL oracle — no float aggregation-order drift."""
    from .operators.linkgraph import host_pagerank

    return host_pagerank(_host_edges(spark, sf_dir), iters=3)


def q192_seed_pagerank(spark, sf_dir):
    """Personalized PageRank (operators/linkgraph.
    personalized_pagerank): q68's integer fixed point with teleport
    mass restricted to seed hosts {host0, host1, host2} — the
    trusted-hub proximity ranker; rank 0 = unreachable from the
    seeds within 3 steps. Same deterministic link graph and
    bit-exact unrolled-SQL parity as q68."""
    from .operators.linkgraph import personalized_pagerank

    edges = _host_edges(spark, sf_dir)
    seeds = spark.createDataFrame(
        [("host0",), ("host1",), ("host2",)], "host string"
    )
    return personalized_pagerank(edges, seeds, iters=3)


def q193_robots_gate(spark, sf_dir):
    """Robots longest-prefix gating (operators/urls.robots_gate):
    q191's URL population decided against 3 rules per host ('/'
    allow, '/doc/1' deny, '/doc/13' allow) — most-specific-wins,
    allow beats deny on ties, broadcast rules, pages never
    shuffle (the final per-url max_by is over <= 3 candidate
    rows)."""
    from .operators.urls import robots_gate

    d = F.col("doc_id")
    urls = load(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("https://host"),
            F.pmod(d, F.lit(11)).cast("string"),
            F.lit(".example.com/doc/"),
            d.cast("string"),
        ).alias("url")
    )
    rules = spark.createDataFrame(
        [
            (f"host{h}.example.com", p, a)
            for h in range(11)
            for p, a in (("/", 1), ("/doc/1", 0), ("/doc/13", 1))
        ],
        "host string, path_prefix string, allow long",
    )
    return robots_gate(urls, rules)


def q69_corpus_build(spark, sf_dir):
    """The composed corpus-build pipeline (pipeline.corpus_build):
    boilerplate strip -> PII scrub -> filter verdict -> stratified
    mix -> sequence packing, end to end over planted multi-line
    docs (q67's nav/copyright/share lines plus a per-doc email in
    the unique tail, so every stage does real work). The oracle
    recomposes the same stages in SQL, reusing the parameterized
    q61 verdict over the cleaned+scrubbed text."""
    from .pipeline import corpus_build

    d = F.col("doc_id")
    text2 = F.concat_ws(
        "\n",
        F.lit("NAV HOME ABOUT CONTACT"),
        F.substring("text", 1, 60),
        F.when(d % 2 == 0, F.lit("COPYRIGHT 2026 EXAMPLE CORP")),
        F.when(d % 10 == 0, F.lit("SHARE LIKE SUBSCRIBE")),
        F.concat(
            F.lit("tail "),
            d.cast("string"),
            F.lit(" contact user"),
            d.cast("string"),
            F.lit("@mail"),
            (d % 5).cast("string"),
            F.lit(".example.com"),
        ),
    )
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", text2.alias("text"), "lang"
    )
    return corpus_build(
        docs,
        min_len=80,
        mix={"en": 0.9, "de": 0.6},
        mix_seed=11,
        default_frac=0.5,
    )


def q70_funnel_report(spark, sf_dir):
    """One-row corpus-build observability report (pipeline.
    funnel_report) over the same planted docs as q69: input size,
    line counts before/after boilerplate strip, email redactions,
    keep count + per-rule failure attribution, mix survivors,
    packed token total and training-window count — twelve exact
    scalars, every one independently recomputed by the oracle."""
    from .pipeline import funnel_report

    d = F.col("doc_id")
    text2 = F.concat_ws(
        "\n",
        F.lit("NAV HOME ABOUT CONTACT"),
        F.substring("text", 1, 60),
        F.when(d % 2 == 0, F.lit("COPYRIGHT 2026 EXAMPLE CORP")),
        F.when(d % 10 == 0, F.lit("SHARE LIKE SUBSCRIBE")),
        F.concat(
            F.lit("tail "),
            d.cast("string"),
            F.lit(" contact user"),
            d.cast("string"),
            F.lit("@mail"),
            (d % 5).cast("string"),
            F.lit(".example.com"),
        ),
    )
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", text2.alias("text"), "lang"
    )
    return funnel_report(
        docs,
        min_len=80,
        mix={"en": 0.9, "de": 0.6},
        mix_seed=11,
        default_frac=0.5,
    )


def q71_image_resize(spark, sf_dir):
    """Batched image-resize plumbing (multimodal.resize_images):
    synthesize payloads, resize to max dim 64 (aspect-preserving
    integer scaling inside the fake header), re-decode metadata.
    The oracle recomputes the scaled dimensions arithmetically from
    doc_id — validating synthesis, resize, and decode together."""
    from .operators.multimodal import (
        decode_metadata,
        resize_images,
        synth_media,
    )

    n = load(spark, sf_dir, "documents").count()
    resized = resize_images(synth_media(spark, n), max_dim=64)
    return (
        decode_metadata(resized)
        .filter(F.col("kind") == "image")
        .select(
            "doc_id",
            F.col("width").cast("long").alias("width"),
            F.col("height").cast("long").alias("height"),
        )
    )


def q72_frame_sample(spark, sf_dir):
    """Frame-sampling plumbing (multimodal.sample_frames): fake
    videos fan out to every-4th-frame rows; the query reports each
    sampled frame's length and fill byte READ FROM THE SLICED
    BYTES, which the oracle recomputes arithmetically from doc_id
    and frame index — validating the offset math end to end."""
    from .operators.multimodal import sample_frames, synth_video

    n = load(spark, sf_dir, "documents").count()
    frames = sample_frames(synth_video(spark, n), every_n=4)
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.length("frame").cast("long").alias("frame_len"),
        F.expr(
            "cast(conv(hex(substring(frame, 1, 1)), 16, 10)"
            " as bigint)"
        ).alias("byte_val"),
    )


def q41_bpe_tokens(spark, sf_dir):
    """BPE-ish token counting: word + single-punctuation tokens via
    a portable regex ([A-Za-z0-9]+ | single non-space symbol) —
    the sub-word-ish tokenizer companion to q11's whitespace count."""
    docs = load(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(
        F.col("text"), F.lit("([A-Za-z0-9]+|[^A-Za-z0-9 ])"), 1
    )
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias(
            "n_unique_tokens"
        ),
    )


def q42_stats_argmax(spark, sf_dir):
    """A1 full statistics: min/max plus the reference's argmax
    fields (object id achieving the maximum — max refs with its
    way id, osmconvert.c:11422-11491)."""
    from .operators.graph import synth_ways

    docs = load(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    ways = synth_ways(docs, n).withColumn(
        "n_refs", F.size("refs").cast("long")
    )
    return ways.agg(
        F.count("*").cast("long").alias("n_ways"),
        F.min("way_id").alias("min_way"),
        F.max("way_id").alias("max_way"),
        F.max("n_refs").alias("max_refs"),
        F.min_by("way_id", F.struct(-F.col("n_refs"), F.col("way_id")))
        .alias("argmax_refs_way"),
    )


def q43_geocode_rank(spark, sf_dir):
    """W4/G12: geocode candidate RANKING — all gazetteer terms found
    in a text, ranked by weight desc then term index asc (the
    reference's (255-weight)<<32|idx sort, osmposition.c:1229-1247),
    capped at 25. Texts are doc pairs (i, i+1) so multi-candidate
    rows exist."""
    from pyspark.sql import Window

    from .fixtures import gazetteer_arrays
    from .pages import synth_pages

    n = load(spark, sf_dir, "documents").count()
    pages = synth_pages(spark, int(n)).select("doc_id", "text")
    nxt = pages.select(
        (F.col("doc_id") - 1).alias("doc_id"),
        F.col("text").alias("text2"),
    )
    paired = pages.join(nxt, "doc_id").select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" "), F.col("text2")).alias(
            "text"
        ),
    )
    terms, _la, _lo, weight = gazetteer_arrays()
    pairs = []
    for i, (t, w) in enumerate(zip(terms, weight.tolist())):
        pairs += [F.lit(t), F.lit((int(w) << 16) | i)]
    wmap = F.create_map(*pairs)
    toks = F.array_distinct(F.split(F.col("text"), " "))
    hits = F.filter(
        F.transform(toks, lambda t: F.try_element_at(wmap, t)),
        lambda x: x.isNotNull(),
    )
    ex = paired.select(
        "doc_id", F.explode(hits).alias("packed")
    ).select(
        "doc_id",
        F.shiftright("packed", 16).alias("weight"),
        (F.col("packed") % F.lit(1 << 16)).alias("term_idx"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("weight"), F.asc("term_idx")
    )
    return (
        ex.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 25)
        .select(
            "doc_id",
            F.concat(
                F.lit("City"),
                F.lpad(F.col("term_idx").cast("string"), 2, "0"),
            ).alias("term"),
            F.col("weight").cast("long").alias("weight"),
            "rank",
        )
    )


def _host_edges(spark, sf_dir):
    """The deterministic host link graph shared by q68/q192/q208:
    every mod-3 doc links its host (doc%23) to a Knuth-hashed
    destination host (out-degrees vary host to host)."""
    d = F.col("doc_id")
    dst_idx = F.pmod(
        F.pmod(d * F.lit(2654435761), F.lit(4294967296)), F.lit(23)
    )
    return (
        load(spark, sf_dir, "documents")
        .filter(d % 3 == 0)
        .select(
            F.concat(F.lit("host"), (d % 23).cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("host"), dst_idx.cast("string")).alias(
                "dst"
            ),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def q208_hits_scores(spark, sf_dir):
    """HITS hubs & authorities over the q68 host link graph
    (operators/linkgraph.hits_scores): 2 synchronous un-normalized
    rounds in exact int64 — directories (hubs) separated from
    destinations (authorities), the crawl-frontier signal
    PageRank's single score conflates. Oracle: the same two rounds
    unrolled as join+sum CTEs."""
    from .operators.linkgraph import hits_scores

    return hits_scores(_host_edges(spark, sf_dir), iters=2)


def q209_morans_i(spark, sf_dir):
    """Global spatial autocorrelation of the document density
    surface (operators/autocorr.morans_i_grid): Moran's I over
    shift-24 grid-cell counts with rook contiguity, floor-mean
    centering, every term exact int64 — numerator, denominator,
    n, W and the centering residual reported as the exact
    fraction's parts. Oracle mirrors the dilated-neighbor join."""
    from .operators.autocorr import morans_i_grid

    return morans_i_grid(doc_points(spark, sf_dir), shift=24)


def q210_linkage_scores(spark, sf_dir):
    """Fellegi-Sunter record linkage (operators/linkage.
    fs_linkage) over name-key-blocked even/odd place pairs: three
    integer-weighted comparators — same shift-22 cell (+38/-7),
    same n_chars band (+11/-13), same lang where comparable
    (+9/-21, deterministically NULL for ~1/17 of pairs to
    exercise the missing-comparator rule) — summed to an exact
    score and thresholded match/possible/nonmatch."""
    from .operators.linkage import fs_linkage

    docs = load(spark, sf_dir, "documents")
    places = docs.select(
        F.col("doc_id").alias("place_id"),
        F.lower(F.split(F.col("text"), " ")[0]).alias("name_key"),
        F.expr(LAT_EXPR).cast("long").alias("lat_i"),
        F.expr(LON_EXPR).cast("long").alias("lon_i"),
        "lang",
        "n_chars",
    )
    a = places.where(F.col("place_id") % 2 == 1)
    b = places.where(F.col("place_id") % 2 == 0)
    pairs = (
        a.alias("a")
        .join(b.alias("b"), "name_key")
        .select(
            F.col("a.place_id").alias("id_a"),
            F.col("b.place_id").alias("id_b"),
            (
                (
                    F.shiftright(F.col("a.lat_i"), 22)
                    == F.shiftright(F.col("b.lat_i"), 22)
                )
                & (
                    F.shiftright(F.col("a.lon_i"), 22)
                    == F.shiftright(F.col("b.lon_i"), 22)
                )
            ).alias("cell_agree"),
            (
                F.expr("a.n_chars div 64") == F.expr("b.n_chars div 64")
            ).alias("len_agree"),
            F.when(
                (F.col("a.place_id") + F.col("b.place_id")) % 17
                == 0,
                F.lit(None).cast("boolean"),
            )
            .otherwise(F.col("a.lang") == F.col("b.lang"))
            .alias("lang_agree"),
        )
    )
    return fs_linkage(
        pairs,
        fields=[
            ("cell_agree", 38, -7),
            ("len_agree", 11, -13),
            ("lang_agree", 9, -21),
        ],
        match_at=40,
        possible_at=5,
    )


def q211_region_lift(spark, sf_dir):
    """Host x latitude-band affinity (operators/affinity.
    contingency_lift): observed/expected contingency lift with
    both sides of the comparison as exact int64 products
    (n_obs*n_total vs n_row*n_col) plus the over-representation
    verdict — the two-dimensional audit of where each host's
    documents geolocate."""
    from .operators.affinity import contingency_lift

    pts = doc_points(spark, sf_dir)
    framed = pts.select(
        F.concat(
            F.lit("host"), (F.col("doc_id") % 23).cast("string")
        ).alias("host"),
        F.concat(
            F.lit("r"),
            F.shiftright(F.col("lat_i"), 23).cast("string"),
        ).alias("region"),
    )
    return contingency_lift(framed, "host", "region")


def q212_haar_series(spark, sf_dir):
    """Integer Haar wavelet compaction of per-event-type daily
    counts (operators/wavelet.haar_transform): each type's first
    8 days (key-relative) densified and run through 3 unnormalized
    sum/difference levels — detail bands localize change-bursts,
    the approximation carries the total, every coefficient exact
    int64. Oracle unrolls the three levels as groupBy CTEs."""
    from .operators.wavelet import haar_transform

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("key"),
        F.datediff(
            F.to_date("ts"), F.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("day"),
    ).agg(F.count("*").cast("long").alias("v"))
    w = Window.partitionBy("key")
    series = (
        daily.withColumn("day0", F.min("day").over(w))
        .select(
            "key",
            (F.col("day") - F.col("day0")).alias("idx"),
            "v",
        )
        .where(F.col("idx") < 8)
    )
    return haar_transform(series, 8, key="key")


def q214_winsorized_stats(spark, sf_dir):
    """Per-host winsorized length budget (operators/events.
    winsorized_stats): n_chars clamped at the exact rank-10%/90%
    values under the deterministic (value, doc_id) order, then
    summed — the outlier-proof per-host size statistic, exact
    int64 against a window-based SQL oracle."""
    from .operators.events import winsorized_stats

    docs = load(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("host"), (F.col("doc_id") % 23).cast("string")
        ).alias("host"),
        "n_chars",
        "doc_id",
    )
    return winsorized_stats(
        docs, key_col="host", v_col="n_chars", id_col="doc_id",
        pct=10,
    )


def q216_raster_morphology(spark, sf_dir):
    """Chebyshev-1 dilation/erosion of the shift-22 density
    raster's inside-set (operators/tiles.raster_morphology): one
    vote-aggregation computes, per dilated cell, the neighborhood
    count, the inside flag and the all-neighbors eroded flag —
    the opening/closing building block a tile pipeline runs
    before contouring (q215)."""
    from .operators.tiles import raster_morphology

    pts = doc_points(spark, sf_dir)
    cells = pts.groupBy(
        F.shiftright(F.col("lat_i") + 900_000_000, 22).alias(
            "latb"
        ),
        F.shiftright(F.col("lon_i") + 1_800_000_000, 22).alias(
            "lonb"
        ),
    ).agg(F.count("*").cast("long").alias("n"))
    thr = load(spark, sf_dir, "documents").count() // 128
    return raster_morphology(cells, threshold=thr, radius=1)


def q218_histogram_emd(spark, sf_dir):
    """Earth Mover's Distance terms between the even/odd snapshot
    length histograms (operators/text.histogram_emd): per-bucket
    signed cumulative flow with normalizers cross-multiplied away
    — integer-exact transport distance, the HOW-FAR sibling of
    q186's total-variation WHETHER."""
    from .operators.text import histogram_emd

    docs = load(spark, sf_dir, "documents")
    return histogram_emd(
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1),
        bucket_chars=100,
    )


def q220_link_prediction(spark, sf_dir):
    """Link-prediction score battery over the q68 host graph
    (operators/linkgraph.link_prediction_scores): exact common-
    neighbor counts via the apex wedge join plus the
    preferential-attachment degree product, existing edges
    flagged — the crawl-frontier 'which hosts will link next'
    signal, all int64 (log-free by design)."""
    from .operators.linkgraph import link_prediction_scores

    return link_prediction_scores(_host_edges(spark, sf_dir))


def q221_weighted_median(spark, sf_dir):
    """Per-event-type weighted lower median of the event day
    (operators/events.weighted_median): weights 1 + event_id % 7,
    the 2*cumw >= W convention under deterministic (day,
    event_id) order — integer-exact weighted percentile."""
    from .operators.events import weighted_median

    ev = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("key"),
        F.datediff(
            F.to_date("ts"), F.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("v"),
        (F.lit(1) + F.col("event_id") % 7).cast("long").alias(
            "wgt"
        ),
        F.col("event_id").alias("id"),
    )
    return weighted_median(ev)


def q223_seq_patterns(spark, sf_dir):
    """Contiguous sequential patterns: corpus-wide counts of every
    3-run of consecutive event types per user (operators/events.
    sequence_ngrams), order pinned by (ts, event_id) — the
    clickstream path-mining primitive over the bounded
    |event_types|^3 gram vocabulary."""
    from .operators.events import sequence_ngrams

    return sequence_ngrams(load(spark, sf_dir, "events"), n=3)


def q224_survival_counts(spark, sf_dir):
    """Kaplan-Meier life table of user activity spans
    (operators/events.survival_table): per change-point day, the
    exact at-risk and death counts rebuilt from +-1 span deltas by
    one calendar-bounded running sum — no user x day explosion."""
    from .operators.events import survival_table

    day = F.datediff(
        F.to_date("ts"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    spans = (
        load(spark, sf_dir, "events")
        .select("user_id", day.alias("day"))
        .groupBy("user_id")
        .agg(
            F.min("day").alias("first_day"),
            F.max("day").alias("last_day"),
        )
    )
    return survival_table(spans)


def q225_flow_directions(spark, sf_dir):
    """D8 steepest-descent flow over the shift-22 density raster
    (operators/tiles.flow_directions): every occupied cell's
    lowest-count occupied neighbor (strictly lower, row-major tie
    break, pits at (0,0)) plus the inflow degree — the drainage
    skeleton of the crowd-density surface, stencil-join only."""
    from .operators.tiles import flow_directions

    pts = doc_points(spark, sf_dir)
    cells = pts.groupBy(
        F.shiftright(F.col("lat_i") + 900_000_000, 22).alias(
            "latb"
        ),
        F.shiftright(F.col("lon_i") + 1_800_000_000, 22).alias(
            "lonb"
        ),
    ).agg(F.count("*").cast("long").alias("n"))
    return flow_directions(cells)


def _doc_changelog(spark, sf_dir):
    """q226 input: an append-only MVCC changelog synthesized from
    documents — every doc inserted at ver 0, mod-7 docs upserted
    at ver 1+doc_id%3, mod-13 docs tombstoned at ver 4. Mirrored
    literally in the oracle."""
    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.lit(0).cast("long").alias("ver"),
        "text",
        F.lit(False).alias("deleted"),
    )
    upd = docs.where(F.col("doc_id") % 7 == 0).select(
        "doc_id",
        (F.lit(1) + F.col("doc_id") % 3).cast("long").alias("ver"),
        F.concat(F.lit("u "), F.col("text")).alias("text"),
        F.lit(False).alias("deleted"),
    )
    dels = docs.where(F.col("doc_id") % 13 == 0).select(
        "doc_id",
        F.lit(4).cast("long").alias("ver"),
        F.lit("").alias("text"),
        F.lit(True).alias("deleted"),
    )
    return base.unionByName(upd).unionByName(dels)


def q226_snapshot_read(spark, sf_dir):
    """MVCC time-travel read (operators/merge.snapshot_read):
    reconstruct the documents table AS OF version 2 from the
    synthesized changelog — per-id latest visible change, ver-4
    tombstones and ver-3 upserts invisible. The Iceberg-style
    snapshot-isolation read over manifest.py's commit-log
    layout."""
    from .operators.merge import snapshot_read

    return snapshot_read(_doc_changelog(spark, sf_dir), as_of=2)


def q227_bitmap_cells(spark, sf_dir):
    """Per-cell host bitmap index (operators/bitmapix.
    category_bitmaps): which of the 23 hosts appear in each
    shift-22 cell, packed into ONE int64 word by bit_or with its
    popcount — per-group state independent of row count, the OLAP
    bitmap-index build."""
    from .operators.bitmapix import category_bitmaps

    pts = doc_points(spark, sf_dir).select(
        (
            F.shiftright(F.col("lat_i") + 900_000_000, 22) * 1024
            + F.shiftright(F.col("lon_i") + 1_800_000_000, 22)
        ).alias("cell"),
        (F.col("doc_id") % 23).alias("host_idx"),
    )
    return category_bitmaps(pts, "cell", "host_idx", n_cats=23)


def q228_bitmap_overlap(spark, sf_dir):
    """Bitmap set algebra between east-neighbor cells
    (operators/bitmapix.bitmap_overlap): shared / either-side /
    exclusive host popcounts via single-word bit ops — 'how many
    hosts do adjacent tiles share' without any row-level join."""
    from .operators.bitmapix import bitmap_overlap, category_bitmaps

    pts = doc_points(spark, sf_dir).select(
        (
            F.shiftright(F.col("lat_i") + 900_000_000, 22) * 1024
            + F.shiftright(F.col("lon_i") + 1_800_000_000, 22)
        ).alias("cell"),
        (F.col("doc_id") % 23).alias("host_idx"),
    )
    bms = category_bitmaps(pts, "cell", "host_idx", n_cats=23)
    # true east neighbor: pair on (latb, lonb + 1), i.e. grp + 1
    # ONLY while lonb stays inside the row — at the lonb = 1023
    # seam grp + 1 would wrap to the next row's lonb = 0 cell, so
    # seam cells pair with nothing eastward (real lons top out at
    # lonb = 858 at shift 22, but the guard keeps the semantics
    # honest for any packing)
    pairs = bms.select(
        F.col("grp").alias("grp_a"),
        (F.col("grp") + 1).alias("grp_b"),
    ).where(F.col("grp_a") % 1024 != 1023)
    return bitmap_overlap(bms, pairs)


def q229_k_anonymity(spark, sf_dir):
    """k-anonymous publication of the density raster
    (operators/tiles.k_anonymous_cells): shift-18 cells publish
    where n >= 10, the rest generalize 2 bits per level for 2
    levels, the residue ships flagged suppressed — mass-conserving
    (sum of n_pub equals the corpus), every group either meets k
    or is explicitly marked."""
    from .operators.tiles import k_anonymous_cells

    pts = doc_points(spark, sf_dir)
    cells = pts.groupBy(
        F.shiftright(F.col("lat_i") + 900_000_000, 18).alias(
            "latb"
        ),
        F.shiftright(F.col("lon_i") + 1_800_000_000, 18).alias(
            "lonb"
        ),
    ).agg(F.count("*").cast("long").alias("n"))
    return k_anonymous_cells(cells, k=10, levels=2, step=2)


def q230_apportion_budget(spark, sf_dir):
    """Largest-remainder apportionment of a 1000-unit sampling
    budget across the 23 host strata (operators/export.
    apportion_budget): exact Hamilton quotas that sum to the
    budget by construction, remainder ties toward the smaller
    stratum key."""
    from .operators.export import apportion_budget

    strata = (
        load(spark, sf_dir, "documents")
        .groupBy(
            F.concat(
                F.lit("host"), (F.col("doc_id") % 23).cast("string")
            ).alias("stratum")
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    return apportion_budget(strata, budget=1000)


def q231_cluster_purity(spark, sf_dir):
    """Clustering evaluation against the planted embedding labels
    (operators/clustering.cluster_purity): the q82 k-means
    assignment joined to ground truth — per cluster the majority
    label, its support, the size and the distinct-label count,
    purity's exact sufficient statistics. Oracle composes the
    unrolled k-means oracle with the same argmax."""
    from .operators.clustering import cluster_purity, kmeans_assign

    emb = load(spark, sf_dir, "embeddings")
    asg = kmeans_assign(emb, k=8, n_iter=2)
    # cast once here: major_label now keeps the label column's own
    # type (the operator no longer forces a numeric cast), and the
    # oracle compares it as BIGINT
    return cluster_purity(
        asg,
        emb.select("vec_id", F.col("label").cast("long").alias("label")),
    )


def q232_cell_gini(spark, sf_dir):
    """Spatial concentration in one number (operators/indexing.
    gini_parts): the exact integer Gini coefficient parts of the
    shift-22 per-cell document counts — the inequality score of
    the tile layout, companion to the q203 key-skew spectrum."""
    from .operators.indexing import gini_parts

    pts = doc_points(spark, sf_dir)
    cells = pts.groupBy(
        (
            F.shiftright(F.col("lat_i") + 900_000_000, 22) * 1024
            + F.shiftright(F.col("lon_i") + 1_800_000_000, 22)
        ).alias("id")
    ).agg(F.count("*").cast("long").alias("v"))
    return gini_parts(cells)


def q233_cover_compaction(spark, sf_dir):
    """Minimal-cover normalization of the occupied shift-22 cell
    set (operators/tiles.cover_compaction): complete 4-child
    families collapse to their parent for 2 levels, the
    S2/quadkey cell-union normalization — output covers exactly
    the input cells, area conserved."""
    from .operators.tiles import cover_compaction

    pts = doc_points(spark, sf_dir)
    cells = pts.select(
        F.shiftright(F.col("lat_i") + 900_000_000, 22).alias(
            "latb"
        ),
        F.shiftright(F.col("lon_i") + 1_800_000_000, 22).alias(
            "lonb"
        ),
    )
    return cover_compaction(cells, levels=2)


def q215_contour_cases(spark, sf_dir):
    """Marching-squares contour extraction over the shift-22
    density raster (operators/tiles.contour_cases): cells above
    the data-derived threshold (total div 128) classified into
    2x2 corner cases, plateaus and empties dropped so output
    follows the iso-line — the raster->vector step of the
    north-star tile materializer, exact integer case indices."""
    from .operators.tiles import contour_cases

    pts = doc_points(spark, sf_dir)
    cells = pts.groupBy(
        F.shiftright(F.col("lat_i") + 900_000_000, 22).alias(
            "latb"
        ),
        F.shiftright(F.col("lon_i") + 1_800_000_000, 22).alias(
            "lonb"
        ),
    ).agg(F.count("*").cast("long").alias("n"))
    thr = load(spark, sf_dir, "documents").count() // 128
    return contour_cases(cells, threshold=thr)


QUERIES = {
    "q01_bbox_filter": q01_bbox_filter,
    "q02_pip_border": q02_pip_border,
    "q03_assign_regions": q03_assign_regions,
    "q151_assign_rtree": q151_assign_rtree,
    "q04_cell_tiles": q04_cell_tiles,
    "q129_hex_heatmap": q129_hex_heatmap,
    "q134_geohash": q134_geohash,
    "q135_geohash_rollup": q135_geohash_rollup,
    "q137_border_distance": q137_border_distance,
    "q138_od_matrix": q138_od_matrix,
    "q142_density_clusters": q142_density_clusters,
    "q143_host_geo_spread": q143_host_geo_spread,
    "q144_region_text_stats": q144_region_text_stats,
    "q146_region_raster": q146_region_raster,
    "q147_raster_fidelity": q147_raster_fidelity,
    "q155_region_overlap": q155_region_overlap,
    "q05_knn_city": q05_knn_city,
    "q06_stats": q06_stats,
    "q07_key_freq": q07_key_freq,
    "q08_union_dedup": q08_union_dedup,
    "q09_subtract": q09_subtract,
    "q10_diff": q10_diff,
    "q11_token_count": q11_token_count,
    "q12_quality": q12_quality,
    "q52_repetition": q52_repetition,
    "q53_decontaminate": q53_decontaminate,
    "q56_chunk_dedup": q56_chunk_dedup,
    "q73_dup_spans": q73_dup_spans,
    "q74_bpe_pairs": q74_bpe_pairs,
    "q75_mix_plan": q75_mix_plan,
    "q76_dsir_lean": q76_dsir_lean,
    "q77_bpe_segment": q77_bpe_segment,
    "q148_bpe_learn": q148_bpe_learn,
    "q78_sessionize": q78_sessionize,
    "q114_retention_cohorts": q114_retention_cohorts,
    "q117_event_spikes": q117_event_spikes,
    "q150_interval_join": q150_interval_join,
    "q152_stay_points": q152_stay_points,
    "q153_colocation": q153_colocation,
    "q158_dense_daily": q158_dense_daily,
    "q159_home_cells": q159_home_cells,
    "q163_user_skyline": q163_user_skyline,
    "q118_star_rollup": q118_star_rollup,
    "q119_triangles": q119_triangles,
    "q121_grouped_quantiles": q121_grouped_quantiles,
    "q122_k_core": q122_k_core,
    "q123_tile_blur": q123_tile_blur,
    "q124_spatial_shards": q124_spatial_shards,
    "q125_transitions": q125_transitions,
    "q126_asof_enrich": q126_asof_enrich,
    "q127_assign_partitioned": q127_assign_partitioned,
    "q79_bloom_seen": q79_bloom_seen,
    "q80_lm_fluency": q80_lm_fluency,
    "q81_classifier_gate": q81_classifier_gate,
    "q82_kmeans_ivf_train": q82_kmeans_ivf_train,
    "q83_export_shards": q83_export_shards,
    "q108_weighted_sample": q108_weighted_sample,
    "q84_token_percentiles": q84_token_percentiles,
    "q85_inverted_index": q85_inverted_index,
    "q86_distinctive_terms": q86_distinctive_terms,
    "q87_ivf_trained": q87_ivf_trained,
    "q88_incremental_dedup": q88_incremental_dedup,
    "q89_pq_codes": q89_pq_codes,
    "q90_pq_adc_topk": q90_pq_adc_topk,
    "q91_hll_registers": q91_hll_registers,
    "q93_ivf_pq_topk": q93_ivf_pq_topk,
    "q94_pq_trained_codes": q94_pq_trained_codes,
    "q95_residual_ivf_pq": q95_residual_ivf_pq,
    "q96_corpus_delta": q96_corpus_delta,
    "q97_countmin_sketch": q97_countmin_sketch,
    "q98_countmin_estimates": q98_countmin_estimates,
    "q99_zorder_key": q99_zorder_key,
    "q115_hilbert_key": q115_hilbert_key,
    "q100_zorder_bbox": q100_zorder_bbox,
    "q116_hilbert_bbox": q116_hilbert_bbox,
    "q101_heavy_hitters": q101_heavy_hitters,
    "q102_ppl_buckets": q102_ppl_buckets,
    "q103_cover_assign": q103_cover_assign,
    "q104_city_knn": q104_city_knn,
    "q105_quantile_sketch": q105_quantile_sketch,
    "q92_hll_summary": q92_hll_summary,
    "q110_kmv_registers": q110_kmv_registers,
    "q111_kmv_intersect": q111_kmv_intersect,
    "q113_ranked_search": q113_ranked_search,
    "q13_lang_id": q13_lang_id,
    "q14_fingerprint": q14_fingerprint,
    "q15_dedup_exact": q15_dedup_exact,
    "q16_radius_pairs": q16_radius_pairs,
    "q17_ngram_jaccard": q17_ngram_jaccard,
    "q18_keep_filter": q18_keep_filter,
    "q19_keep_wildcards": q19_keep_wildcards,
    "q20_keep_tags": q20_keep_tags,
    "q21_tag_key_freq": q21_tag_key_freq,
    "q22_csv_projection": q22_csv_projection,
    **GRAPH_QUERIES,
    "q28_bbox_tags": q28_bbox_tags,
    **ML_QUERIES,
    "q33_modify_tags": q33_modify_tags,
    "q34_change_apply": q34_change_apply,
    "q35_media_metadata": q35_media_metadata,
    "q164_image_ahash": q164_image_ahash,
    "q165_image_neardup": q165_image_neardup,
    "q167_bmp_decode": q167_bmp_decode,
    "q168_wav_decode": q168_wav_decode,
    "q235_jpeg_decode": q235_jpeg_decode,
    "q169_bmp_ahash": q169_bmp_ahash,
    "q170_edit_neardup": q170_edit_neardup,
    "q171_cusum_alarms": q171_cusum_alarms,
    "q172_lpa_communities": q172_lpa_communities,
    "q173_power_iteration": q173_power_iteration,
    "q174_containment": q174_containment,
    "q175_quality_calibration": q175_quality_calibration,
    "q176_rendezvous_shards": q176_rendezvous_shards,
    "q177_sequence_funnel": q177_sequence_funnel,
    "q178_label_scatter": q178_label_scatter,
    "q179_segment_optimal": q179_segment_optimal,
    "q180_anchor_text": q180_anchor_text,
    "q181_robust_spikes": q181_robust_spikes,
    "q182_gps_jumps": q182_gps_jumps,
    "q185_burst_collapse": q185_burst_collapse,
    "q186_length_drift": q186_length_drift,
    "q187_seasonal_anomaly": q187_seasonal_anomaly,
    "q188_mirror_hosts": q188_mirror_hosts,
    "q189_pmi_pairs": q189_pmi_pairs,
    "q190_conflate_places": q190_conflate_places,
    "q191_crawl_plan": q191_crawl_plan,
    "q192_seed_pagerank": q192_seed_pagerank,
    "q193_robots_gate": q193_robots_gate,
    "q194_idw_surface": q194_idw_surface,
    "q195_spatial_outliers": q195_spatial_outliers,
    "q196_jaccard_prefix": q196_jaccard_prefix,
    "q197_url_templates": q197_url_templates,
    "q198_recrawl_estimate": q198_recrawl_estimate,
    "q199_skipgrams": q199_skipgrams,
    "q200_decayed_scores": q200_decayed_scores,
    "q201_sorted_neighborhood": q201_sorted_neighborhood,
    "q203_key_skew": q203_key_skew,
    "q204_crawl_pipeline": q204_crawl_pipeline,
    "q205_trend_slopes": q205_trend_slopes,
    "q206_olap_rollup": q206_olap_rollup,
    "q207_conflate_snapshots": q207_conflate_snapshots,
    "q208_hits_scores": q208_hits_scores,
    "q209_morans_i": q209_morans_i,
    "q210_linkage_scores": q210_linkage_scores,
    "q211_region_lift": q211_region_lift,
    "q212_haar_series": q212_haar_series,
    "q214_winsorized_stats": q214_winsorized_stats,
    "q215_contour_cases": q215_contour_cases,
    "q216_raster_morphology": q216_raster_morphology,
    "q218_histogram_emd": q218_histogram_emd,
    "q220_link_prediction": q220_link_prediction,
    "q221_weighted_median": q221_weighted_median,
    "q223_seq_patterns": q223_seq_patterns,
    "q224_survival_counts": q224_survival_counts,
    "q225_flow_directions": q225_flow_directions,
    "q226_snapshot_read": q226_snapshot_read,
    "q227_bitmap_cells": q227_bitmap_cells,
    "q228_bitmap_overlap": q228_bitmap_overlap,
    "q229_k_anonymity": q229_k_anonymity,
    "q230_apportion_budget": q230_apportion_budget,
    "q231_cluster_purity": q231_cluster_purity,
    "q232_cell_gini": q232_cell_gini,
    "q233_cover_compaction": q233_cover_compaction,
    "q36_geobase_build": q36_geobase_build,
    "q37_geocode_text": q37_geocode_text,
    "q40_tile_doc_lists": q40_tile_doc_lists,
    "q49_tile_raster": q49_tile_raster,
    "q50_tile_vector": q50_tile_vector,
    "q54_tile_pyramid": q54_tile_pyramid,
    "q136_quadtree_tiles": q136_quadtree_tiles,
    "q145_quadtree_incremental": q145_quadtree_incremental,
    "q58_tile_incremental": q58_tile_incremental,
    "q59_url_dedup": q59_url_dedup,
    "q60_host_stats": q60_host_stats,
    "q61_corpus_filter": q61_corpus_filter,
    "q62_stratified_sample": q62_stratified_sample,
    "q63_pack_plan": q63_pack_plan,
    "q64_tile_quality": q64_tile_quality,
    "q65_pii_scrub": q65_pii_scrub,
    "q66_blocklist": q66_blocklist,
    "q67_boilerplate": q67_boilerplate,
    "q68_host_pagerank": q68_host_pagerank,
    "q69_corpus_build": q69_corpus_build,
    "q70_funnel_report": q70_funnel_report,
    "q71_image_resize": q71_image_resize,
    "q72_frame_sample": q72_frame_sample,
    "q41_bpe_tokens": q41_bpe_tokens,
    "q42_stats_argmax": q42_stats_argmax,
    "q43_geocode_rank": q43_geocode_rank,
    **ADDR_QUERIES,
}


def _pyramid_oracle(levels: int = 4) -> str:
    per_level = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {lvl} AS level,"
        f" ((lat_i + {LAT_OFFSET}) >> {DEFAULT_SHIFT + lvl})"
        f" * {1 << _lon_bits(DEFAULT_SHIFT + lvl)}"
        f" + ((lon_i + {LON_OFFSET}) >> {DEFAULT_SHIFT + lvl})"
        f" AS cell FROM pts"
        for lvl in range(levels)
    )
    return f"""
WITH {_PTS_CTE},
c AS (
{per_level}
)
SELECT level, cell, COUNT(*) AS n_docs,
       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM c GROUP BY level, cell
"""


_Q59_ORACLE = r"""
WITH crawls AS (
  SELECT doc_id, g
  FROM documents,
       UNNEST(range(CASE WHEN doc_id % 7 = 0 THEN 3 ELSE 1 END)) AS t(g)
),
raw AS (
  SELECT doc_id,
    (CASE WHEN (doc_id+g)%2=0 THEN 'HTTPS' ELSE 'https' END) || '://'
    || (CASE WHEN (doc_id+g)%3=0 THEN 'HoSt' ELSE 'host' END)
    || CAST(doc_id%23 AS VARCHAR)
    || (CASE WHEN (doc_id+g)%3=0 THEN '.Example.COM'
        ELSE '.example.com' END)
    || (CASE WHEN (doc_id+g)%5=0 THEN ':443' ELSE '' END)
    || '/p/' || CAST(doc_id AS VARCHAR)
    || (CASE WHEN (doc_id+g)%4=0 THEN '/' ELSE '' END)
    || (CASE WHEN doc_id%3=0 THEN
          (CASE WHEN (doc_id+g)%2=0 THEN '?b=2&a=1'
           ELSE '?a=1&b=2' END) ELSE '' END)
    || (CASE WHEN (doc_id+g)%6=0 THEN '#s' || CAST(g AS VARCHAR)
        ELSE '' END) AS url,
    doc_id*3 + g*1000000 AS warc_ts
  FROM crawls
),
canon AS (
  SELECT doc_id, warc_ts,
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*):', 1))
    || '://'
    || lower(regexp_extract(regexp_extract(url,
         '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1), '^([^:]*)', 1))
    || (CASE WHEN regexp_extract(regexp_extract(url,
          '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1),
          ':([0-9]+)$', 1)
        IN ('', CASE lower(regexp_extract(url,
              '^([A-Za-z][A-Za-z0-9+.\-]*):', 1))
            WHEN 'https' THEN '443' WHEN 'http' THEN '80'
            ELSE '' END)
        THEN '' ELSE ':' || regexp_extract(regexp_extract(url,
          '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1),
          ':([0-9]+)$', 1) END)
    || (CASE WHEN regexp_replace(regexp_extract(url,
          '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1),
          '/+$', '') = ''
        THEN '/' ELSE regexp_replace(regexp_extract(url,
          '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1),
          '/+$', '') END)
    || (CASE WHEN regexp_extract(url, '\?([^#]*)', 1) = '' THEN ''
        ELSE '?' || array_to_string(list_sort(string_split(
          regexp_extract(url, '\?([^#]*)', 1), '&')), '&') END)
    AS url_canon
  FROM raw
)
SELECT url_canon, arg_max(doc_id, warc_ts) AS doc_id,
       COUNT(*) AS n_crawls, MAX(warc_ts) AS last_ts
FROM canon GROUP BY 1
"""

def _q61_sql(
    src: str = "documents",
    min_len: int = 300,
    max_dup: float = 0.2,
    lang: str = "en",
) -> str:
    """The corpus-filter-verdict oracle over an arbitrary source
    CTE/table `src` (so the composed pipeline oracle q69 can apply
    it to cleaned+scrubbed text, not just raw documents)."""
    return f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM {src}
),
g AS (
  SELECT doc_id,
    CASE WHEN len(t) >= 3 THEN list_transform(
      range(1, len(t) - 1),
      i -> t[i] || chr(31) || t[i+1] || chr(31) || t[i+2])
    ELSE CAST([] AS VARCHAR[]) END AS g
  FROM t
),
sc AS (
  SELECT doc_id,
    length(' ' || text || ' ')
      - length(replace(' ' || text || ' ', ' the ', ' ')) AS s_en,
    length(' ' || text || ' ')
      - length(replace(' ' || text || ' ', ' der ', ' ')) AS s_de,
    length(' ' || text || ' ')
      - length(replace(' ' || text || ' ', ' le ', ' ')) AS s_fr,
    length(text) AS tl,
    md5(substr(text, 1, 40)) AS fp
  FROM {src}
),
m AS (
  SELECT sc.doc_id,
    (CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en > 0 THEN 'en'
          WHEN s_de >= s_fr AND s_de > 0 THEN 'de'
          WHEN s_fr > 0 THEN 'fr' ELSE 'und' END) = '{lang}'
      AS lang_ok,
    tl >= {min_len} AS len_ok,
    (CASE WHEN len(g.g) > 0
          THEN 1.0 - len(list_distinct(g.g)) / len(g.g)
          ELSE 0.0 END) <= {max_dup} AS rep_ok,
    fp
  FROM sc JOIN g ON sc.doc_id = g.doc_id
),
k AS (SELECT fp, MIN(doc_id) AS keeper FROM m GROUP BY 1)
SELECT m.doc_id, lang_ok, len_ok, rep_ok,
       m.doc_id = k.keeper AS dedup_ok,
       lang_ok AND len_ok AND rep_ok AND (m.doc_id = k.keeper)
         AS keep
FROM m JOIN k USING (fp)
"""


_Q61_ORACLE = _q61_sql()

# the composed corpus-build oracle: q67's cleaning + q65's scrub +
# the parameterized q61 verdict + q62's hash mix + q63's prefix sum
_Q69_STACK = (
    """
WITH docs2 AS (
  SELECT doc_id, lang, concat_ws(chr(10),
    'NAV HOME ABOUT CONTACT',
    substr(text, 1, 60),
    CASE WHEN doc_id % 2 = 0 THEN 'COPYRIGHT 2026 EXAMPLE CORP' END,
    CASE WHEN doc_id % 10 = 0 THEN 'SHARE LIKE SUBSCRIBE' END,
    'tail ' || CAST(doc_id AS VARCHAR) || ' contact user'
      || CAST(doc_id AS VARCHAR) || '@mail'
      || CAST(doc_id % 5 AS VARCHAR) || '.example.com') AS text
  FROM documents
),
split_l AS (
  SELECT doc_id, string_split(text, chr(10)) AS l FROM docs2
),
lines AS (
  SELECT doc_id, unnest(l) AS line,
         generate_subscripts(l, 1) AS pos
  FROM split_l
),
freq AS (
  SELECT line, COUNT(DISTINCT doc_id) AS n_docs
  FROM lines GROUP BY 1
),
boiler AS (
  SELECT line FROM freq
  WHERE n_docs > (SELECT COUNT(*) FROM documents) * 0.3
),
keptl AS (
  SELECT doc_id, pos, line FROM lines
  WHERE line NOT IN (SELECT line FROM boiler)
),
reb AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos)
    AS clean_text
  FROM keptl GROUP BY 1
),
cleaned AS (
  SELECT d.doc_id, COALESCE(r.clean_text, '') AS text
  FROM docs2 d LEFT JOIN reb r ON d.doc_id = r.doc_id
),
scrubbed AS (
  SELECT doc_id,
    regexp_replace(regexp_replace(regexp_replace(text,
      '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}',
      '<EMAIL>', 'g'),
      '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'),
      '\\b\\d{3}-\\d{3}-\\d{4}\\b', '<PHONE>', 'g') AS text
  FROM cleaned
),
verdict AS (
"""
    + _q61_sql("scrubbed", 80, 0.2, "en")
    + """
),
kept AS (
  SELECT s.doc_id, s.text, d.lang
  FROM scrubbed s
  JOIN verdict v ON s.doc_id = v.doc_id
  JOIN documents d ON s.doc_id = d.doc_id
  WHERE v.keep
),
mixed AS (
  SELECT * FROM kept
  WHERE ((doc_id + 11) * 2654435761) % 4294967296
      < (CASE lang WHEN 'en' THEN 0.9 WHEN 'de' THEN 0.6
          ELSE 0.5 END) * 4294967296
),
toks AS (
  SELECT doc_id, lang,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM mixed
),
packed AS (
  SELECT doc_id, lang, n_tokens,
    CAST(SUM(n_tokens) OVER (ORDER BY doc_id) AS BIGINT)
      AS cum_tokens
  FROM toks
)
"""
)

_Q69_ORACLE = (
    _Q69_STACK
    + """
SELECT doc_id, lang, n_tokens, cum_tokens,
  (cum_tokens - n_tokens) // 512 AS bin
FROM packed
"""
)


# the funnel-report oracle: same stack, twelve scalar subqueries
_Q70_ORACLE = (
    _Q69_STACK
    + """
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM docs2) AS n_docs,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lines) AS n_lines,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM keptl) AS n_lines_kept,
  (SELECT CAST(COALESCE(SUM(len(regexp_extract_all(text,
     '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}'))), 0)
     AS BIGINT) FROM cleaned) AS n_emails,
  (SELECT CAST(COUNT(*) FILTER (WHERE keep) AS BIGINT)
     FROM verdict) AS n_keep,
  (SELECT CAST(COUNT(*) FILTER (WHERE NOT lang_ok) AS BIGINT)
     FROM verdict) AS n_fail_lang,
  (SELECT CAST(COUNT(*) FILTER (WHERE NOT len_ok) AS BIGINT)
     FROM verdict) AS n_fail_len,
  (SELECT CAST(COUNT(*) FILTER (WHERE NOT rep_ok) AS BIGINT)
     FROM verdict) AS n_fail_rep,
  (SELECT CAST(COUNT(*) FILTER (WHERE NOT dedup_ok) AS BIGINT)
     FROM verdict) AS n_fail_dedup,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM mixed) AS n_mixed,
  (SELECT CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM toks)
     AS total_tokens,
  (SELECT CAST(COUNT(DISTINCT (cum_tokens - n_tokens) // 512)
     AS BIGINT) FROM packed) AS n_bins
"""
)


_Q60_ORACLE = """
WITH raw AS (
  SELECT doc_id,
    (CASE WHEN doc_id%5=0 THEN 'www.'
          WHEN doc_id%7=0 THEN 'sub' || CAST(doc_id%3 AS VARCHAR)
            || '.'
          ELSE '' END)
    || 'host' || CAST(doc_id%23 AS VARCHAR)
    || (CASE doc_id%4 WHEN 0 THEN '.example.com'
         WHEN 1 THEN '.co.uk' WHEN 2 THEN '.org'
         ELSE '.com.au' END) AS host
  FROM documents
),
reg AS (
  SELECT host,
    CASE WHEN len(string_split(host, '.')) <= 2 THEN host
         WHEN array_to_string(list_slice(string_split(host, '.'),
             len(string_split(host, '.')) - 1,
             len(string_split(host, '.'))), '.')
           IN ('co.uk','org.uk','ac.uk','gov.uk','com.au','net.au',
               'org.au','co.jp','ne.jp','or.jp','com.br','com.cn',
               'co.in','co.kr','com.mx')
         THEN array_to_string(list_slice(string_split(host, '.'),
             len(string_split(host, '.')) - 2,
             len(string_split(host, '.'))), '.')
         ELSE array_to_string(list_slice(string_split(host, '.'),
             len(string_split(host, '.')) - 1,
             len(string_split(host, '.'))), '.')
    END AS reg_domain
  FROM raw
)
SELECT reg_domain, COUNT(*) AS n_pages,
       COUNT(DISTINCT host) AS n_hosts
FROM reg GROUP BY 1
"""

_Q73_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
sh AS (
  SELECT doc_id,
    unnest(CASE WHEN len(w) >= 5 THEN range(0, len(w) - 4)
           ELSE CAST([] AS BIGINT[]) END) AS pos,
    unnest(CASE WHEN len(w) >= 5 THEN list_transform(
             range(0, len(w) - 4),
             i -> array_to_string(w[i+1:i+5], chr(31)))
           ELSE CAST([] AS VARCHAR[]) END) AS s
  FROM t
),
d AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) >= 2),
occ AS (SELECT doc_id, pos FROM sh JOIN d USING (s)),
cov AS (
  SELECT DISTINCT doc_id, pos + u.j AS tok
  FROM occ CROSS JOIN (SELECT unnest(range(0, 5)) AS j) u
),
isl AS (
  SELECT doc_id, tok,
    tok - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tok) AS g
  FROM cov
),
st AS (
  SELECT doc_id, COUNT(*) AS dup_tokens,
         COUNT(DISTINCT g) AS n_dup_spans
  FROM isl GROUP BY doc_id
)
SELECT t.doc_id,
  CAST(len(t.w) AS BIGINT) AS n_tokens,
  CAST(COALESCE(st.dup_tokens, 0) AS BIGINT) AS dup_tokens,
  CAST(COALESCE(st.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
  ROUND(COALESCE(st.dup_tokens, 0) / len(t.w), 6) AS dup_ratio
FROM t LEFT JOIN st USING (doc_id)
"""

_Q56_ORACLE = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 2000000,
         array_to_string((string_split(text, ' '))[1:32], ' ')
  FROM documents WHERE doc_id % 11 = 0
),
t AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
ch AS (
  SELECT doc_id, unnest(
    CASE WHEN len(w) >= 8 THEN list_transform(
      range(0, len(w) // 8),
      i -> array_to_string(w[i*8+1:i*8+8], ' '))
    ELSE CAST([] AS VARCHAR[]) END) AS chunk
  FROM t
),
pc AS (SELECT chunk, COUNT(DISTINCT doc_id) AS nd FROM ch
       GROUP BY chunk),
j AS (SELECT ch.doc_id, pc.nd FROM ch JOIN pc USING (chunk))
SELECT doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_chunks,
  CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_dup_chunks,
  ROUND(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) / COUNT(*), 6)
    AS dup_chunk_ratio
FROM j GROUP BY doc_id
"""


def oracle_sqls() -> dict[str, str]:
    shift = DEFAULT_SHIFT
    lon_bits = _lon_bits(shift)
    cities = _cities_values()
    return {
        **graph_oracle_sqls(_PTS_CTE),
        "q28_bbox_tags": bbox_oracle_sql(_PTS_CTE, _GRAPH_CTES),
        **ml_oracle_sqls(),
        **addr_oracle_sqls(),
        "q33_modify_tags": f"""
WITH {_TAGS_CTE}
SELECT doc_id, {modify_sql_tags_str(
    parse_modify(_MODIFY_ARG),
    lambda k: f'"{k}"',
    TAG_KEYS,
)} AS tags_str
FROM tg
""",
        "q34_change_apply": """
WITH changes AS (
  SELECT doc_id, 'upd ' || text AS text, (doc_id % 13 = 0) AS deleted
  FROM documents WHERE doc_id % 9 = 0 OR doc_id % 13 = 0
  UNION ALL
  SELECT doc_id + 2000000, 'new ' || text, FALSE
  FROM documents WHERE doc_id < 50
)
SELECT d.doc_id, d.text FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM changes)
UNION ALL
SELECT doc_id, text FROM changes WHERE NOT deleted
""",
        "q35_media_metadata": """
SELECT doc_id,
  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
  CASE WHEN doc_id % 2 = 0
       THEN 16 + (doc_id * 7) % 240 END AS width,
  CASE WHEN doc_id % 2 = 0
       THEN 16 + (doc_id * 13) % 240 END AS height,
  CASE WHEN doc_id % 2 = 1
       THEN 8000 + (doc_id % 5) * 8000 END AS sample_rate,
  CASE WHEN doc_id % 2 = 1
       THEN 1000 + (doc_id * 31) % 50000 END AS n_samples,
  12 + doc_id % 32 AS n_bytes
FROM documents
""",
        # aHash bits recomputed from doc_id arithmetic (the fake
        # luma is a pure function of decoded w/h; see
        # multimodal.image_ahash) — the oracle never sees payloads
        "q164_image_ahash": """
WITH dims AS (
  SELECT doc_id, 16 + (doc_id * 7) % 240 AS w,
         16 + (doc_id * 13) % 240 AS h
  FROM documents WHERE doc_id % 2 = 0
),
cells AS (
  SELECT d.doc_id, yy.y * 8 + xx.x AS idx,
    ((xx.x * d.w // 8) * 31 + (yy.y * d.h // 8) * 17
      + (xx.x * d.w // 8) * (yy.y * d.h // 8)) % 256 AS v
  FROM dims d
  CROSS JOIN (SELECT unnest(range(0, 8)) AS x) xx
  CROSS JOIN (SELECT unnest(range(0, 8)) AS y) yy
),
means AS (
  SELECT doc_id, SUM(v) // 64 AS mean FROM cells GROUP BY 1
),
bits AS (
  SELECT c.doc_id, c.idx,
    CASE WHEN c.v > m.mean THEN 1 ELSE 0 END AS bit
  FROM cells c JOIN means m USING (doc_id)
)
SELECT doc_id,
  CAST(SUM(CASE WHEN idx >= 32
    THEN bit * (CAST(1 AS BIGINT) << (idx - 32)) ELSE 0 END)
    AS BIGINT) AS ahash_hi,
  CAST(SUM(CASE WHEN idx < 32
    THEN bit * (CAST(1 AS BIGINT) << idx) ELSE 0 END)
    AS BIGINT) AS ahash_lo
FROM bits GROUP BY 1
""",
        # banded-LSH candidates + exact Hamming verify, mirroring
        # ahash_neardup_pairs' reported-set contract exactly
        "q165_image_neardup": """
WITH dims AS (
  SELECT doc_id, 16 + (doc_id * 7) % 240 AS w,
         16 + (doc_id * 13) % 240 AS h
  FROM documents WHERE doc_id % 2 = 0
),
cells AS (
  SELECT d.doc_id, yy.y * 8 + xx.x AS idx,
    ((xx.x * d.w // 8) * 31 + (yy.y * d.h // 8) * 17
      + (xx.x * d.w // 8) * (yy.y * d.h // 8)) % 256 AS v
  FROM dims d
  CROSS JOIN (SELECT unnest(range(0, 8)) AS x) xx
  CROSS JOIN (SELECT unnest(range(0, 8)) AS y) yy
),
means AS (
  SELECT doc_id, SUM(v) // 64 AS mean FROM cells GROUP BY 1
),
bits AS (
  SELECT c.doc_id, c.idx,
    CASE WHEN c.v > m.mean THEN 1 ELSE 0 END AS bit
  FROM cells c JOIN means m USING (doc_id)
),
hashes AS (
  SELECT doc_id,
    CAST(SUM(CASE WHEN idx >= 32
      THEN bit * (CAST(1 AS BIGINT) << (idx - 32)) ELSE 0 END)
      AS BIGINT) AS hi,
    CAST(SUM(CASE WHEN idx < 32
      THEN bit * (CAST(1 AS BIGINT) << idx) ELSE 0 END)
      AS BIGINT) AS lo
  FROM bits GROUP BY 1
),
bands AS (
  SELECT doc_id, hi, lo, b.band_idx,
    CASE b.band_idx WHEN 0 THEN lo % 65536
                    WHEN 1 THEN lo >> 16
                    WHEN 2 THEN hi % 65536
                    ELSE hi >> 16 END AS band_val
  FROM hashes
  CROSS JOIN (SELECT unnest(range(0, 4)) AS band_idx) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.hi AS hi_a, a.lo AS lo_a, b.hi AS hi_b, b.lo AS lo_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
  CAST(bit_count(xor(hi_a, hi_b))
     + bit_count(xor(lo_a, lo_b)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) <= 6
""",
        # exact pixel-channel sums recomputed from the planting
        # arithmetic (pixel (x,y) of doc d: B=(x*3+y*7+d)%256,
        # G=(x*5+y*11+2d)%256, R=(x*13+y*17+3d)%256) — validates
        # the REAL BMP decode (offset/stride/row-order) end to end
        "q167_bmp_decode": """
WITH dims AS (
  SELECT doc_id, 4 + (doc_id * 7) % 29 AS w,
         4 + (doc_id * 13) % 23 AS h
  FROM documents WHERE doc_id % 2 = 0
),
px AS (
  SELECT d.doc_id, d.w, d.h,
         (xx.x * 3 + yy.y * 7 + d.doc_id) % 256 AS b,
         (xx.x * 5 + yy.y * 11 + d.doc_id * 2) % 256 AS g,
         (xx.x * 13 + yy.y * 17 + d.doc_id * 3) % 256 AS r
  FROM dims d
  CROSS JOIN (SELECT unnest(range(0, 33)) AS x) xx
  CROSS JOIN (SELECT unnest(range(0, 27)) AS y) yy
  WHERE xx.x < d.w AND yy.y < d.h
)
SELECT doc_id,
  CAST(MIN(w) AS BIGINT) AS width,
  CAST(MIN(h) AS BIGINT) AS height,
  CAST(SUM(b) AS BIGINT) AS sum_b,
  CAST(SUM(g) AS BIGINT) AS sum_g,
  CAST(SUM(r) AS BIGINT) AS sum_r
FROM px GROUP BY 1
""",
        # exact PCM statistics from the sample planting
        # s[i] = ((d*7 + i*13) % 2001) - 1000 — validates the REAL
        # RIFF chunk walk + int16 decode end to end
        # decoded-JPEG pixel stats from the block-level closed form
        # min(l + l % 2, 255) — the DC-only quantization round trip
        # (operators/jpeg.py docstring derivation)
        "q235_jpeg_decode": """
WITH jdims AS (
  SELECT doc_id, 2 + doc_id % 5 AS bw, 2 + (doc_id * 3) % 4 AS bh
  FROM documents WHERE doc_id % 3 = 0
),
jblk AS (
  SELECT d.doc_id, d.bw, d.bh,
    LEAST((bx.x * 31 + by.y * 53 + d.doc_id * 11) % 256
          + ((bx.x * 31 + by.y * 53 + d.doc_id * 11) % 256) % 2,
          255) AS px
  FROM jdims d
  CROSS JOIN (SELECT unnest(range(0, 6)) AS x) bx
  CROSS JOIN (SELECT unnest(range(0, 5)) AS y) by
  WHERE bx.x < d.bw AND by.y < d.bh
)
SELECT doc_id,
  CAST(MIN(bw) * 8 AS BIGINT) AS width,
  CAST(MIN(bh) * 8 AS BIGINT) AS height,
  CAST(SUM(px) * 64 AS BIGINT) AS sum_px,
  CAST(MIN(px) AS BIGINT) AS min_px,
  CAST(MAX(px) AS BIGINT) AS max_px
FROM jblk GROUP BY 1
""",
        "q168_wav_decode": """
WITH p AS (
  SELECT doc_id, 8000 + (doc_id % 4) * 4000 AS rate,
         200 + (doc_id * 31) % 800 AS n
  FROM documents WHERE doc_id % 2 = 1
),
s AS (
  SELECT p.doc_id, p.rate, p.n,
         ((p.doc_id * 7 + i.i * 13) % 2001) - 1000 AS v
  FROM p
  CROSS JOIN (SELECT unnest(range(0, 1000)) AS i) i
  WHERE i.i < p.n
)
SELECT doc_id,
  CAST(MIN(rate) AS BIGINT) AS sample_rate,
  CAST(MIN(n) AS BIGINT) AS n_samples,
  CAST(MAX(ABS(v)) AS BIGINT) AS peak,
  CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
  CAST(SUM(v * v) AS BIGINT) AS sum_sq
FROM s GROUP BY 1
""",
        # the REAL-pixel aHash rebuilt from the planting formula:
        # luma(x,y) = B*114 + G*587 + R*299 with the q167 channel
        # arithmetic; block (x*8//w, y*8//h) average pooling, all
        # integer division — bit-for-bit the bmp_ahash pipeline
        "q169_bmp_ahash": """
WITH dims AS (
  SELECT doc_id, 4 + (doc_id * 7) % 29 AS w,
         4 + (doc_id * 13) % 23 AS h
  FROM documents WHERE doc_id % 2 = 0
),
px AS (
  SELECT d.doc_id, d.w, d.h,
         (yy.y * 8 // d.h) * 8 + (xx.x * 8 // d.w) AS blk,
         ((xx.x * 3 + yy.y * 7 + d.doc_id) % 256) * 114
       + ((xx.x * 5 + yy.y * 11 + d.doc_id * 2) % 256) * 587
       + ((xx.x * 13 + yy.y * 17 + d.doc_id * 3) % 256) * 299 AS l
  FROM dims d
  CROSS JOIN (SELECT unnest(range(0, 33)) AS x) xx
  CROSS JOIN (SELECT unnest(range(0, 27)) AS y) yy
  WHERE xx.x < d.w AND yy.y < d.h
),
blocks AS (
  SELECT doc_id, blk, SUM(l) // COUNT(*) AS val
  FROM px GROUP BY 1, 2
),
means AS (
  SELECT doc_id, SUM(val) // 64 AS mean FROM blocks GROUP BY 1
),
bits AS (
  SELECT b.doc_id, b.blk AS idx,
         CASE WHEN b.val > m.mean THEN 1 ELSE 0 END AS bit
  FROM blocks b JOIN means m USING (doc_id)
)
SELECT doc_id,
  CAST(SUM(CASE WHEN idx >= 32
    THEN bit * (CAST(1 AS BIGINT) << (idx - 32)) ELSE 0 END)
    AS BIGINT) AS ahash_hi,
  CAST(SUM(CASE WHEN idx < 32
    THEN bit * (CAST(1 AS BIGINT) << idx) ELSE 0 END)
    AS BIGINT) AS ahash_lo
FROM bits GROUP BY 1
""",
        # quadratic by design: the definition of the result, free of
        # the engine's deletion-key blocking, so a hash match proves
        # the blocking recalls every qualifying pair
        "q170_edit_neardup": """
WITH t AS (
  SELECT doc_id, substr(text, 1, 40) AS title FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(levenshtein(a.title, b.title) AS BIGINT) AS edit_dist
FROM t a JOIN t b ON a.doc_id < b.doc_id
WHERE levenshtein(a.title, b.title) <= 1
""",
        "q71_image_resize": """
WITH dims AS (
  SELECT doc_id,
    16 + (doc_id * 7) % 240 AS w,
    16 + (doc_id * 13) % 240 AS h
  FROM documents WHERE doc_id % 2 = 0
)
SELECT doc_id,
  CAST(CASE WHEN GREATEST(w, h) <= 64 THEN w
       ELSE GREATEST(1, w * 64 // GREATEST(w, h)) END AS BIGINT)
    AS width,
  CAST(CASE WHEN GREATEST(w, h) <= 64 THEN h
       ELSE GREATEST(1, h * 64 // GREATEST(w, h)) END AS BIGINT)
    AS height
FROM dims
""",
        "q72_frame_sample": """
WITH vids AS (
  SELECT doc_id,
    4 + (doc_id * 3) % 28 AS n_frames,
    8 + doc_id % 16 AS frame_len
  FROM documents
)
SELECT doc_id,
  CAST(unnest(range(0, n_frames, 4)) AS BIGINT) AS frame_idx,
  CAST(frame_len AS BIGINT) AS frame_len,
  CAST((doc_id + unnest(range(0, n_frames, 4))) % 256 AS BIGINT)
    AS byte_val
FROM vids
""",
        "q40_tile_doc_lists": f"""
WITH {_PTS_CTE}
SELECT ((lat_i + {LAT_OFFSET}) >> {shift}) * {1 << lon_bits}
       + ((lon_i + {LON_OFFSET}) >> {shift}) AS cell,
       COUNT(*) AS n_docs,
       array_to_string(list_sort(list(doc_id)), ',') AS ids_str
FROM pts GROUP BY 1
""",
        "q54_tile_pyramid": _pyramid_oracle(),
        "q136_quadtree_tiles": _quadtree_oracle_sql(),
        "q145_quadtree_incremental": _quadtree_oracle_sql(
            src="applied", extra=_QT_CHANGES_CTE
        ),
        "q58_tile_incremental": f"""
WITH {_PTS_CTE},
changes AS (
  SELECT doc_id, lat_i + 1000000 AS lat_i, lon_i,
         doc_id % 17 = 0 AS deleted
  FROM pts WHERE doc_id % 11 = 0 OR doc_id % 17 = 0
  UNION ALL
  SELECT doc_id + 3000000, lat_i + 2000000, lon_i + 1500000, FALSE
  FROM pts WHERE doc_id < 40
),
applied AS (
  SELECT doc_id, lat_i, lon_i FROM pts
  WHERE doc_id NOT IN (SELECT doc_id FROM changes)
  UNION ALL
  SELECT doc_id, lat_i, lon_i FROM changes WHERE NOT deleted
)
SELECT ((lat_i + {LAT_OFFSET}) >> {shift}) * {1 << lon_bits}
       + ((lon_i + {LON_OFFSET}) >> {shift}) AS cell,
       COUNT(*) AS n_docs, MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM applied GROUP BY 1
""",
        "q64_tile_quality": f"""
WITH {_PTS_CTE},
v AS ({_Q61_ORACLE}),
c AS (
  SELECT p.doc_id,
    ((lat_i + {LAT_OFFSET}) >> {shift}) * {1 << lon_bits}
    + ((lon_i + {LON_OFFSET}) >> {shift}) AS cell,
    v.keep
  FROM pts p JOIN v ON p.doc_id = v.doc_id
)
SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
  ROUND(SUM(CASE WHEN keep THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
    AS keep_rate
FROM c GROUP BY 1
""",
        "q49_tile_raster": f"""
WITH {_PTS_CTE},
cp AS (
  SELECT ((lat_i + {LAT_OFFSET}) >> {shift}) * {1 << lon_bits}
         + ((lon_i + {LON_OFFSET}) >> {shift}) AS cell,
    (((lat_i + {LAT_OFFSET}) // 1024) % 16) * 16
      + ((lon_i + {LON_OFFSET}) // 1024) % 16 AS pix
  FROM pts
),
counts AS (SELECT cell, pix, COUNT(*) AS n FROM cp GROUP BY 1, 2),
cells AS (SELECT DISTINCT cell FROM counts),
series AS (SELECT unnest(range(0, 256)) AS p),
dense AS (
  SELECT c.cell, s.p, COALESCE(ct.n, 0) AS v
  FROM cells c CROSS JOIN series s
  LEFT JOIN counts ct ON ct.cell = c.cell AND ct.pix = s.p
)
SELECT cell, CAST(SUM(v) AS BIGINT) AS n_docs,
  string_agg(CAST(v AS VARCHAR), ',' ORDER BY p) AS grid_str
FROM dense GROUP BY cell
""",
        "q50_tile_vector": f"""
WITH {_PTS_CTE},
cp AS (
  SELECT ((lat_i + {LAT_OFFSET}) >> {shift}) * {1 << lon_bits}
         + ((lon_i + {LON_OFFSET}) >> {shift}) AS cell,
    (((lat_i + {LAT_OFFSET}) // 1024) % 16) * 16
      + ((lon_i + {LON_OFFSET}) // 1024) % 16 AS pix
  FROM pts
),
counts AS (SELECT cell, pix, COUNT(*) AS n FROM cp GROUP BY 1, 2)
SELECT cell, pix,
  (cell % {1 << lon_bits}) * {1 << shift}
    + (pix % 16) * 1024 - {LON_OFFSET} AS x1,
  (cell // {1 << lon_bits}) * {1 << shift}
    + (pix // 16) * 1024 - {LAT_OFFSET} AS y1,
  (cell % {1 << lon_bits}) * {1 << shift}
    + (pix % 16) * 1024 - {LON_OFFSET} + 1023 AS x2,
  (cell // {1 << lon_bits}) * {1 << shift}
    + (pix // 16) * 1024 - {LAT_OFFSET} + 1023 AS y2,
  n
FROM counts
""",
        "q41_bpe_tokens": """
SELECT doc_id,
  CAST(len(regexp_extract_all(text,
       '([A-Za-z0-9]+|[^A-Za-z0-9 ])', 1)) AS BIGINT)
    AS n_bpe_tokens,
  CAST(len(list_distinct(regexp_extract_all(text,
       '([A-Za-z0-9]+|[^A-Za-z0-9 ])', 1))) AS BIGINT)
    AS n_unique_tokens
FROM documents
""",
        "q42_stats_argmax": f"""
WITH {_PTS_CTE},
{_GRAPH_CTES},
wc AS (SELECT way_id, COUNT(*) AS n_refs FROM wrefs GROUP BY 1)
SELECT COUNT(*) AS n_ways, MIN(way_id) AS min_way,
       MAX(way_id) AS max_way, MAX(n_refs) AS max_refs,
       (SELECT way_id FROM wc
        ORDER BY n_refs DESC, way_id LIMIT 1) AS argmax_refs_way
FROM wc
""",
        "q43_geocode_rank": _PLACED_CTE + """,
pairs AS (
  SELECT doc_id FROM documents
  WHERE doc_id < (SELECT MAX(doc_id) FROM documents)
),
cand AS (
  SELECT d.doc_id, p.city_idx AS term_idx
  FROM pairs d JOIN placed p ON p.doc_id = d.doc_id
  UNION
  SELECT d.doc_id, p.city_idx
  FROM pairs d JOIN placed p ON p.doc_id = d.doc_id + 1
),
ranked AS (
  SELECT doc_id, term_idx, (term_idx % 17) + 1 AS weight,
    ROW_NUMBER() OVER (PARTITION BY doc_id
      ORDER BY (term_idx % 17) + 1 DESC, term_idx ASC) AS rank
  FROM cand
)
SELECT doc_id,
  'City' || lpad(CAST(term_idx AS VARCHAR), 2, '0') AS term,
  CAST(weight AS BIGINT) AS weight, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 25
""",
        "q36_geobase_build": _PLACED_CTE + """
SELECT 'City' || lpad(CAST(city_idx AS VARCHAR), 2, '0') AS term,
       COUNT(*) AS n_docs, MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM placed GROUP BY city_idx
""",
        "q37_geocode_text": _PLACED_CTE + """
SELECT doc_id,
  CAST(472500000 + 4700000 * (city_idx // 10) AS BIGINT) AS lat_i,
  CAST(102500000 + 3800000 * (city_idx % 10) AS BIGINT) AS lon_i
FROM placed
""",
        "q01_bbox_filter": f"""
WITH {_PTS_CTE}
SELECT doc_id, lat_i, lon_i FROM pts
WHERE lon_i >= 110000000 AND lon_i <= 125000000
  AND lat_i >= 480000000 AND lat_i <= 495000000
""",
        "q02_pip_border": pip_oracle_sql(),
        "q03_assign_regions": assign_oracle_sql(),
        "q151_assign_rtree": assign_oracle_sql(),
        # same semantics, different physical plan (no broadcast):
        # the oracle is intentionally shared with q03
        "q127_assign_partitioned": assign_oracle_sql(),
        "q04_cell_tiles": f"""
WITH {_PTS_CTE}
SELECT ((lat_i + {LAT_OFFSET}) >> {shift}) * {1 << lon_bits}
       + ((lon_i + {LON_OFFSET}) >> {shift}) AS cell,
       COUNT(*) AS n_docs, MIN(doc_id) AS min_doc
FROM pts GROUP BY 1
""",
        # two-sublattice integer-Voronoi hex binning: a = 2^19,
        # b = round(a*sqrt(3)); all offsets non-negative so // ==
        # Spark div; argmin by tuple (d2, cv, cu), same as the
        # operator's struct least()
        "q129_hex_heatmap": _hex_oracle_sql(),
        "q134_geohash": _geohash_oracle_sql(),
        "q135_geohash_rollup": _geohash_rollup_oracle_sql(),
        "q137_border_distance": _border_distance_oracle_sql(),
        "q138_od_matrix": _od_matrix_oracle_sql(),
        "q142_density_clusters": _density_oracle_sql(),
        "q143_host_geo_spread": _Q143_ORACLE,
        "q144_region_text_stats": _region_text_oracle_sql(),
        "q146_region_raster": _region_raster_oracle_sql(),
        "q155_region_overlap": _region_overlap_oracle_sql(),
        "q147_raster_fidelity": _raster_fidelity_oracle_sql(),
        "q05_knn_city": f"""
WITH {_PTS_CTE},
cities(neighbor, clat, clon) AS (VALUES {cities}),
d AS (
  SELECT p.doc_id, c.neighbor,
    (p.lat_i - c.clat) * (p.lat_i - c.clat)
      + (p.lon_i - c.clon) * (p.lon_i - c.clon) AS dist2,
    ROW_NUMBER() OVER (PARTITION BY p.doc_id ORDER BY
      (p.lat_i - c.clat) * (p.lat_i - c.clat)
        + (p.lon_i - c.clon) * (p.lon_i - c.clon) ASC,
      c.neighbor ASC) AS rank
  FROM pts p CROSS JOIN cities c
)
SELECT doc_id, neighbor, dist2, rank FROM d WHERE rank <= 3
""",
        "q06_stats": """
SELECT COUNT(*) AS n_events,
       MIN(event_id) AS min_event_id,
       MAX(event_id) AS max_event_id,
       MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS min_ts_epoch,
       MAX(CAST(floor(epoch(ts)) AS BIGINT)) AS max_ts_epoch,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events
""",
        "q07_key_freq": """
SELECT event_type AS key, COUNT(*) AS cnt FROM events GROUP BY 1
""",
        "q08_union_dedup": """
WITH f AS (
  SELECT doc_id, text, 0 AS file_idx FROM documents
  UNION ALL
  SELECT doc_id, 'v2 ' || text, 1 FROM documents WHERE doc_id % 3 = 0
),
r AS (
  SELECT doc_id, text,
    ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY file_idx DESC) AS rn
  FROM f
)
SELECT doc_id, text FROM r WHERE rn = 1
""",
        "q09_subtract": """
SELECT doc_id, lang FROM documents WHERE doc_id % 7 <> 0
""",
        "q10_diff": """
WITH new AS (
  SELECT doc_id,
    CASE WHEN doc_id % 7 = 0 THEN 'mod ' || text ELSE text END AS text
  FROM documents WHERE doc_id % 5 <> 0
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 100
)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
  CASE WHEN o.doc_id IS NULL THEN 'create'
       WHEN n.doc_id IS NULL THEN 'delete'
       WHEN o.text <> n.text THEN 'modify' END AS action
FROM documents o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
WHERE (o.doc_id IS NULL OR n.doc_id IS NULL OR o.text <> n.text)
""",
        "q11_token_count": """
SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
  CAST(length(text) AS BIGINT) AS text_len
FROM documents
""",
        "q52_repetition": """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
g AS (
  SELECT doc_id,
    CASE WHEN len(t) >= 3 THEN list_transform(
      range(1, len(t) - 1),
      i -> t[i] || chr(31) || t[i+1] || chr(31) || t[i+2])
    ELSE CAST([] AS VARCHAR[]) END AS g
  FROM t
)
SELECT doc_id,
  CAST(len(g) AS BIGINT) AS n_grams,
  CAST(len(list_distinct(g)) AS BIGINT) AS n_distinct,
  ROUND(CASE WHEN len(g) > 0
        THEN 1.0 - len(list_distinct(g)) / len(g)
        ELSE 0.0 END, 6) AS dup_frac
FROM g
""",
        "q56_chunk_dedup": _Q56_ORACLE,
        "q73_dup_spans": _Q73_ORACLE,
        "q74_bpe_pairs": """
WITH w AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
wc AS (
  SELECT word, COUNT(*) AS n FROM w WHERE word <> '' GROUP BY word
),
p AS (
  SELECT unnest(CASE WHEN length(word) >= 2 THEN list_transform(
           range(1, length(word)), i -> substr(word, i, 2))
         ELSE CAST([] AS VARCHAR[]) END) AS pair, n
  FROM wc
),
agg AS (
  SELECT pair, CAST(SUM(n) AS BIGINT) AS pair_count
  FROM p GROUP BY pair
)
SELECT substr(pair, 1, 1) AS "left",
       substr(pair, 2, 1) AS "right",
       pair_count
FROM agg
ORDER BY pair_count DESC, "left", "right"
LIMIT 50
""",
        "q75_mix_plan": """
WITH per AS (
  SELECT lang, source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY lang, source
),
w AS (
  SELECT *, CAST(floor(sqrt(n_tokens)) AS BIGINT) AS wt FROM per
),
z AS (SELECT CAST(SUM(wt) AS BIGINT) AS z FROM w)
SELECT lang, source, n_docs, n_tokens,
  ROUND(wt / z, 6) AS mix_weight,
  ROUND(LEAST(1.0, (100000.0 * wt) /
        (CAST(z AS DOUBLE) * n_tokens)), 6) AS sample_rate,
  CAST(FLOOR(LEAST(1.0, (100000.0 * wt) /
        (CAST(z AS DOUBLE) * n_tokens)) * n_tokens) AS BIGINT)
    AS expected_tokens
FROM w, z
""",
        "q77_bpe_segment": _q77_oracle(),
        "q148_bpe_learn": _q148_oracle(),
        "q82_kmeans_ivf_train": _kmeans_oracle(),
        "q87_ivf_trained": _ivf_trained_oracle(),
        "q88_incremental_dedup": _q88_oracle(),
        "q89_pq_codes": _pq_codes_oracle(),
        "q90_pq_adc_topk": _pq_adc_oracle(),
        "q91_hll_registers": _hll_registers_oracle(),
        "q110_kmv_registers": _kmv_registers_oracle(),
        "q113_ranked_search": _ranked_search_oracle(),
        "q111_kmv_intersect": _kmv_intersect_oracle(),
        "q93_ivf_pq_topk": _ivf_pq_oracle(),
        "q94_pq_trained_codes": _pq_trained_oracle(),
        "q95_residual_ivf_pq": _residual_ivf_pq_oracle(),
        "q96_corpus_delta": _Q96_ORACLE,
        "q97_countmin_sketch": _countmin_sketch_oracle(),
        "q98_countmin_estimates": _countmin_estimates_oracle(),
        "q99_zorder_key": _q99_oracle(),
        "q115_hilbert_key": _q115_oracle(),
        "q100_zorder_bbox": _q100_oracle(),
        "q116_hilbert_bbox": _q100_oracle(),
        "q101_heavy_hitters": _Q101_ORACLE,
        "q102_ppl_buckets": _Q102_ORACLE,
        # the cover is work elision, not new semantics: same oracle
        # as the plain assignment
        "q103_cover_assign": assign_oracle_sql(),
        "q104_city_knn": f"""
WITH {_PTS_CTE},
cities(neighbor, clat, clon) AS (VALUES {cities}),
d AS (
  SELECT c.neighbor, p.doc_id,
    (p.lat_i - c.clat) * (p.lat_i - c.clat)
      + (p.lon_i - c.clon) * (p.lon_i - c.clon) AS dist2,
    ROW_NUMBER() OVER (PARTITION BY c.neighbor ORDER BY
      (p.lat_i - c.clat) * (p.lat_i - c.clat)
        + (p.lon_i - c.clon) * (p.lon_i - c.clon) ASC,
      p.doc_id ASC) AS rnk
  FROM cities c CROSS JOIN pts p
)
SELECT neighbor, CAST(rnk AS BIGINT) AS rank, doc_id, dist2
FROM d WHERE rnk <= 3
""",
        "q105_quantile_sketch": """
WITH t AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS v
  FROM documents
),
c AS (
  SELECT v >> 4 AS bin, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM t GROUP BY 1
),
r AS (
  SELECT bin, CAST(SUM(cnt) OVER (ORDER BY bin
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_le
  FROM c
),
tot AS (SELECT CAST(MAX(cum_le) AS BIGINT) AS n_rows FROM r),
pk(p) AS (VALUES (CAST(50 AS BIGINT)), (CAST(90 AS BIGINT)),
                 (CAST(99 AS BIGINT))),
pick AS (
  SELECT pk.p, tot.n_rows,
         (SELECT MIN(bin) FROM r
          WHERE cum_le >= (pk.p * tot.n_rows + 99) // 100) AS bin
  FROM pk, tot
)
SELECT pick.p, pick.bin,
       CAST(pick.bin << 4 AS BIGINT) AS lo,
       CAST(((pick.bin + 1) << 4) - 1 AS BIGINT) AS hi,
       r.cum_le, pick.n_rows
FROM pick LEFT JOIN r ON pick.bin = r.bin
""",
        "q92_hll_summary": _hll_summary_oracle(),
        "q83_export_shards": """
WITH h AS (
  SELECT doc_id,
         md5('shuf:' || CAST(doc_id AS VARCHAR)) AS hx,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
s AS (
  SELECT doc_id, n_tokens, hx,
         CAST(CAST(('0x' || substr(hx, 1, 12)) AS BIGINT) % 8
              AS BIGINT) AS shard
  FROM h
)
SELECT doc_id, shard,
       CAST(row_number() OVER (
         PARTITION BY shard ORDER BY hx, doc_id) AS BIGINT) AS pos,
       n_tokens
FROM s
""",
        # systematic PPS: same integer rule as export.weighted_
        # systematic_sample (all values non-negative, // == div)
        "q108_weighted_sample": """
WITH wts AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS w
  FROM documents
),
cum AS (
  SELECT doc_id, w,
         SUM(w) OVER (ORDER BY doc_id
           ROWS UNBOUNDED PRECEDING) AS cum_w,
         SUM(w) OVER () AS wt
  FROM wts
)
SELECT doc_id, w, CAST(cum_w AS BIGINT) AS cum_w,
       CAST(cum_w // (wt // 80)
            - (cum_w - w) // (wt // 80) AS BIGINT) AS hits
FROM cum
WHERE cum_w // (wt // 80) - (cum_w - w) // (wt // 80) >= 1
""",
        "q85_inverted_index": """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term FROM tok WHERE term <> '' GROUP BY 1, 2
)
SELECT term, CAST(COUNT(*) AS BIGINT) AS doc_freq,
       string_agg(CAST(doc_id AS VARCHAR), ','
                  ORDER BY doc_id) AS postings_str
FROM tf GROUP BY 1
HAVING COUNT(*) >= 2 AND COUNT(*) <= 400
""",
        "q86_distinctive_terms": """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY 1, 2
),
dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS doc_freq
  FROM tf GROUP BY 1
),
r AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.doc_freq,
         CAST(row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf DESC, dfreq.doc_freq ASC, tf.term ASC)
         AS BIGINT) AS rank
  FROM tf JOIN dfreq USING (term)
)
SELECT doc_id, term, tf, doc_freq, rank FROM r WHERE rank <= 3
""",
        "q84_token_percentiles": """
WITH t AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS v
  FROM documents
),
c AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt FROM t GROUP BY 1),
r AS (
  SELECT v, SUM(cnt) OVER (ORDER BY v
           ROWS UNBOUNDED PRECEDING) AS cum
  FROM c
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM t)
SELECT n_rows,
  CAST((SELECT MIN(v) FROM r
        WHERE cum >= (50 * n_rows + 99) // 100) AS BIGINT) AS p50,
  CAST((SELECT MIN(v) FROM r
        WHERE cum >= (90 * n_rows + 99) // 100) AS BIGINT) AS p90,
  CAST((SELECT MIN(v) FROM r
        WHERE cum >= (99 * n_rows + 99) // 100) AS BIGINT) AS p99
FROM tot
""",
        "q119_triangles": """
WITH e0 AS (
  SELECT 'host' || CAST(doc_id % 23 AS VARCHAR) AS src,
         'host' || CAST((doc_id * 2654435761) % 4294967296 % 23
                        AS VARCHAR) AS dst
  FROM documents WHERE doc_id % 3 = 0
),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e0 WHERE src <> dst
),
deg AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS dg
  FROM (SELECT a AS v FROM und UNION ALL SELECT b FROM und)
  GROUP BY 1
),
ori AS (
  SELECT
    CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND u.a < u.b)
         THEN u.a ELSE u.b END AS u,
    CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND u.a < u.b)
         THEN u.b ELSE u.a END AS w,
    CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND u.a < u.b)
         THEN db.dg ELSE da.dg END AS dw
  FROM und u
  JOIN deg da ON da.v = u.a
  JOIN deg db ON db.v = u.b
),
wed AS (
  SELECT o1.u, o1.w AS v1, o2.w AS v2
  FROM ori o1 JOIN ori o2 ON o1.u = o2.u
  WHERE o1.dw < o2.dw OR (o1.dw = o2.dw AND o1.w < o2.w)
),
tri AS (
  SELECT w.u, w.v1, w.v2
  FROM wed w JOIN ori c ON c.u = w.v1 AND c.w = w.v2
),
vx AS (
  SELECT u AS host FROM tri
  UNION ALL SELECT v1 FROM tri
  UNION ALL SELECT v2 FROM tri
)
SELECT host, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM vx GROUP BY 1
""",
        "q118_star_rollup": """
SELECT n.n_name,
       CAST(month(o.o_orderdate) AS BIGINT) AS month,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY 1, 2
""",
        "q152_stay_points": _stay_points_oracle_sql(),
        "q153_colocation": _colocation_oracle_sql(),
        "q158_dense_daily": _DENSE_DAILY_ORACLE,
        "q172_lpa_communities": _lpa_oracle_sql(4),
        "q173_power_iteration": _power_iter_oracle_sql(3),
        "q179_segment_optimal": _segment_oracle_sql(),
        "q182_gps_jumps": _gps_jumps_oracle_sql(),
        "q185_burst_collapse": """
WITH typed AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS us
  FROM events
),
marked AS (
  SELECT user_id, event_type, event_id, us,
    CASE WHEN LAG(us) OVER w IS NULL THEN 1
         WHEN us - LAG(us) OVER w > 86400000000 THEN 1
         ELSE 0 END AS is_new
  FROM typed
  WINDOW w AS (PARTITION BY user_id, event_type
               ORDER BY us, event_id)
),
runs AS (
  SELECT user_id, event_type, us,
    SUM(is_new) OVER (PARTITION BY user_id, event_type
                      ORDER BY us, event_id
                      ROWS UNBOUNDED PRECEDING) AS burst
  FROM marked
)
SELECT user_id, event_type, CAST(burst AS BIGINT) AS burst,
  CAST(MIN(us) AS BIGINT) AS first_us,
  CAST(MAX(us) AS BIGINT) AS last_us,
  CAST(COUNT(*) AS BIGINT) AS n_raw
FROM runs GROUP BY 1, 2, 3
""",
        "q191_crawl_plan": """
WITH urls AS (
  SELECT 'https://host' || CAST(doc_id % 11 AS VARCHAR)
         || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
    'host' || CAST(doc_id % 11 AS VARCHAR) || '.example.com' AS host
  FROM documents
),
ranked AS (
  SELECT url, host,
    CAST(ROW_NUMBER() OVER (PARTITION BY host ORDER BY url)
         AS BIGINT) AS slot,
    CAST(COUNT(*) OVER (PARTITION BY host) AS BIGINT) AS n
  FROM urls
)
SELECT url, host, slot,
  CAST((slot - 1) // 3 AS BIGINT) AS round,
  CAST((n + 2) // 3 AS BIGINT) AS n_rounds
FROM ranked
""",
        "q190_conflate_places": f"""
WITH RECURSIVE {_PTS_CTE},
places AS (
  SELECT d.doc_id AS place_id,
    lower(string_split(d.text, ' ')[1]) AS name_key,
    p.lat_i, p.lon_i
  FROM documents d JOIN pts p USING (doc_id)
),
edges AS (
  SELECT a.place_id AS u, b.place_id AS v
  FROM places a JOIN places b
    ON a.name_key = b.name_key AND a.place_id <> b.place_id
   AND (a.lat_i - b.lat_i) * (a.lat_i - b.lat_i)
     + (a.lon_i - b.lon_i) * (a.lon_i - b.lon_i)
     <= CAST(5000000 AS BIGINT) * CAST(5000000 AS BIGINT)
),
reach(u, v) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
),
comp AS (
  SELECT u AS place_id, MIN(v) AS canonical FROM reach GROUP BY u
)
SELECT p.place_id, p.name_key,
  CAST(COALESCE(c.canonical, p.place_id) AS BIGINT) AS canonical
FROM places p LEFT JOIN comp c USING (place_id)
""",
        "q189_pmi_pairs": """
WITH dt AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term
    FROM documents)
  WHERE term <> ''
),
dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM dt GROUP BY 1
),
vocab AS (
  SELECT term, n_docs FROM dfreq
  ORDER BY n_docs DESC, term ASC LIMIT 60
),
gated AS (
  SELECT dt.doc_id, dt.term, v.n_docs
  FROM dt JOIN vocab v USING (term)
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus FROM documents),
pairs AS (
  SELECT a.term AS t1, b.term AS t2, a.n_docs AS n1,
    b.n_docs AS n2, CAST(COUNT(*) AS BIGINT) AS co
  FROM gated a JOIN gated b
    ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1, 2, 3, 4 HAVING COUNT(*) >= 2
)
SELECT t1, t2, co, n1, n2,
  CAST(co * n_corpus AS BIGINT) AS lift_num,
  CAST(n1 * n2 AS BIGINT) AS lift_den
FROM pairs, tot
""",
        "q188_mirror_hosts": """
WITH hf AS (
  SELECT DISTINCT
    'host' || CAST(((doc_id * 2654435761) % 4294967296) % 23
              AS VARCHAR) AS host,
    md5(substr(text, 1, 160)) AS fp
  FROM documents
),
sizes AS (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS n FROM hf GROUP BY 1
),
shared_fp AS (
  SELECT fp FROM hf GROUP BY fp
  HAVING COUNT(*) BETWEEN 2 AND 16
),
gated AS (SELECT hf.* FROM hf JOIN shared_fp USING (fp)),
pairs AS (
  SELECT a.host AS h1, b.host AS h2,
    CAST(COUNT(*) AS BIGINT) AS shared
  FROM gated a JOIN gated b
    ON a.fp = b.fp AND a.host < b.host
  GROUP BY 1, 2 HAVING COUNT(*) >= 1
)
SELECT h1, h2, shared, s1.n AS n1, s2.n AS n2
FROM pairs
JOIN sizes s1 ON s1.host = h1
JOIN sizes s2 ON s2.host = h2
""",
        "q187_seasonal_anomaly": """
WITH cells AS (
  SELECT event_type,
    CAST((datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 4)
         // 7 AS BIGINT) AS week,
    CAST(((datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 4)
          % 7) * 24 + hour(ts) AS BIGINT) AS how,
    CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2, 3
),
med AS (
  SELECT event_type, how, cnt AS med FROM (
    SELECT event_type, how, cnt,
      ROW_NUMBER() OVER (PARTITION BY event_type, how
                         ORDER BY cnt, week) AS rn,
      COUNT(*) OVER (PARTITION BY event_type, how) AS n
    FROM cells)
  WHERE rn = (n + 1) // 2
),
withmed AS (
  SELECT c.*, med, ABS(cnt - med) AS dev
  FROM cells c JOIN med USING (event_type, how)
),
mad AS (
  SELECT event_type, how, dev AS mad FROM (
    SELECT event_type, how, dev,
      ROW_NUMBER() OVER (PARTITION BY event_type, how
                         ORDER BY dev, week) AS rn,
      COUNT(*) OVER (PARTITION BY event_type, how) AS n
    FROM withmed)
  WHERE rn = (n + 1) // 2
)
SELECT event_type, how, week, cnt, med, CAST(mad AS BIGINT) AS mad
FROM withmed JOIN mad USING (event_type, how)
WHERE cnt - med > 2 * mad
""",
        "q186_length_drift": """
WITH h1 AS (
  SELECT length(text) // 100 AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n1
  FROM documents WHERE doc_id % 2 = 0 GROUP BY 1
),
h2 AS (
  SELECT length(text) // 100 AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n2
  FROM documents WHERE doc_id % 2 = 1 GROUP BY 1
),
j AS (
  SELECT COALESCE(h1.bucket, h2.bucket) AS bucket,
         COALESCE(n1, 0) AS n1, COALESCE(n2, 0) AS n2
  FROM h1 FULL OUTER JOIN h2 ON h1.bucket = h2.bucket
),
tot AS (
  SELECT CAST(SUM(n1) AS BIGINT) AS t1,
         CAST(SUM(n2) AS BIGINT) AS t2 FROM j
)
SELECT bucket, n1, n2,
  CAST(ABS(n1 * t2 - n2 * t1) AS BIGINT) AS tvd_num,
  CAST(2 * t1 * t2 AS BIGINT) AS tvd_den
FROM j, tot
""",
        "q180_anchor_text": """
WITH links AS (
  SELECT 'host' || CAST(((doc_id * 2654435761) % 4294967296) % 23
                        AS VARCHAR) AS host,
    string_split(text, ' ')[1:2] AS toks
  FROM documents WHERE doc_id % 3 = 0
),
terms AS (
  SELECT host, t.term
  FROM links CROSS JOIN LATERAL
    (SELECT unnest(toks) AS term) t
  WHERE length(t.term) >= 1
),
counts AS (
  SELECT host, term, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM terms GROUP BY 1, 2
)
SELECT host, term, cnt, CAST(rank AS BIGINT) AS rank FROM (
  SELECT host, term, cnt,
    ROW_NUMBER() OVER (PARTITION BY host
                       ORDER BY cnt DESC, term) AS rank
  FROM counts)
WHERE rank <= 3
""",
        # CUSUM via the same prefix identity the engine uses:
        # S_t = P_t - min(0, running_min(P)), all integer (scaled
        # by the series length D so mu = T/D never floats)
        "q171_cusum_alarms": f"""
WITH dense AS ({_DENSE_DAILY_ORACLE}),
keyed AS (
  SELECT event_type, day, n_events,
    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
      AS d_scale,
    CAST(SUM(n_events) OVER (PARTITION BY event_type) AS BIGINT)
      AS total
  FROM dense
),
z AS (
  SELECT event_type, day, n_events, d_scale,
    n_events * d_scale - total - 1 * d_scale AS z
  FROM keyed
),
p AS (
  SELECT event_type, day, n_events, d_scale,
    CAST(SUM(z) OVER w AS BIGINT) AS p
  FROM z
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS UNBOUNDED PRECEDING)
),
m AS (
  SELECT *, MIN(p) OVER w AS pmin FROM p
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS UNBOUNDED PRECEDING)
)
SELECT event_type, day, n_events,
  CAST(p - LEAST(0, pmin) AS BIGINT) AS cusum_scaled,
  d_scale AS scale,
  (p - LEAST(0, pmin)) > 5 * d_scale AS is_alarm
FROM m
""",
        "q159_home_cells": _home_cells_oracle_sql(),
        # dominance anti-join on the per-user aggregate: (x,y)
        # survives iff no user strictly dominates it
        "q163_user_skyline": """
WITH per_user AS (
  SELECT user_id, COUNT(*) AS n_events,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM events GROUP BY user_id
),
pts AS (
  SELECT n_events, value_cents, COUNT(*) AS n_users
  FROM per_user GROUP BY 1, 2
)
SELECT p.n_events, p.value_cents, p.n_users
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.n_events >= p.n_events AND q.value_cents >= p.value_cents
    AND (q.n_events > p.n_events OR q.value_cents > p.value_cents))
""",
        "q150_interval_join": """
WITH l AS (
  SELECT user_id, event_id AS left_id, epoch_us(ts) AS lus
  FROM events WHERE event_type = 'error'
),
r AS (
  SELECT user_id, event_id AS right_id, epoch_us(ts) AS rus
  FROM events WHERE event_type = 'click'
)
SELECT l.user_id, l.left_id, r.right_id,
       CAST(abs(r.rus - l.lus) AS BIGINT) AS gap_us
FROM l JOIN r ON r.user_id = l.user_id
 AND r.rus >= l.lus - 1800000000
 AND r.rus <= l.lus + 1800000000
""",
        # lower medians by the same row_number rank trick the
        # engine uses; is_spike one-sided strict
        "q181_robust_spikes": """
WITH hc AS (
  SELECT event_type,
    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) * 24
         + hour(ts) AS BIGINT) AS hr,
    CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
med AS (
  SELECT event_type, cnt AS med FROM (
    SELECT event_type, cnt, hr,
      ROW_NUMBER() OVER (PARTITION BY event_type
                         ORDER BY cnt, hr) AS rn,
      COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM hc)
  WHERE rn = (n + 1) // 2
),
devs AS (
  SELECT h.event_type, h.hr, h.cnt, m.med,
         ABS(h.cnt - m.med) AS dev
  FROM hc h JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, dev AS mad FROM (
    SELECT event_type, dev, hr,
      ROW_NUMBER() OVER (PARTITION BY event_type
                         ORDER BY dev, hr) AS rn,
      COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM devs)
  WHERE rn = (n + 1) // 2
)
SELECT d.event_type, d.hr, d.cnt, d.med, a.mad,
       d.cnt - d.med > 3 * a.mad AS is_spike
FROM devs d JOIN mad a USING (event_type)
""",
        "q117_event_spikes": """
WITH hc AS (
  SELECT event_type,
    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) * 24
         + hour(ts) AS BIGINT) AS hr,
    CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
st AS (
  SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS total,
         CAST(COUNT(*) AS BIGINT) AS n_hours
  FROM hc GROUP BY 1
)
SELECT h.event_type, h.hr, h.cnt, s.total, s.n_hours
FROM hc h JOIN st s USING (event_type)
WHERE h.cnt * s.n_hours >= 2 * s.total
""",
        "q114_retention_cohorts": """
WITH ua AS (
  SELECT DISTINCT user_id,
    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS p
  FROM events
),
first AS (
  SELECT user_id, MIN(p) AS cohort FROM ua GROUP BY 1
)
SELECT CAST(f.cohort AS BIGINT) AS cohort,
       CAST(u.p - f.cohort AS BIGINT) AS offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM ua u JOIN first f USING (user_id)
GROUP BY 1, 2
""",
        "q122_k_core": _kcore_oracle(),
        "q124_spatial_shards": _q124_oracle(),
        "q121_grouped_quantiles": """
WITH vals AS (
  SELECT lang AS grp,
    CAST(len(string_split(text, ' ')) AS BIGINT) >> 3 AS bin
  FROM documents
),
hist AS (
  SELECT grp, bin, CAST(COUNT(*) AS BIGINT) AS c
  FROM vals GROUP BY 1, 2
),
cum AS (
  SELECT grp, bin, c,
    CAST(SUM(c) OVER (PARTITION BY grp ORDER BY bin
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_le
  FROM hist
),
tot AS (
  SELECT grp, MAX(cum_le) AS n_rows FROM cum GROUP BY 1
),
pick AS (
  SELECT c.grp, t.n_rows, p.p,
    MIN(CASE WHEN c.cum_le >= (p.p * t.n_rows + 99) // 100
         THEN c.bin END) AS bin
  FROM cum c
  JOIN tot t USING (grp)
  CROSS JOIN (SELECT unnest([50, 90, 99]) AS p) p
  GROUP BY 1, 2, 3
)
SELECT k.grp, CAST(k.p AS BIGINT) AS p, k.bin,
       CAST(k.bin << 3 AS BIGINT) AS lo,
       CAST(((k.bin + 1) << 3) - 1 AS BIGINT) AS hi,
       c.cum_le, CAST(k.n_rows AS BIGINT) AS n_rows
FROM pick k LEFT JOIN cum c ON c.grp = k.grp AND c.bin = k.bin
""",
        "q123_tile_blur": """
WITH pts AS (
  SELECT doc_id,
         CAST(""" + LAT_EXPR + """ AS BIGINT) AS lat_i,
         CAST(""" + LON_EXPR + """ AS BIGINT) AS lon_i
  FROM documents
),
rollup AS (
  SELECT ((lat_i + 900000000) >> 20) * 4096
         + ((lon_i + 1800000000) >> 20) AS cell,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM pts GROUP BY 1
),
base AS (
  SELECT cell % 4096 AS cu, cell // 4096 AS cv, n FROM rollup
),
sc AS (
  SELECT cu + a.du AS nu, cv + b.dv AS nv,
         CAST((2 - abs(a.du)) * (2 - abs(b.dv)) AS BIGINT) AS w, n
  FROM base
  CROSS JOIN LATERAL (SELECT unnest(range(-1, 2)) AS du) a
  CROSS JOIN LATERAL (SELECT unnest(range(-1, 2)) AS dv) b
  WHERE cu + a.du BETWEEN 0 AND 3433
    AND cv + b.dv BETWEEN 0 AND 1716
)
SELECT nv * 4096 + nu AS cell,
       CAST(SUM(w * n) AS BIGINT) AS smoothed_num,
       CAST(SUM(w * n) // 16 AS BIGINT) AS smoothed
FROM sc GROUP BY 1
""",
        "q125_transitions": """
WITH seq AS (
  SELECT event_type,
    LAG(event_type) OVER (PARTITION BY user_id
      ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM seq WHERE prev_type IS NOT NULL
GROUP BY 1, 2
""",
        "q126_asof_enrich": """
WITH vers AS (
  SELECT DISTINCT user_id,
    CAST(CAST(ts AS DATE) AS TIMESTAMP) AS vts,
    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
         AS BIGINT) AS version_day
  FROM events WHERE event_id % 5 = 0
)
SELECT e.event_id, e.user_id,
  (SELECT MAX(v.version_day) FROM vers v
   WHERE v.user_id = e.user_id AND v.vts <= e.ts) AS version_day
FROM events e
""",
        "q78_sessionize": """
WITH e AS (
  SELECT user_id, event_id, ts, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS te
  FROM events
),
f AS (
  SELECT *,
    CASE WHEN lag(te) OVER w IS NULL THEN 1
         WHEN te - lag(te) OVER w > 1800 THEN 1
         ELSE 0 END AS is_new
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
g AS (
  SELECT *,
    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM f
)
SELECT user_id,
       CAST(session_idx AS BIGINT) AS session_idx,
       MIN(te) AS start_epoch,
       MAX(te) AS end_epoch,
       COUNT(*) AS n_events,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
FROM g GROUP BY 1, 2
""",
        "q79_bloom_seen": """
WITH d AS (
  SELECT doc_id, md5(substr(text, 1, 40)) AS fp FROM documents
),
c AS (SELECT DISTINCT fp FROM d WHERE doc_id % 2 = 0),
p AS (SELECT DISTINCT fp FROM d WHERE doc_id % 2 = 1),
ks AS (SELECT i FROM (VALUES (0), (1), (2), (3)) AS t(i)),
cb AS (
  SELECT CAST(CAST(('0x' || substr(
           md5(CAST(i AS VARCHAR) || ':' || fp), 1, 12))
         AS BIGINT) % 1024 AS BIGINT) AS bit
  FROM c CROSS JOIN ks
),
words AS (
  SELECT bit // 32 AS word_idx,
         bit_or(CAST(1 AS BIGINT) << CAST(bit % 32 AS INTEGER))
           AS bits
  FROM cb GROUP BY 1
),
pb AS (
  SELECT fp,
         CAST(CAST(('0x' || substr(
           md5(CAST(i AS VARCHAR) || ':' || fp), 1, 12))
         AS BIGINT) % 1024 AS BIGINT) AS bit
  FROM p CROSS JOIN ks
),
hits AS (
  SELECT pb.fp,
         CASE WHEN (coalesce(w.bits, 0)
              & (CAST(1 AS BIGINT)
                 << CAST(pb.bit % 32 AS INTEGER))) <> 0
              THEN 1 ELSE 0 END AS hit
  FROM pb LEFT JOIN words w ON pb.bit // 32 = w.word_idx
)
SELECT h.fp AS fp,
       (MIN(h.hit) = 1) AS maybe_seen,
       (MAX(CASE WHEN c.fp IS NOT NULL THEN 1 ELSE 0 END) = 1)
         AS seen
FROM hits h LEFT JOIN c ON h.fp = c.fp
GROUP BY 1
""",
        "q80_lm_fluency": """
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
),
g AS (
  SELECT doc_id, (lang = 'en') AS is_ref,
         w[i] || chr(31) || w[i + 1] AS g
  FROM t, UNNEST(range(1, len(w))) AS r(i)
),
pg AS (
  SELECT doc_id, is_ref, g, CAST(COUNT(*) AS BIGINT) AS n
  FROM g GROUP BY 1, 2, 3
),
m AS (
  SELECT g,
         CAST(length(printf('%b', CAST(SUM(n) AS BIGINT)))
              AS BIGINT) AS bits
  FROM pg WHERE is_ref GROUP BY 1
),
s AS (
  SELECT pg.doc_id,
         CAST(SUM(n) AS BIGINT) AS n_grams,
         CAST(SUM(CASE WHEN m.g IS NULL THEN n ELSE 0 END)
              AS BIGINT) AS n_oov,
         CAST(SUM(n * COALESCE(m.bits, 0)) AS BIGINT) AS bits_sum
  FROM pg LEFT JOIN m ON pg.g = m.g GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(n_grams, 0) AS n_grams,
       COALESCE(n_oov, 0) AS n_oov,
       COALESCE(bits_sum, 0) AS bits_sum,
       CAST(CASE WHEN COALESCE(n_grams, 0) > 0
            THEN (1000 * bits_sum) // n_grams
            ELSE 0 END AS BIGINT) AS fluency_milli,
       CAST(CASE WHEN COALESCE(n_grams, 0) > 0
            THEN (1000 * n_oov) // n_grams
            ELSE 0 END AS BIGINT) AS oov_milli
FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
""",
        "q81_classifier_gate": """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t
  FROM documents
),
b AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(md5(t), 1, 12)) AS BIGINT)
              % 4096 AS BIGINT) AS bucket
  FROM tok
),
hist AS (
  SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS n
  FROM b GROUP BY 1, 2
),
w AS (
  SELECT CAST(i AS BIGINT) AS bucket,
         CAST(CAST(('0x' || substr(
                md5('w:' || CAST(i AS VARCHAR)), 1, 12))
              AS BIGINT) % 2001 - 1000 AS BIGINT) AS weight_milli
  FROM range(4096) r(i)
)
SELECT h.doc_id,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       CAST(SUM(n * w.weight_milli) AS BIGINT) AS dot_milli,
       (SUM(n * w.weight_milli) > 0) AS keep
FROM hist h JOIN w USING (bucket)
GROUP BY 1
""",
        "q76_dsir_lean": """
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
),
g AS (
  SELECT doc_id, (lang = 'en') AS is_t,
    unnest(CASE WHEN len(w) >= 2 THEN list_transform(
      range(1, len(w)), i -> w[i] || chr(31) || w[i+1])
    ELSE CAST([] AS VARCHAR[]) END) AS g
  FROM t
),
gb AS (SELECT doc_id, is_t, substr(md5(g), 1, 2) AS b FROM g),
pb AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS r_b,
         CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT)
           AS t_b
  FROM gb GROUP BY b
),
tot AS (
  SELECT CAST(SUM(r_b) AS BIGINT) AS r,
         CAST(SUM(t_b) AS BIGINT) AS t FROM pb
),
v AS (SELECT b, (t_b * r > r_b * t) AS lean FROM pb, tot)
SELECT gb.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_grams,
  CAST(SUM(CASE WHEN lean THEN 1 ELSE 0 END) AS BIGINT)
    AS n_leaning,
  ROUND(SUM(CASE WHEN lean THEN 1 ELSE 0 END) / COUNT(*), 6)
    AS lean_ratio
FROM gb JOIN v USING (b)
GROUP BY gb.doc_id
""",
        "q59_url_dedup": _Q59_ORACLE,
        "q60_host_stats": _Q60_ORACLE,
        "q69_corpus_build": _Q69_ORACLE,
        "q70_funnel_report": _Q70_ORACLE,
        "q65_pii_scrub": r"""
WITH planted AS (
  SELECT doc_id,
    substr(text, 1, 60)
    || ' contact user' || CAST(doc_id AS VARCHAR)
    || '@mail' || CAST(doc_id % 5 AS VARCHAR) || '.example.com'
    || CASE WHEN doc_id % 3 = 0
         THEN ' cc admin' || CAST(doc_id % 97 AS VARCHAR)
           || '@example.org' ELSE '' END
    || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'
    || CASE WHEN doc_id % 4 = 0
         THEN ' tel 555-'
           || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
           || '-0199' ELSE '' END AS text
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(text,
    '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}'))
    AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text,
    '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT) AS n_ipv4,
  CAST(len(regexp_extract_all(text,
    '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
  md5(regexp_replace(regexp_replace(regexp_replace(text,
    '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}',
    '<EMAIL>', 'g'),
    '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
    '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g')) AS scrub_md5
FROM planted
""",
        # 3 unrolled integer-PageRank iterations (bit-exact vs
        # Spark because every step is long add/mul/integer-divide)
        "q194_idw_surface": f"""
WITH {_PTS_CTE},
pv AS (
  SELECT p.doc_id, p.lat_i, p.lon_i,
    CAST(d.n_chars AS BIGINT) AS v
  FROM pts p JOIN documents d USING (doc_id)
  WHERE p.doc_id % 5 = 0
),
pairs AS (
  SELECT a.doc_id AS a, b.v AS bv,
    (a.lat_i - b.lat_i) * (a.lat_i - b.lat_i)
    + (a.lon_i - b.lon_i) * (a.lon_i - b.lon_i) AS d2
  FROM pv a JOIN pv b ON a.doc_id <> b.doc_id
  WHERE (a.lat_i - b.lat_i) * (a.lat_i - b.lat_i)
      + (a.lon_i - b.lon_i) * (a.lon_i - b.lon_i)
      <= CAST(2000000 AS BIGINT) * CAST(2000000 AS BIGINT)
),
est AS (
  SELECT a,
    CAST(SUM((4000000000000 - d2) * bv) AS BIGINT) AS num,
    CAST(SUM(4000000000000 - d2) AS BIGINT) AS den,
    CAST(COUNT(*) AS BIGINT) AS n_neighbors
  FROM pairs GROUP BY a
)
SELECT e.a AS doc_id, p.v, e.num, e.den, e.n_neighbors
FROM est e JOIN pv p ON p.doc_id = e.a
""",
        "q197_url_templates": """
WITH urls AS (
  SELECT 'https://host' || CAST(doc_id % 11 AS VARCHAR)
    || '.example.com/item/' || CAST(doc_id AS VARCHAR)
    || '/view' AS url
  FROM documents
),
parsed AS (
  SELECT 'host' || CAST(
    CAST(regexp_extract(url,
      'host([0-9]+)\.example\.com', 1) AS BIGINT) AS VARCHAR)
    || '.example.com' AS host,
    regexp_replace(
      regexp_extract(url,
        '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1),
      '[0-9]+', '{n}', 'g') AS template
  FROM urls
)
SELECT host, template, CAST(COUNT(*) AS BIGINT) AS n_urls,
  CAST(len(string_split(template, '{n}')) - 1 AS BIGINT)
    AS n_slots,
  COUNT(*) >= 30 AS is_trap
FROM parsed GROUP BY 1, 2
""",
        "q207_conflate_snapshots": f"""
WITH {_PTS_CTE},
places AS (
  SELECT d.doc_id AS place_id,
    lower(string_split(d.text, ' ')[1]) AS name_key,
    p.lat_i, p.lon_i
  FROM documents d JOIN pts p USING (doc_id)
),
old AS (SELECT * FROM places WHERE place_id % 2 = 0),
new AS (SELECT * FROM places WHERE place_id % 2 = 1),
cand AS (
  SELECT n.place_id AS pid, o.place_id AS oid,
    (n.lat_i - o.lat_i) * (n.lat_i - o.lat_i)
    + (n.lon_i - o.lon_i) * (n.lon_i - o.lon_i) AS d2
  FROM new n JOIN old o ON n.name_key = o.name_key
  WHERE (n.lat_i - o.lat_i) * (n.lat_i - o.lat_i)
      + (n.lon_i - o.lon_i) * (n.lon_i - o.lon_i)
      <= CAST(5000000 AS BIGINT) * CAST(5000000 AS BIGINT)
),
best AS (
  SELECT pid, oid AS matched_id, CAST(d2 AS BIGINT) AS dist2
  FROM (SELECT *, ROW_NUMBER() OVER (
          PARTITION BY pid ORDER BY d2, oid) AS rn FROM cand)
  WHERE rn = 1
)
SELECT n.place_id, n.name_key,
  CAST(COALESCE(b.matched_id, -1) AS BIGINT) AS matched_id,
  CAST(COALESCE(b.dist2, -1) AS BIGINT) AS dist2,
  CASE WHEN b.matched_id IS NOT NULL THEN 'matched'
       ELSE 'born' END AS status
FROM new n LEFT JOIN best b ON b.pid = n.place_id
UNION ALL
SELECT o.place_id, o.name_key, CAST(-1 AS BIGINT),
  CAST(-1 AS BIGINT), 'dead'
FROM old o
WHERE o.place_id NOT IN (SELECT matched_id FROM best)
""",
        # HITS: two un-normalized rounds unrolled — auth from the
        # previous hub, hub from the fresh auth (Kleinberg order)
        "q208_hits_scores": """
WITH edges AS (
  SELECT DISTINCT
    'host' || CAST(doc_id % 23 AS VARCHAR) AS src,
    'host' || CAST(((doc_id * 2654435761) % 4294967296) % 23
      AS VARCHAR) AS dst
  FROM documents
  WHERE doc_id % 3 = 0
    AND doc_id % 23 <> ((doc_id * 2654435761) % 4294967296) % 23
),
hosts AS (SELECT src AS host FROM edges UNION SELECT dst FROM edges),
a1s AS (SELECT dst AS host, CAST(COUNT(*) AS BIGINT) AS s
        FROM edges GROUP BY 1),
auth1 AS (SELECT h.host, COALESCE(a1s.s, 0) AS auth
          FROM hosts h LEFT JOIN a1s ON h.host = a1s.host),
h1s AS (SELECT e.src AS host, CAST(SUM(a.auth) AS BIGINT) AS s
        FROM edges e JOIN auth1 a ON e.dst = a.host GROUP BY 1),
hub1 AS (SELECT h.host, COALESCE(h1s.s, 0) AS hub
         FROM hosts h LEFT JOIN h1s ON h.host = h1s.host),
a2s AS (SELECT e.dst AS host, CAST(SUM(b.hub) AS BIGINT) AS s
        FROM edges e JOIN hub1 b ON e.src = b.host GROUP BY 1),
auth2 AS (SELECT h.host, COALESCE(a2s.s, 0) AS auth
          FROM hosts h LEFT JOIN a2s ON h.host = a2s.host),
h2s AS (SELECT e.src AS host, CAST(SUM(a.auth) AS BIGINT) AS s
        FROM edges e JOIN auth2 a ON e.dst = a.host GROUP BY 1)
SELECT h.host, a.auth, COALESCE(h2s.s, 0) AS hub
FROM hosts h
JOIN auth2 a ON h.host = a.host
LEFT JOIN h2s ON h.host = h2s.host
""",
        # Moran's I with floor-mean centering: dilated rook join,
        # every part of the exact fraction as its own scalar
        "q209_morans_i": f"""
WITH {_PTS_CTE},
mcells AS (
  SELECT (lat_i + 900000000) >> 24 AS latb,
         (lon_i + 1800000000) >> 24 AS lonb,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM pts GROUP BY 1, 2
),
mtot AS (SELECT SUM(x) AS s, COUNT(*) AS n FROM mcells),
mdev AS (
  SELECT latb, lonb, CAST(x - (t.s // t.n) AS BIGINT) AS d
  FROM mcells, mtot t
),
moffs(dv, du) AS (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)),
mdil AS (
  SELECT c.latb + o.dv AS latb, c.lonb + o.du AS lonb,
         c.d AS d_nbr
  FROM mdev c CROSS JOIN moffs o
),
madj AS (
  SELECT a.d, b.d_nbr
  FROM mdev a JOIN mdil b
    ON a.latb = b.latb AND a.lonb = b.lonb
)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM mdev) AS n_cells,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM madj) AS w_pairs,
  (SELECT CAST(COALESCE(SUM(d * d_nbr), 0) AS BIGINT) FROM madj)
    AS num,
  (SELECT CAST(SUM(d * d) AS BIGINT) FROM mdev) AS den,
  (SELECT CAST(s // n AS BIGINT) FROM mtot) AS mean_floor,
  (SELECT CAST(s % n AS BIGINT) FROM mtot) AS resid
""",
        # Fellegi-Sunter: blocked pairs, NULL-safe weight sum,
        # thresholded tiers — all integer
        "q210_linkage_scores": f"""
WITH {_PTS_CTE},
lplaces AS (
  SELECT d.doc_id AS place_id,
    lower(string_split(d.text, ' ')[1]) AS name_key,
    p.lat_i, p.lon_i, d.lang, d.n_chars
  FROM documents d JOIN pts p USING (doc_id)
),
lpr AS (
  SELECT a.place_id AS id_a, b.place_id AS id_b,
    (a.lat_i >> 22) = (b.lat_i >> 22)
      AND (a.lon_i >> 22) = (b.lon_i >> 22) AS cell_agree,
    (a.n_chars // 64) = (b.n_chars // 64) AS len_agree,
    CASE WHEN (a.place_id + b.place_id) % 17 = 0 THEN NULL
         ELSE a.lang = b.lang END AS lang_agree
  FROM lplaces a JOIN lplaces b ON a.name_key = b.name_key
  WHERE a.place_id % 2 = 1 AND b.place_id % 2 = 0
),
lsc AS (
  SELECT *, CAST(
    (CASE WHEN cell_agree IS NULL THEN 0
          WHEN cell_agree THEN 38 ELSE -7 END)
    + (CASE WHEN len_agree IS NULL THEN 0
            WHEN len_agree THEN 11 ELSE -13 END)
    + (CASE WHEN lang_agree IS NULL THEN 0
            WHEN lang_agree THEN 9 ELSE -21 END) AS BIGINT)
    AS score
  FROM lpr
)
SELECT id_a, id_b, cell_agree, len_agree, lang_agree, score,
  CASE WHEN score >= 40 THEN 'match'
       WHEN score >= 5 THEN 'possible'
       ELSE 'nonmatch' END AS tier
FROM lsc
""",
        # contingency lift: cell counts + broadcast-style marginals,
        # both sides of observed/expected as exact products
        "q211_region_lift": f"""
WITH {_PTS_CTE},
framed AS (
  SELECT 'host' || CAST(doc_id % 23 AS VARCHAR) AS "row",
         'r' || CAST(lat_i >> 23 AS VARCHAR) AS "col"
  FROM pts
),
fcells AS (SELECT "row", "col", CAST(COUNT(*) AS BIGINT) AS n_obs
           FROM framed GROUP BY 1, 2),
frows AS (SELECT "row", CAST(COUNT(*) AS BIGINT) AS n_row
          FROM framed GROUP BY 1),
fcols AS (SELECT "col", CAST(COUNT(*) AS BIGINT) AS n_col
          FROM framed GROUP BY 1),
ftot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM framed)
SELECT c."row", c."col", c.n_obs, r.n_row, k.n_col, t.n_total,
  CAST(c.n_obs * t.n_total AS BIGINT) AS lift_num,
  CAST(r.n_row * k.n_col AS BIGINT) AS lift_den,
  c.n_obs * t.n_total > r.n_row * k.n_col AS over
FROM fcells c
JOIN frows r USING ("row")
JOIN fcols k USING ("col")
CROSS JOIN ftot t
""",
        # Haar: three unrolled sum/difference levels over the
        # densified first-8-day grid
        "q212_haar_series": """
WITH hdaily AS (
  SELECT event_type AS key,
    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
         AS BIGINT) AS day,
    CAST(COUNT(*) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
),
hrel AS (
  SELECT key, day - MIN(day) OVER (PARTITION BY key) AS idx, v
  FROM hdaily
),
hkeys AS (SELECT DISTINCT key FROM hrel),
hgrid AS (
  SELECT k.key, CAST(g.i AS BIGINT) AS idx
  FROM hkeys k CROSS JOIN (SELECT unnest(range(0, 8)) AS i) g
),
hs0 AS (
  SELECT g.key, g.idx, CAST(COALESCE(r.v, 0) AS BIGINT) AS v
  FROM hgrid g LEFT JOIN (SELECT * FROM hrel WHERE idx < 8) r
    ON r.key = g.key AND r.idx = g.idx
),
hl1 AS (
  SELECT key, idx // 2 AS idx, SUM(v) AS a,
    SUM(CASE WHEN idx % 2 = 0 THEN v ELSE -v END) AS d
  FROM hs0 GROUP BY 1, 2
),
hl2 AS (
  SELECT key, idx // 2 AS idx, SUM(a) AS a,
    SUM(CASE WHEN idx % 2 = 0 THEN a ELSE -a END) AS d
  FROM hl1 GROUP BY 1, 2
),
hl3 AS (
  SELECT key, idx // 2 AS idx, SUM(a) AS a,
    SUM(CASE WHEN idx % 2 = 0 THEN a ELSE -a END) AS d
  FROM hl2 GROUP BY 1, 2
)
SELECT key, CAST(1 AS BIGINT) AS level, idx, 'd' AS kind,
       CAST(d AS BIGINT) AS coef FROM hl1
UNION ALL
SELECT key, CAST(2 AS BIGINT), idx, 'd', CAST(d AS BIGINT)
FROM hl2
UNION ALL
SELECT key, CAST(3 AS BIGINT), idx, 'd', CAST(d AS BIGINT)
FROM hl3
UNION ALL
SELECT key, CAST(3 AS BIGINT), idx, 'a', CAST(a AS BIGINT)
FROM hl3
""",
        # winsorize: exact rank bounds via windows, clamp, sum
        "q214_winsorized_stats": """
WITH wbase AS (
  SELECT 'host' || CAST(doc_id % 23 AS VARCHAR) AS host,
         CAST(n_chars AS BIGINT) AS x, doc_id AS i
  FROM documents
),
wrk AS (
  SELECT host, x, i,
    ROW_NUMBER() OVER (PARTITION BY host ORDER BY x, i) AS rn,
    COUNT(*) OVER (PARTITION BY host) AS n
  FROM wbase
),
wlo AS (SELECT host, x AS lo_val FROM wrk
        WHERE rn = (n * 10) // 100 + 1),
whi AS (SELECT host, x AS hi_val FROM wrk
        WHERE rn = n - (n * 10) // 100)
SELECT b.host, CAST(COUNT(*) AS BIGINT) AS n,
  MIN(l.lo_val) AS lo_val, MIN(h.hi_val) AS hi_val,
  CAST(SUM(GREATEST(l.lo_val, LEAST(h.hi_val, b.x)))
       AS BIGINT) AS wsum,
  CAST(SUM(b.x) AS BIGINT) AS rawsum
FROM wbase b
JOIN wlo l USING (host)
JOIN whi h USING (host)
GROUP BY 1
""",
        # marching squares: inside corners vote their bit into the
        # <=4 blocks they touch; plateaus (15) and empties dropped
        "q215_contour_cases": f"""
WITH {_PTS_CTE},
ccells AS (
  SELECT (lat_i + 900000000) >> 22 AS latb,
         (lon_i + 1800000000) >> 22 AS lonb, COUNT(*) AS n
  FROM pts GROUP BY 1, 2
),
cthr AS (SELECT COUNT(*) // 128 AS t FROM documents),
cinside AS (
  SELECT latb, lonb FROM ccells, cthr WHERE n > t
),
cvotes(dy, dx, bit) AS (VALUES (0, 0, 1), (0, 1, 2),
                               (1, 0, 4), (1, 1, 8)),
ccased AS (
  SELECT i.latb - v.dy AS latb, i.lonb - v.dx AS lonb,
         CAST(SUM(v.bit) AS BIGINT) AS mcase
  FROM cinside i CROSS JOIN cvotes v GROUP BY 1, 2
)
SELECT latb, lonb, mcase FROM ccased
WHERE mcase > 0 AND mcase < 15
""",
        # morphology: every inside corner votes its 3x3 box; the
        # center vote marks inside, a full box marks eroded
        "q216_raster_morphology": f"""
WITH {_PTS_CTE},
gcells AS (
  SELECT (lat_i + 900000000) >> 22 AS latb,
         (lon_i + 1800000000) >> 22 AS lonb, COUNT(*) AS n
  FROM pts GROUP BY 1, 2
),
gthr AS (SELECT COUNT(*) // 128 AS t FROM documents),
ginside AS (
  SELECT latb, lonb FROM gcells, gthr WHERE n > t
),
goffs AS (
  SELECT dy.v AS dy, dx.v AS dx
  FROM (SELECT unnest(range(-1, 2)) AS v) dy
  CROSS JOIN (SELECT unnest(range(-1, 2)) AS v) dx
),
gvotes AS (
  SELECT i.latb + o.dy AS latb, i.lonb + o.dx AS lonb,
    CASE WHEN o.dy = 0 AND o.dx = 0 THEN 1 ELSE 0 END AS ctr
  FROM ginside i CROSS JOIN goffs o
)
SELECT latb, lonb, CAST(COUNT(*) AS BIGINT) AS n_nbrs,
  MAX(ctr) = 1 AS inside,
  COUNT(*) = 9 AS eroded
FROM gvotes GROUP BY 1, 2
""",
        # 1-D EMD: running cumulative of the cross-multiplied
        # histogram imbalance over the bounded bucket table
        "q218_histogram_emd": """
WITH eh1 AS (
  SELECT length(text) // 100 AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n1
  FROM documents WHERE doc_id % 2 = 0 GROUP BY 1
),
eh2 AS (
  SELECT length(text) // 100 AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n2
  FROM documents WHERE doc_id % 2 = 1 GROUP BY 1
),
ej AS (
  SELECT COALESCE(eh1.bucket, eh2.bucket) AS bucket,
    COALESCE(n1, 0) AS n1, COALESCE(n2, 0) AS n2
  FROM eh1 FULL OUTER JOIN eh2 ON eh1.bucket = eh2.bucket
),
et AS (SELECT SUM(n1) AS t1, SUM(n2) AS t2 FROM ej),
ef AS (
  SELECT bucket, n1, n2,
    CAST(SUM(n1 * t.t2 - n2 * t.t1) OVER
      (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
       AND CURRENT ROW) AS BIGINT) AS flow_num,
    CAST(COALESCE(LEAD(bucket) OVER (ORDER BY bucket) - bucket,
                  1) AS BIGINT) AS gap,
    CAST(t.t1 * t.t2 AS BIGINT) AS emd_den
  FROM ej, et t
)
SELECT bucket, n1, n2, flow_num, gap,
  CAST(abs(flow_num) * gap AS BIGINT) AS emd_term, emd_den
FROM ef
""",
        # link prediction: apex wedge join for CN, degree product
        # for PA, edge flag via left join
        "q220_link_prediction": """
WITH ledges AS (
  SELECT DISTINCT
    'host' || CAST(doc_id % 23 AS VARCHAR) AS src,
    'host' || CAST(((doc_id * 2654435761) % 4294967296) % 23
      AS VARCHAR) AS dst
  FROM documents
  WHERE doc_id % 3 = 0
    AND doc_id % 23 <> ((doc_id * 2654435761) % 4294967296) % 23
),
lund AS (
  SELECT src, dst FROM ledges
  UNION
  SELECT dst AS src, src AS dst FROM ledges
),
ldeg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
         FROM lund GROUP BY 1),
lcn AS (
  SELECT l.dst AS a, r.dst AS b,
         CAST(COUNT(*) AS BIGINT) AS cn
  FROM lund l JOIN lund r
    ON l.src = r.src AND l.dst < r.dst
  GROUP BY 1, 2
)
SELECT c.a, c.b, c.cn, da.deg AS deg_a, db.deg AS deg_b,
  CAST(da.deg * db.deg AS BIGINT) AS pa,
  EXISTS (SELECT 1 FROM lund u
          WHERE u.src = c.a AND u.dst = c.b) AS is_edge
FROM lcn c
JOIN ldeg da ON da.node = c.a
JOIN ldeg db ON db.node = c.b
""",
        # weighted lower median: 2*cumw >= W prefix, first row
        "q221_weighted_median": """
WITH wm AS (
  SELECT event_type AS key,
    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
         AS BIGINT) AS x,
    CAST(1 + event_id % 7 AS BIGINT) AS g,
    event_id AS i
  FROM events
),
wmc AS (
  SELECT key, x, g, i,
    SUM(g) OVER (PARTITION BY key ORDER BY x, i
                 ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS cumw,
    SUM(g) OVER (PARTITION BY key) AS W
  FROM wm
),
wmq AS (
  SELECT key, x, W,
    ROW_NUMBER() OVER (PARTITION BY key ORDER BY x, i) AS rn
  FROM wmc WHERE 2 * cumw >= W
)
SELECT key, x AS wmedian, CAST(W AS BIGINT) AS total_w
FROM wmq WHERE rn = 1
""",
        # contiguous 3-run counts, order pinned by (ts, event_id)
        "q223_seq_patterns": """
WITH sq AS (
  SELECT user_id, event_type,
    LEAD(event_type, 1) OVER w AS e2,
    LEAD(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_type || '>' || e2 || '>' || e3 AS gram,
  CAST(COUNT(*) AS BIGINT) AS n_runs
FROM sq WHERE event_type IS NOT NULL AND e2 IS NOT NULL
  AND e3 IS NOT NULL
GROUP BY 1
""",
        # survival: span-endpoint deltas, one calendar running sum
        "q224_survival_counts": """
WITH sspans AS (
  SELECT user_id,
    MIN(CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
        AS BIGINT)) AS f,
    MAX(CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
        AS BIGINT)) AS l
  FROM events GROUP BY 1
),
sdelta AS (
  SELECT day, SUM(d) AS d FROM (
    SELECT f AS day, 1 AS d FROM sspans
    UNION ALL
    SELECT l + 1 AS day, -1 AS d FROM sspans
  ) GROUP BY 1
),
sdeaths AS (
  SELECT l AS day, CAST(COUNT(*) AS BIGINT) AS deaths
  FROM sspans GROUP BY 1
),
scurve AS (
  SELECT COALESCE(sdelta.day, sdeaths.day) AS day,
    COALESCE(sdelta.d, 0) AS d,
    COALESCE(sdeaths.deaths, 0) AS deaths
  FROM sdelta FULL OUTER JOIN sdeaths
    ON sdelta.day = sdeaths.day
)
SELECT day,
  CAST(SUM(d) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
       PRECEDING AND CURRENT ROW) AS BIGINT) AS at_risk,
  deaths
FROM scurve
QUALIFY at_risk > 0
""",
        # Hamilton apportionment: floor quotas + largest remainders
        "q230_apportion_budget": """
WITH astr AS (
  SELECT 'host' || CAST(doc_id % 23 AS VARCHAR) AS stratum,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1
),
atot AS (SELECT CAST(SUM(n) AS BIGINT) AS ntot FROM astr),
aq AS (
  SELECT a.stratum, a.n,
    CAST((1000 * a.n) // t.ntot AS BIGINT) AS q0,
    CAST((1000 * a.n) % t.ntot AS BIGINT) AS rem
  FROM astr a, atot t
),
al AS (SELECT CAST(1000 - SUM(q0) AS BIGINT) AS L FROM aq),
ar AS (
  SELECT stratum, n, q0, rem,
    ROW_NUMBER() OVER (ORDER BY rem DESC, stratum) AS rk
  FROM aq
)
SELECT stratum, n,
  CAST(q0 + CASE WHEN rk <= l.L THEN 1 ELSE 0 END AS BIGINT)
    AS quota
FROM ar, al l
""",
        # purity: the unrolled k-means oracle joined to labels,
        # per-cluster argmax by (count DESC, label ASC)
        "q231_cluster_purity": f"""
WITH asg AS ({_kmeans_oracle()}),
pj AS (
  SELECT a.cluster, CAST(e.label AS BIGINT) AS label
  FROM asg a JOIN embeddings e ON e.vec_id = a.vec_id
),
pc AS (
  SELECT cluster, label, CAST(COUNT(*) AS BIGINT) AS c
  FROM pj GROUP BY 1, 2
),
pr AS (
  SELECT cluster, label, c,
    ROW_NUMBER() OVER (PARTITION BY cluster
                       ORDER BY c DESC, label) AS rn,
    SUM(c) OVER (PARTITION BY cluster) AS tot,
    COUNT(*) OVER (PARTITION BY cluster) AS nl
  FROM pc
)
SELECT cluster, label AS major_label, c AS n_major,
  CAST(tot AS BIGINT) AS n_total, CAST(nl AS BIGINT) AS n_labels
FROM pr WHERE rn = 1
""",
        # Gini: sorted-rank closed form over the cell rollup
        "q232_cell_gini": f"""
WITH {_PTS_CTE},
gci AS (
  SELECT ((lat_i + 900000000) >> 22) * 1024
         + ((lon_i + 1800000000) >> 22) AS id,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM pts GROUP BY 1
),
gcr AS (
  SELECT x, CAST(ROW_NUMBER() OVER (ORDER BY x, id) AS BIGINT)
         AS i
  FROM gci
)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(x) AS BIGINT) AS total,
  CAST(2 * SUM(i * x) - (COUNT(*) + 1) * SUM(x) AS BIGINT)
    AS gini_num,
  CAST(COUNT(*) * SUM(x) AS BIGINT) AS gini_den
FROM gcr
""",
        # cover compaction: complete 4-child families collapse,
        # two unrolled levels
        "q233_cover_compaction": f"""
WITH {_PTS_CTE},
cc0 AS (
  SELECT DISTINCT (lat_i + 900000000) >> 22 AS latb,
                  (lon_i + 1800000000) >> 22 AS lonb
  FROM pts
),
cp1 AS (
  SELECT latb >> 1 AS platb, lonb >> 1 AS plonb, COUNT(*) AS nc
  FROM cc0 GROUP BY 1, 2
),
cm1 AS (SELECT platb, plonb FROM cp1 WHERE nc = 4),
ck0 AS (
  SELECT CAST(0 AS BIGINT) AS level, latb, lonb FROM cc0 c
  WHERE NOT EXISTS (SELECT 1 FROM cm1 m
    WHERE m.platb = c.latb >> 1 AND m.plonb = c.lonb >> 1)
),
cc1 AS (SELECT platb AS latb, plonb AS lonb FROM cm1),
cp2 AS (
  SELECT latb >> 1 AS platb, lonb >> 1 AS plonb, COUNT(*) AS nc
  FROM cc1 GROUP BY 1, 2
),
cm2 AS (SELECT platb, plonb FROM cp2 WHERE nc = 4),
ck1 AS (
  SELECT CAST(1 AS BIGINT) AS level, latb, lonb FROM cc1 c
  WHERE NOT EXISTS (SELECT 1 FROM cm2 m
    WHERE m.platb = c.latb >> 1 AND m.plonb = c.lonb >> 1)
)
SELECT * FROM ck0
UNION ALL SELECT * FROM ck1
UNION ALL SELECT CAST(2 AS BIGINT), platb, plonb FROM cm2
""",
        # MVCC: latest visible change per id at ver <= 2,
        # tombstones absent
        "q226_snapshot_read": """
WITH clog AS (
  SELECT doc_id, CAST(0 AS BIGINT) AS ver, text,
         FALSE AS deleted
  FROM documents
  UNION ALL
  SELECT doc_id, CAST(1 + doc_id % 3 AS BIGINT),
         'u ' || text, FALSE
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id, CAST(4 AS BIGINT), '', TRUE
  FROM documents WHERE doc_id % 13 = 0
),
vis AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY ver DESC, deleted DESC)
    AS rn
  FROM clog WHERE ver <= 2
)
SELECT doc_id, ver, text FROM vis WHERE rn = 1 AND NOT deleted
""",
        # bitmap index: bit_or of host one-hots per cell
        "q227_bitmap_cells": f"""
WITH {_PTS_CTE},
bsrc AS (
  SELECT ((lat_i + 900000000) >> 22) * 1024
         + ((lon_i + 1800000000) >> 22) AS grp,
    CAST(1 AS BIGINT) << CAST(doc_id % 23 AS INTEGER) AS w
  FROM pts
),
bbm AS (SELECT grp, bit_or(w) AS bm FROM bsrc GROUP BY 1)
SELECT grp, CAST(bm AS BIGINT) AS bm,
  CAST(bit_count(bm) AS BIGINT) AS n_cats_set
FROM bbm
""",
        # bitmap algebra: word ops between east-neighbor cells
        "q228_bitmap_overlap": f"""
WITH {_PTS_CTE},
bsrc AS (
  SELECT ((lat_i + 900000000) >> 22) * 1024
         + ((lon_i + 1800000000) >> 22) AS grp,
    CAST(1 AS BIGINT) << CAST(doc_id % 23 AS INTEGER) AS w
  FROM pts
),
bbm AS (SELECT grp, bit_or(w) AS bm FROM bsrc GROUP BY 1)
SELECT a.grp AS grp_a, b.grp AS grp_b,
  CAST(bit_count(a.bm & b.bm) AS BIGINT) AS n_both,
  CAST(bit_count(a.bm | b.bm) AS BIGINT) AS n_either,
  CAST(bit_count(a.bm & ~b.bm) AS BIGINT) AS n_only_a
FROM bbm a JOIN bbm b ON b.grp = a.grp + 1
WHERE a.grp % 1024 <> 1023
""",
        # k-anonymity: publish-or-generalize, residue flagged
        "q229_k_anonymity": f"""
WITH {_PTS_CTE},
kc0 AS (
  SELECT (lat_i + 900000000) >> 18 AS latb,
         (lon_i + 1800000000) >> 18 AS lonb,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM pts GROUP BY 1, 2
),
kr0 AS (SELECT * FROM kc0 WHERE n < 10),
kc1 AS (
  SELECT latb >> 2 AS latb, lonb >> 2 AS lonb,
         CAST(SUM(n) AS BIGINT) AS n
  FROM kr0 GROUP BY 1, 2
),
kr1 AS (SELECT * FROM kc1 WHERE n < 10),
kc2 AS (
  SELECT latb >> 2 AS latb, lonb >> 2 AS lonb,
         CAST(SUM(n) AS BIGINT) AS n
  FROM kr1 GROUP BY 1, 2
)
SELECT latb, lonb, CAST(0 AS BIGINT) AS level, n AS n_pub,
       FALSE AS suppressed
FROM kc0 WHERE n >= 10
UNION ALL
SELECT latb, lonb, CAST(1 AS BIGINT), n, FALSE
FROM kc1 WHERE n >= 10
UNION ALL
SELECT latb, lonb, CAST(2 AS BIGINT), n, n < 10 FROM kc2
""",
        # D8: argmin occupied neighbor via (n, dy, dx) ranking,
        # strictly-lower gate, pits at (0,0), inflow second pass
        "q225_flow_directions": f"""
WITH {_PTS_CTE},
fcells AS (
  SELECT (lat_i + 900000000) >> 22 AS latb,
         (lon_i + 1800000000) >> 22 AS lonb,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM pts GROUP BY 1, 2
),
foffs AS (
  SELECT dy.v AS dy, dx.v AS dx
  FROM (SELECT unnest(range(-1, 2)) AS v) dy
  CROSS JOIN (SELECT unnest(range(-1, 2)) AS v) dx
  WHERE NOT (dy.v = 0 AND dx.v = 0)
),
fnbr AS (
  SELECT c.latb, c.lonb, c.n, o.dy, o.dx, t.n AS n_nbr,
    ROW_NUMBER() OVER (PARTITION BY c.latb, c.lonb
                       ORDER BY t.n, o.dy, o.dx) AS rn
  FROM fcells c
  JOIN foffs o ON TRUE
  JOIN fcells t ON t.latb = c.latb + o.dy
               AND t.lonb = c.lonb + o.dx
),
fbest AS (
  SELECT latb, lonb, n,
    CASE WHEN n_nbr < n THEN dy ELSE 0 END AS dir_dy,
    CASE WHEN n_nbr < n THEN dx ELSE 0 END AS dir_dx
  FROM fnbr WHERE rn = 1
  UNION ALL
  SELECT c.latb, c.lonb, c.n, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  FROM fcells c
  WHERE NOT EXISTS (SELECT 1 FROM fnbr f
                    WHERE f.latb = c.latb AND f.lonb = c.lonb)
),
finflow AS (
  SELECT latb + dir_dy AS latb, lonb + dir_dx AS lonb,
         CAST(COUNT(*) AS BIGINT) AS inflow
  FROM fbest WHERE dir_dy <> 0 OR dir_dx <> 0
  GROUP BY 1, 2
)
SELECT b.latb, b.lonb, b.n,
  CAST(b.dir_dy AS BIGINT) AS dir_dy,
  CAST(b.dir_dx AS BIGINT) AS dir_dx,
  COALESCE(i.inflow, 0) AS inflow
FROM fbest b LEFT JOIN finflow i
  ON i.latb = b.latb AND i.lonb = b.lonb
""",
        "q206_olap_rollup": """
WITH fact AS (
  SELECT n.n_name, CAST(month(o.o_orderdate) AS BIGINT) AS month,
    CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT n_name, month,
  CAST(SUM(cents) AS BIGINT) AS revenue_cents,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(GROUPING(n_name) * 2 + GROUPING(month) AS BIGINT) AS gid
FROM fact
GROUP BY ROLLUP (n_name, month)
""",
        "q205_trend_slopes": """
WITH daily AS (
  SELECT event_type AS key,
    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
         AS BIGINT) AS day,
    CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
centered AS (
  SELECT key, day - MIN(day) OVER (PARTITION BY key) AS t, y
  FROM daily
),
sums AS (
  SELECT key, CAST(COUNT(*) AS BIGINT) AS n_days,
    CAST(SUM(t) AS BIGINT) AS st, CAST(SUM(y) AS BIGINT) AS sy,
    CAST(SUM(t * y) AS BIGINT) AS sty,
    CAST(SUM(t * t) AS BIGINT) AS stt
  FROM centered GROUP BY 1
)
SELECT key AS event_type, n_days, sy,
  CAST(n_days * sty - st * sy AS BIGINT) AS slope_num,
  CAST(n_days * stt - st * st AS BIGINT) AS slope_den
FROM sums
""",
        "q204_crawl_pipeline": """
WITH urls AS (
  SELECT 'https://host' || CAST(doc_id % 11 AS VARCHAR)
         || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents
  UNION ALL
  SELECT 'https://host0.example.com/cal/'
         || CAST(doc_id AS VARCHAR) || '/x'
  FROM documents WHERE doc_id % 2 = 0
),
parsed AS (
  SELECT url,
    regexp_extract(url,
      '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#:]*)', 1) AS host,
    COALESCE(NULLIF(regexp_extract(url,
      '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1), ''),
      '/') AS path
  FROM urls
),
rules AS (
  SELECT 'host' || CAST(t.h AS VARCHAR) || '.example.com' AS host,
    p.path_prefix, CAST(p.allow AS BIGINT) AS allow
  FROM range(11) t(h),
    (VALUES ('/', 1), ('/doc/1', 0), ('/doc/13', 1))
      p(path_prefix, allow)
),
cand AS (
  SELECT u.url, u.host, u.path, r.path_prefix, r.allow
  FROM parsed u LEFT JOIN rules r USING (host)
  WHERE r.path_prefix IS NULL
     OR starts_with(u.path, r.path_prefix)
),
gated AS (
  SELECT url, host, path, COALESCE(allow, 1) AS allow FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY url
      ORDER BY length(COALESCE(path_prefix, '')) DESC,
               allow DESC, path_prefix ASC) AS rn
    FROM cand) WHERE rn = 1
),
allowed AS (
  SELECT url, host,
    regexp_replace(path, '[0-9]+', '{n}', 'g') AS template
  FROM gated WHERE allow = 1
),
traps AS (
  SELECT host, template FROM allowed
  GROUP BY 1, 2 HAVING COUNT(*) >= 100
),
survivors AS (
  SELECT a.url FROM allowed a
  LEFT JOIN traps t
    ON a.host = t.host AND a.template = t.template
  WHERE t.host IS NULL
),
withhost AS (
  SELECT url,
    regexp_extract(url,
      '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#:]*)', 1) AS host
  FROM survivors
),
ranked AS (
  SELECT url, host,
    CAST(ROW_NUMBER() OVER (PARTITION BY host ORDER BY url)
         AS BIGINT) AS slot,
    CAST(COUNT(*) OVER (PARTITION BY host) AS BIGINT) AS n
  FROM withhost
)
SELECT url, host, slot,
  CAST((slot - 1) // 3 AS BIGINT) AS round,
  CAST((n + 2) // 3 AS BIGINT) AS n_rounds
FROM ranked
""",
        "q203_key_skew": """
WITH counts AS (
  SELECT CAST(user_id AS VARCHAR) AS key,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
bucketed AS (
  SELECT key, n,
    CAST(length(printf('%b', n)) - 1 AS BIGINT) AS bucket
  FROM counts
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY bucket ORDER BY n DESC, key DESC) AS rn
  FROM bucketed
)
SELECT b.bucket, CAST(COUNT(*) AS BIGINT) AS n_keys,
  CAST(SUM(b.n) AS BIGINT) AS n_rows,
  CAST(MAX(b.n) AS BIGINT) AS max_count,
  MAX(r.key) AS hottest_key
FROM bucketed b
JOIN ranked r ON r.bucket = b.bucket AND r.rn = 1
GROUP BY b.bucket
""",
        "q201_sorted_neighborhood": """
WITH docs AS (
  SELECT doc_id AS place_id,
    lower(string_split(text, ' ')[1]) AS name_key, n_chars
  FROM documents
),
ranked AS (
  SELECT place_id,
    CAST(ROW_NUMBER() OVER (
      ORDER BY name_key, n_chars, place_id) AS BIGINT) AS rank
  FROM docs
)
SELECT a.place_id AS a, b.place_id AS b,
  a.rank AS rank_a, b.rank AS rank_b
FROM ranked a JOIN ranked b
  ON b.rank > a.rank AND b.rank - a.rank < 4
""",
        "q200_decayed_scores": """
WITH base AS (
  SELECT event_type AS key,
    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
         AS BIGINT) AS day
  FROM events
),
ref AS (SELECT MAX(day) AS ref_day FROM base),
aged AS (
  SELECT key, ref_day - day AS age FROM base, ref
  WHERE ref_day - day < 56
)
SELECT key AS event_type,
  CAST(SUM(1 << (8 - (age // 7))) AS BIGINT) AS num,
  CAST(256 AS BIGINT) AS den,
  CAST(COUNT(*) AS BIGINT) AS n_events
FROM aged GROUP BY 1
""",
        "q199_skipgrams": """
WITH toks AS (
  SELECT doc_id, t.term, t.pos
  FROM (SELECT doc_id, string_split(text, ' ') AS ts
        FROM documents) s,
    LATERAL (SELECT unnest(ts) AS term,
                    generate_subscripts(ts, 1) AS pos) t
  WHERE t.term <> ''
)
SELECT a.term AS center, b.term AS context,
  CAST(COUNT(*) AS BIGINT) AS n
FROM toks a JOIN toks b
  ON a.doc_id = b.doc_id
 AND b.pos - a.pos BETWEEN 1 AND 2
GROUP BY 1, 2 HAVING COUNT(*) >= 2
""",
        "q198_recrawl_estimate": """
WITH crawls AS (
  SELECT 'https://h.example.com/p/' || CAST(doc_id AS VARCHAR)
           AS url,
    CAST(k AS BIGINT) AS warc_ts,
    CASE WHEN doc_id % 4 = 0 THEN CAST(k AS VARCHAR)
         WHEN doc_id % 4 = 1 THEN
           CAST(CAST(k >= 2 AS INTEGER) AS VARCHAR)
         ELSE '0' END AS fp
  FROM documents, LATERAL (SELECT unnest(range(0, 5)) AS k) t
  WHERE doc_id % 4 <> 3 OR k = 0
),
marked AS (
  SELECT url,
    CASE WHEN LAG(fp) OVER w IS NULL THEN 0
         WHEN LAG(fp) OVER w <> fp THEN 1 ELSE 0 END AS chg
  FROM crawls
  WINDOW w AS (PARTITION BY url ORDER BY warc_ts)
),
agg AS (
  SELECT url, CAST(COUNT(*) AS BIGINT) AS n_obs,
    CAST(SUM(chg) AS BIGINT) AS n_changes
  FROM marked GROUP BY 1
)
SELECT url, n_obs, n_changes,
  CAST(CASE WHEN n_obs > 1 THEN n_obs - 1 ELSE 0 END AS BIGINT)
    AS n_intervals,
  CAST(CASE WHEN n_obs <= 1 THEN 1
       WHEN n_changes * 2 >= n_obs - 1 THEN 2
       WHEN n_changes = 0 THEN 0
       ELSE 1 END AS BIGINT) AS tier
FROM agg
""",
        "q196_jaccard_prefix": """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
),
dt AS (
  SELECT DISTINCT doc_id,
    ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS term
  FROM toks,
    LATERAL (SELECT unnest(range(1, len(ts) - 1)) AS i) r
  WHERE len(ts) >= 3
),
sizes AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM dt GROUP BY 1
),
inter AS (
  SELECT a.doc_id AS a, b.doc_id AS b,
    CAST(COUNT(*) AS BIGINT) AS inter
  FROM dt a JOIN dt b
    ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.a, i.b, i.inter, sa.n AS na, sb.n AS nb
FROM inter i
JOIN sizes sa ON sa.doc_id = i.a
JOIN sizes sb ON sb.doc_id = i.b
WHERE i.inter * 3 >= 1 * (sa.n + sb.n)
""",
        "q195_spatial_outliers": f"""
WITH {_PTS_CTE},
pv AS (
  SELECT p.doc_id, p.lat_i, p.lon_i,
    CAST(d.n_chars AS BIGINT) AS v
  FROM pts p JOIN documents d USING (doc_id)
  WHERE p.doc_id % 5 = 0
),
nb AS (
  SELECT a.doc_id AS a, b.doc_id AS b, b.v AS bv
  FROM pv a JOIN pv b ON a.doc_id <> b.doc_id
  WHERE (a.lat_i - b.lat_i) * (a.lat_i - b.lat_i)
      + (a.lon_i - b.lon_i) * (a.lon_i - b.lon_i)
      <= CAST(8000000 AS BIGINT) * CAST(8000000 AS BIGINT)
),
med AS (
  SELECT a, bv AS med, n AS n_neighbors FROM (
    SELECT a, b, bv,
      ROW_NUMBER() OVER (PARTITION BY a ORDER BY bv, b) AS rn,
      COUNT(*) OVER (PARTITION BY a) AS n
    FROM nb)
  WHERE rn = (n + 1) // 2 AND n >= 3
),
devs AS (
  SELECT nb.a, nb.b, ABS(nb.bv - m.med) AS dev
  FROM nb JOIN med m ON nb.a = m.a
),
mad AS (
  SELECT a, dev AS mad FROM (
    SELECT a, b, dev,
      ROW_NUMBER() OVER (PARTITION BY a ORDER BY dev, b) AS rn,
      COUNT(*) OVER (PARTITION BY a) AS n
    FROM devs)
  WHERE rn = (n + 1) // 2
)
SELECT m.a AS doc_id, p.v, CAST(m.med AS BIGINT) AS med,
  CAST(d.mad AS BIGINT) AS mad,
  CAST(m.n_neighbors AS BIGINT) AS n_neighbors
FROM med m JOIN mad d ON m.a = d.a
JOIN pv p ON p.doc_id = m.a
WHERE ABS(p.v - m.med) > 3 * d.mad
""",
        "q193_robots_gate": """
WITH urls AS (
  SELECT 'https://host' || CAST(doc_id % 11 AS VARCHAR)
         || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
    'host' || CAST(doc_id % 11 AS VARCHAR) || '.example.com' AS host,
    '/doc/' || CAST(doc_id AS VARCHAR) AS path
  FROM documents
),
rules AS (
  SELECT 'host' || CAST(t.h AS VARCHAR) || '.example.com' AS host,
    p.path_prefix, CAST(p.allow AS BIGINT) AS allow
  FROM range(11) t(h),
    (VALUES ('/', 1), ('/doc/1', 0), ('/doc/13', 1))
      p(path_prefix, allow)
),
cand AS (
  SELECT u.url, u.host, u.path, r.path_prefix, r.allow
  FROM urls u LEFT JOIN rules r USING (host)
  WHERE r.path_prefix IS NULL
     OR starts_with(u.path, r.path_prefix)
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY url
    ORDER BY length(COALESCE(path_prefix, '')) DESC,
             allow DESC, path_prefix ASC) AS rn
  FROM cand
)
SELECT url, host, path, path_prefix AS matched_prefix,
  CAST(COALESCE(allow, 1) AS BIGINT) AS allow
FROM ranked WHERE rn = 1
""",
        "q192_seed_pagerank": """
WITH edges AS (
  SELECT DISTINCT
    'host' || CAST(doc_id % 23 AS VARCHAR) AS src,
    'host' || CAST(((doc_id * 2654435761) % 4294967296) % 23
      AS VARCHAR) AS dst
  FROM documents
  WHERE doc_id % 3 = 0
    AND doc_id % 23 <> ((doc_id * 2654435761) % 4294967296) % 23
),
hosts AS (SELECT src AS host FROM edges UNION SELECT dst FROM edges),
sf AS (
  SELECT host,
    CASE WHEN host IN ('host0','host1','host2')
         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS seed
  FROM hosts),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS out_deg
        FROM edges GROUP BY 1),
r0 AS (SELECT host, CAST(seed * 1000000000000 AS BIGINT) AS rank
       FROM sf),
s1 AS (
  SELECT e.dst AS host, SUM(r.rank // d.out_deg) AS s
  FROM edges e JOIN r0 r ON e.src = r.host
  JOIN deg d ON e.src = d.src GROUP BY 1),
r1 AS (
  SELECT f.host,
    CAST(f.seed * 150000000000
         + (85 * COALESCE(s1.s, 0)) // 100 AS BIGINT) AS rank
  FROM sf f LEFT JOIN s1 ON f.host = s1.host),
s2 AS (
  SELECT e.dst AS host, SUM(r.rank // d.out_deg) AS s
  FROM edges e JOIN r1 r ON e.src = r.host
  JOIN deg d ON e.src = d.src GROUP BY 1),
r2 AS (
  SELECT f.host,
    CAST(f.seed * 150000000000
         + (85 * COALESCE(s2.s, 0)) // 100 AS BIGINT) AS rank
  FROM sf f LEFT JOIN s2 ON f.host = s2.host),
s3 AS (
  SELECT e.dst AS host, SUM(r.rank // d.out_deg) AS s
  FROM edges e JOIN r2 r ON e.src = r.host
  JOIN deg d ON e.src = d.src GROUP BY 1),
r3 AS (
  SELECT f.host,
    CAST(f.seed * 150000000000
         + (85 * COALESCE(s3.s, 0)) // 100 AS BIGINT) AS rank
  FROM sf f LEFT JOIN s3 ON f.host = s3.host)
SELECT host, rank FROM r3
""",
        "q68_host_pagerank": """
WITH edges AS (
  SELECT DISTINCT
    'host' || CAST(doc_id % 23 AS VARCHAR) AS src,
    'host' || CAST(((doc_id * 2654435761) % 4294967296) % 23
      AS VARCHAR) AS dst
  FROM documents
  WHERE doc_id % 3 = 0
    AND doc_id % 23 <> ((doc_id * 2654435761) % 4294967296) % 23
),
hosts AS (SELECT src AS host FROM edges UNION SELECT dst FROM edges),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS out_deg
        FROM edges GROUP BY 1),
r0 AS (SELECT host, CAST(1000000000000 AS BIGINT) AS rank FROM hosts),
s1 AS (
  SELECT e.dst AS host, SUM(r.rank // d.out_deg) AS s
  FROM edges e JOIN r0 r ON e.src = r.host
  JOIN deg d ON e.src = d.src GROUP BY 1),
r1 AS (
  SELECT h.host,
    CAST(150000000000 + (85 * COALESCE(s1.s, 0)) // 100 AS BIGINT)
      AS rank
  FROM hosts h LEFT JOIN s1 ON h.host = s1.host),
s2 AS (
  SELECT e.dst AS host, SUM(r.rank // d.out_deg) AS s
  FROM edges e JOIN r1 r ON e.src = r.host
  JOIN deg d ON e.src = d.src GROUP BY 1),
r2 AS (
  SELECT h.host,
    CAST(150000000000 + (85 * COALESCE(s2.s, 0)) // 100 AS BIGINT)
      AS rank
  FROM hosts h LEFT JOIN s2 ON h.host = s2.host),
s3 AS (
  SELECT e.dst AS host, SUM(r.rank // d.out_deg) AS s
  FROM edges e JOIN r2 r ON e.src = r.host
  JOIN deg d ON e.src = d.src GROUP BY 1),
r3 AS (
  SELECT h.host,
    CAST(150000000000 + (85 * COALESCE(s3.s, 0)) // 100 AS BIGINT)
      AS rank
  FROM hosts h LEFT JOIN s3 ON h.host = s3.host)
SELECT host, rank FROM r3
""",
        "q67_boilerplate": """
WITH docs2 AS (
  SELECT doc_id, concat_ws(chr(10),
    'NAV HOME ABOUT CONTACT',
    substr(text, 1, 60),
    CASE WHEN doc_id % 2 = 0 THEN 'COPYRIGHT 2026 EXAMPLE CORP' END,
    CASE WHEN doc_id % 10 = 0 THEN 'SHARE LIKE SUBSCRIBE' END,
    'tail ' || CAST(doc_id AS VARCHAR)) AS text
  FROM documents
),
split AS (
  SELECT doc_id, string_split(text, chr(10)) AS l FROM docs2
),
lines AS (
  SELECT doc_id, unnest(l) AS line,
         generate_subscripts(l, 1) AS pos
  FROM split
),
freq AS (
  SELECT line, COUNT(DISTINCT doc_id) AS n_docs
  FROM lines GROUP BY 1
),
boiler AS (
  SELECT line FROM freq
  WHERE n_docs > (SELECT COUNT(*) FROM documents) * 0.3
),
kept AS (
  SELECT doc_id, pos, line FROM lines
  WHERE line NOT IN (SELECT line FROM boiler)
),
reb AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         string_agg(line, chr(10) ORDER BY pos) AS clean_text
  FROM kept GROUP BY 1
)
SELECT d.doc_id,
  CAST(len(string_split(d.text, chr(10))) AS BIGINT) AS n_lines,
  COALESCE(r.n_kept, 0) AS n_kept,
  COALESCE(r.clean_text, '') AS clean_text
FROM docs2 d LEFT JOIN reb r ON d.doc_id = r.doc_id
""",
        "q66_blocklist": """
WITH raw AS (
  SELECT doc_id,
    (CASE WHEN doc_id%5=0 THEN 'www.'
          WHEN doc_id%7=0 THEN 'sub' || CAST(doc_id%3 AS VARCHAR)
            || '.'
          ELSE '' END)
    || 'host' || CAST(doc_id%23 AS VARCHAR)
    || (CASE doc_id%4 WHEN 0 THEN '.example.com'
         WHEN 1 THEN '.co.uk' WHEN 2 THEN '.org'
         ELSE '.com.au' END) AS host
  FROM documents
),
pages AS (
  SELECT doc_id, host,
    'https://' || host || '/p/' || CAST(doc_id AS VARCHAR) AS url
  FROM raw
),
reg AS (
  SELECT doc_id, url,
    CASE WHEN len(string_split(host, '.')) <= 2 THEN host
         WHEN array_to_string(list_slice(string_split(host, '.'),
             len(string_split(host, '.')) - 1,
             len(string_split(host, '.'))), '.')
           IN ('co.uk','org.uk','ac.uk','gov.uk','com.au','net.au',
               'org.au','co.jp','ne.jp','or.jp','com.br','com.cn',
               'co.in','co.kr','com.mx')
         THEN array_to_string(list_slice(string_split(host, '.'),
             len(string_split(host, '.')) - 2,
             len(string_split(host, '.'))), '.')
         ELSE array_to_string(list_slice(string_split(host, '.'),
             len(string_split(host, '.')) - 1,
             len(string_split(host, '.'))), '.')
    END AS reg_domain
  FROM pages
)
SELECT doc_id, url FROM reg
WHERE reg_domain NOT IN
  ('example.com', 'host3.co.uk', 'host7.org', 'never.example.net')
""",
        "q61_corpus_filter": _Q61_ORACLE,
        "q62_stratified_sample": """
SELECT doc_id, lang FROM documents
WHERE ((doc_id + 7) * 2654435761) % 4294967296 <
  (CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25
        WHEN 'fr' THEN 0.25 ELSE 0.1 END) * 4294967296
""",
        "q63_pack_plan": """
WITH t AS (
  SELECT doc_id,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
    CAST(SUM(n_tokens) OVER (ORDER BY doc_id) AS BIGINT)
      AS cum_tokens
  FROM t
)
SELECT doc_id, n_tokens, cum_tokens,
  CAST((cum_tokens - n_tokens) // 512 AS BIGINT) AS bin,
  CAST((cum_tokens - n_tokens) % 512 AS BIGINT) AS bin_offset
FROM c
""",
        "q53_decontaminate": """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
g AS (
  SELECT doc_id,
    CASE WHEN len(t) >= 3 THEN list_transform(
      range(1, len(t) - 1),
      i -> t[i] || chr(31) || t[i+1] || chr(31) || t[i+2])
    ELSE CAST([] AS VARCHAR[]) END AS g
  FROM t
),
eg AS (
  SELECT DISTINCT unnest(g) AS gr FROM g WHERE doc_id % 97 = 0
),
cg AS (
  SELECT doc_id, unnest(list_distinct(g)) AS gr
  FROM g WHERE doc_id % 97 <> 0
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM cg JOIN eg USING (gr)
GROUP BY doc_id
""",
        "q12_quality": """
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS text_len,
  CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT)
    AS n_spaces,
  CAST(length(text) - length(replace(text, '.', '')) AS BIGINT)
    AS n_dots,
  CASE WHEN length(text) >= 300 THEN 'long' ELSE 'short' END
    AS len_bucket
FROM documents
""",
        "q13_lang_id": """
WITH s AS (
  SELECT doc_id, ' ' || text || ' ' AS t FROM documents
),
sc AS (
  SELECT doc_id,
    CAST(length(t) - length(replace(t, ' the ', ' ')) AS BIGINT)
      AS score_en,
    CAST(length(t) - length(replace(t, ' der ', ' ')) AS BIGINT)
      AS score_de,
    CAST(length(t) - length(replace(t, ' le ', ' ')) AS BIGINT)
      AS score_fr
  FROM s
)
SELECT doc_id, score_en, score_de, score_fr,
  CASE WHEN score_en >= score_de AND score_en >= score_fr
            AND score_en > 0 THEN 'en'
       WHEN score_de >= score_fr AND score_de > 0 THEN 'de'
       WHEN score_fr > 0 THEN 'fr'
       ELSE 'und' END AS lang_pred
FROM sc
""",
        "q14_fingerprint": """
SELECT d.doc_id,
  MIN(md5(substr(d.text, CAST(i.i AS INTEGER), 8))) AS fp
FROM documents d
CROSS JOIN LATERAL (
  SELECT unnest(range(1, greatest(length(d.text) - 7, 1) + 1)) AS i
) i
GROUP BY d.doc_id
""",
        "q15_dedup_exact": """
SELECT md5(substr(text, 1, 40)) AS fp,
       MIN(doc_id) AS keeper,
       COUNT(*) AS n_dups
FROM documents GROUP BY 1
""",
        "q16_radius_pairs": f"""
WITH {_PTS_CTE},
sub AS (SELECT * FROM pts WHERE doc_id % 5 = 0)
SELECT a.doc_id AS a, b.doc_id AS b,
  (a.lat_i - b.lat_i) * (a.lat_i - b.lat_i)
    + (a.lon_i - b.lon_i) * (a.lon_i - b.lon_i) AS dist2
FROM sub a JOIN sub b ON a.doc_id <> b.doc_id
WHERE (a.lat_i - b.lat_i) * (a.lat_i - b.lat_i)
    + (a.lon_i - b.lon_i) * (a.lon_i - b.lon_i)
    <= {2_000_000 * 2_000_000}
""",
        "q17_ngram_jaccard": _q17_oracle(),
        "q174_containment": _containment_oracle(),
        "q178_label_scatter": """
WITH per_dim AS (
  SELECT label, generate_subscripts(qv, 1) AS dim, unnest(qv) AS x
  FROM (
    SELECT label,
      list_transform(embedding,
        e -> CAST(floor(CAST(e AS DOUBLE) * 128) AS BIGINT)) AS qv
    FROM (SELECT CAST(label AS BIGINT) AS label, embedding
          FROM embeddings)
  )
),
sums AS (
  SELECT label, dim, SUM(x) AS sx, SUM(x * x) AS sxx,
         COUNT(*) AS n
  FROM per_dim GROUP BY 1, 2
)
SELECT label,
  CAST(MAX(n) AS BIGINT) AS n_vectors,
  CAST(SUM(sxx) AS BIGINT) AS sum_sq,
  CAST(SUM(sx * sx) AS BIGINT) AS norm_sum_sq,
  CAST(MAX(n) * SUM(sxx) - SUM(sx * sx) AS BIGINT)
    AS scatter_scaled
FROM sums GROUP BY 1
""",
        # next-step funnel chain: per view the earliest in-window
        # click, per that click the earliest in-window purchase
        "q177_sequence_funnel": """
WITH e AS (
  SELECT user_id, event_id, event_type,
         epoch_us(ts) AS us
  FROM events
),
v AS (SELECT user_id, event_id, us FROM e
      WHERE event_type = 'view'),
c AS (SELECT user_id, us FROM e WHERE event_type = 'click'),
p AS (SELECT user_id, us FROM e WHERE event_type = 'purchase'),
anchors AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_anchors
  FROM v GROUP BY 1
),
step1 AS (
  SELECT v.user_id, v.event_id, MIN(c.us) AS us
  FROM v JOIN c ON c.user_id = v.user_id
    AND c.us > v.us AND c.us <= v.us + 86400000000
  GROUP BY 1, 2
),
step2 AS (
  SELECT s.user_id, s.event_id, MIN(p.us) AS us
  FROM step1 s JOIN p ON p.user_id = s.user_id
    AND p.us > s.us AND p.us <= s.us + 86400000000
  GROUP BY 1, 2
),
conv AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_converted
  FROM step2 GROUP BY 1
)
SELECT a.user_id, a.n_anchors,
  CAST(COALESCE(c2.n_converted, 0) AS BIGINT) AS n_converted
FROM anchors a LEFT JOIN conv c2 USING (user_id)
""",
        "q176_rendezvous_shards": """
WITH sh AS (SELECT unnest(range(0, 16)) AS s),
w AS (
  SELECT d.doc_id, sh.s,
    md5(CAST(sh.s AS VARCHAR) || ':'
        || CAST(d.doc_id AS VARCHAR)) AS h
  FROM documents d CROSS JOIN sh
),
a1 AS (
  SELECT doc_id, CAST(s AS BIGINT) AS shard FROM (
    SELECT doc_id, s, ROW_NUMBER() OVER (
      PARTITION BY doc_id ORDER BY h, s) AS rn FROM w)
  WHERE rn = 1
),
a2 AS (
  SELECT doc_id, CAST(s AS BIGINT) AS shard_after FROM (
    SELECT doc_id, s, ROW_NUMBER() OVER (
      PARTITION BY doc_id ORDER BY h, s) AS rn
    FROM w WHERE s <> 7)
  WHERE rn = 1
)
SELECT a1.doc_id, a1.shard, a2.shard_after,
       a1.shard <> a2.shard_after AS moved
FROM a1 JOIN a2 USING (doc_id)
""",
        "q175_quality_calibration": """
WITH scored AS (
  SELECT doc_id, lang,
    (length(text) - length(replace(text, ' ', ''))) * 1000000
      + length(text) AS score
  FROM documents
),
ranked AS (
  SELECT doc_id, lang, CAST(score AS BIGINT) AS score,
    ROW_NUMBER() OVER (PARTITION BY lang
                       ORDER BY score, doc_id) AS rn,
    COUNT(*) OVER (PARTITION BY lang) AS cnt
  FROM scored
)
SELECT doc_id, lang, score,
  CAST(((rn - 1) * 10) // cnt AS BIGINT) AS decile
FROM ranked
""",
        "q18_keep_filter": _keep_oracle(_KEEP_EXPR),
        "q19_keep_wildcards": _keep_oracle(_KEEP_EXPR2),
        "q20_keep_tags": f"""
WITH {_TAGS_CTE}
SELECT doc_id,
  concat_ws(';',
    CASE WHEN place IS NOT NULL THEN 'place=' || place END,
    CASE WHEN population IS NOT NULL
         THEN 'population=' || population END) AS tags_str
FROM tg
""",
        "q21_tag_key_freq": f"""
WITH {_TAGS_CTE},
k AS (
  SELECT 'place' AS key, COUNT(place) AS cnt FROM tg
  UNION ALL SELECT 'population', COUNT(population) FROM tg
  UNION ALL SELECT 'name', COUNT(name) FROM tg
  UNION ALL SELECT 'highway', COUNT(highway) FROM tg
)
SELECT key, cnt FROM k WHERE cnt > 0
""",
        "q22_csv_projection": f"""
WITH {_TAGS_CTE}, {_PTS_CTE}
SELECT t.doc_id AS id, p.lon_i AS lon, p.lat_i AS lat,
       t.place AS place, t.name AS name
FROM tg t JOIN pts p ON t.doc_id = p.doc_id
""",
    }


def _keep_oracle(expr: str) -> str:
    """Compile a filter expression to its DuckDB oracle over the
    synthesized tags CTE via the SQL backend (sql.py) — the backends
    are independently three-way tested in
    tests/test_filterlang_backends.py."""
    from .filterlang import keep_sql, parse

    pred = keep_sql(parse(expr), lambda k: f'"{k}"', TAG_KEYS)
    return f"WITH {_TAGS_CTE} SELECT doc_id FROM tg WHERE {pred}"
