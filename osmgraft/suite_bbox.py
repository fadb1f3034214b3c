"""q28: G8 bbox tags over the synthetic way world, with a DuckDB
oracle that inlines the regenerated cosrk/cosr tables as VALUES.

The Spark side is pure Catalyst (array-literal lookups inside
whole-stage codegen); the oracle replays the identical integer
formulas in SQL. Both are differentially validated against the C
binary in tests/test_bboxtags_differential.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .geo.bboxtags import bbox_tag_columns, cosr_table, cosrk_table


def q28_bbox_tags(spark, sf_dir):
    from .operators.graph import synth_ways, way_geometry
    from .suite import doc_points, load

    docs = load(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    ways = synth_ways(docs, n)
    geom = way_geometry(ways, doc_points(spark, sf_dir))
    tags = bbox_tag_columns(
        F.col("x_min"), F.col("y_min"), F.col("x_max"), F.col("y_max")
    )
    return geom.select(
        "way_id",
        tags["bBox"].alias("bbox"),
        tags["bBoxArea"].cast("long").alias("bbox_area"),
        tags["bBoxWeight"].cast("long").alias("bbox_weight"),
        tags["bBoxWidth"].cast("long").alias("bbox_width"),
        tags["bBoxWidthWeight"].cast("long").alias("bbox_width_weight"),
    )


def _table_values(tab: list[int]) -> str:
    return ",".join(f"({i},{v})" for i, v in enumerate(tab))


_FIX7 = (
    "(CASE WHEN {c} < 0 THEN '-' ELSE '' END || "
    "CAST(abs({c}) // 10000000 AS VARCHAR) || '.' || "
    "lpad(CAST(abs({c}) % 10000000 AS VARCHAR), 7, '0'))"
)

_MSBIT = (
    "(CASE WHEN {v} = 0 THEN 0 WHEN {v} < 0 THEN 1 "
    "ELSE length(bin({v})) END)"
)


def bbox_oracle_sql(pts_cte: str, graph_ctes: str) -> str:
    return f"""
WITH {pts_cte},
{graph_ctes},
cosrk(i, v) AS (VALUES {_table_values(cosrk_table())}),
cosr(i, v) AS (VALUES {_table_values(cosr_table())}),
res AS (
  SELECT r.way_id, p.lat_i, p.lon_i
  FROM wrefs r JOIN pts p ON p.doc_id = r.ref
),
agg AS (
  SELECT way_id,
         MIN(lon_i) AS x_min, MAX(lon_i) AS x_max,
         MIN(lat_i) AS y_min, MAX(lat_i) AS y_max
  FROM res GROUP BY 1
),
idx AS (
  SELECT *, least(abs((y_min + y_max) // 2) // 1000000, 900) AS i
  FROM agg
),
calc AS (
  SELECT x.way_id, x.x_min, x.y_min, x.x_max, x.y_max,
    (x.x_max - x.x_min) * (x.y_max - x.y_min) // rk.v AS area,
    greatest(
      (cr.v * (x.x_max - x.x_min)) // 4294967296,
      x.y_max - x.y_min) // 90 AS width
  FROM idx x
  JOIN cosrk rk ON rk.i = x.i
  JOIN cosr cr ON cr.i = x.i
)
SELECT way_id,
  {_FIX7.format(c="x_min")} || ',' || {_FIX7.format(c="y_min")}
    || ',' || {_FIX7.format(c="x_max")} || ','
    || {_FIX7.format(c="y_max")} AS bbox,
  area AS bbox_area,
  CAST({_MSBIT.format(v="area")} AS BIGINT) AS bbox_weight,
  width AS bbox_width,
  CAST({_MSBIT.format(v="width")} AS BIGINT) AS bbox_width_weight
FROM calc
"""
