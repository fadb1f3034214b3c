"""q46: free-text address geocoding (osmposition parity) — Spark
query + DuckDB oracle.

Both engines synthesize the SAME address base and query strings by
pure integer arithmetic over documents.doc_id (the suite's planting
convention), then:

  Spark side : address strings -> address.parse_address (the real
               3-syntax parser, incl. postcode strip and "//"
               remark cut) -> address.address_geocode (search +
               housenumber refinement + weight ranking).
  Oracle side: replays the construction arithmetic for the PARSED
               fields directly (the parse itself is pinned by 23
               reference-semantics unit tests in
               tests/test_address.py) and the full search/
               refinement/ranking pipeline in SQL — including the
               unsigned-wrap neighbor rule.

A Spark parse bug on the postcode/remark shapes would desynchronize
the two sides, so q46 covers parse end-to-end as well."""

from __future__ import annotations

from pyspark.sql import functions as F

_U32 = 1 << 32


def _addresses(spark, sf_dir):
    from .suite import load

    docs = load(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") % 3 != 2
    )
    c = (F.col("doc_id") * 2654435761) % 20
    s = (F.col("doc_id") * 2246822519) % 8
    h = (F.col("doc_id") * 40503) % 60 + 1
    m = F.col("doc_id") % 5
    raw = docs.select(
        "doc_id",
        F.concat(
            F.lit("City"), F.lpad(c.cast("string"), 2, "0")
        ).alias("city"),
        F.concat(F.lit("Street"), s.cast("string")).alias("street"),
        F.concat(
            h.cast("string"),
            F.when(m == 1, F.lit("a"))
            .when(m == 2, F.lit(" a"))
            .otherwise(F.lit("")),
        ).alias("housenumber"),
        h.alias("housenumeric"),
        ((F.col("doc_id") * 7) % 1000000).alias("x"),
        ((F.col("doc_id") * 13) % 1000000).alias("y"),
        ((F.col("doc_id") * 97) % 256).alias("weight"),
    )
    # distributed dense global index (round-2): no single-partition
    # window — the geobase ordering scales with the corpus
    from .operators.indexing import with_global_index

    return with_global_index(
        raw,
        ["city", "street", "housenumeric", "doc_id"],
        index_col="addr_idx",
    ).drop("doc_id")


def _queries(spark, sf_dir):
    from .suite import load

    docs = load(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") % 13 == 0
    )
    syn = F.col("doc_id") % 4
    qc = F.concat(
        F.lit("City"),
        F.lpad(((F.col("doc_id") * 131) % 20).cast("string"), 2, "0"),
    )
    qs = F.concat(
        F.lit("Street"), ((F.col("doc_id") * 137) % 8).cast("string")
    )
    qh = ((F.col("doc_id") * 139) % 70).cast("string")
    addr = (
        F.when(syn == 0, qc)
        .when(syn == 1, F.concat(qs, F.lit(", "), qc))
        .when(
            syn == 2,
            F.concat(qs, F.lit(" "), qh, F.lit(", "), qc),
        )
        .otherwise(
            F.concat(
                qs,
                F.lit(", "),
                qh,
                F.lit(" // floor 2, 12345 "),
                qc,
            )
        )
    )
    return docs.select(
        F.col("doc_id").alias("query_id"), addr.alias("addr")
    )


def q46_address_geocode(spark, sf_dir):
    from .address import address_geocode

    return address_geocode(
        _addresses(spark, sf_dir), _queries(spark, sf_dir)
    )


def addr_oracle_sql() -> str:
    return f"""
WITH raw AS (
  SELECT doc_id,
    (doc_id * 2654435761) % 20 AS c,
    (doc_id * 2246822519) % 8 AS s,
    (doc_id * 40503) % 60 + 1 AS h,
    doc_id % 5 AS m
  FROM documents WHERE doc_id % 3 <> 2
),
addr AS (
  SELECT
    CAST(ROW_NUMBER() OVER (
      ORDER BY 'City' || lpad(CAST(c AS VARCHAR), 2, '0'),
               'Street' || CAST(s AS VARCHAR), h, doc_id
    ) AS BIGINT) AS addr_idx,
    'City' || lpad(CAST(c AS VARCHAR), 2, '0') AS city,
    'Street' || CAST(s AS VARCHAR) AS street,
    CAST(h AS VARCHAR) ||
      CASE m WHEN 1 THEN 'a' WHEN 2 THEN ' a' ELSE '' END
      AS housenumber,
    h AS housenumeric,
    (doc_id * 7) % 1000000 AS x,
    (doc_id * 13) % 1000000 AS y,
    (doc_id * 97) % 256 AS weight
  FROM raw
),
qry AS (
  SELECT doc_id AS query_id, doc_id % 4 AS syn,
    'City' || lpad(CAST((doc_id * 131) % 20 AS VARCHAR), 2, '0')
      AS q_city,
    'Street' || CAST((doc_id * 137) % 8 AS VARCHAR) AS q_street0,
    CAST((doc_id * 139) % 70 AS VARCHAR) AS q_hn0,
    (doc_id * 139) % 70 AS q_hnum0
  FROM documents WHERE doc_id % 13 = 0
),
parsed AS (
  SELECT query_id,
    CASE WHEN syn = 0 THEN NULL ELSE q_street0 END AS q_street,
    CASE WHEN syn <= 1 THEN NULL ELSE q_hn0 END AS q_hn,
    CASE WHEN syn <= 1 THEN NULL
         ELSE least(q_hnum0, 65535) END AS q_hnum,
    q_city
  FROM qry
),
r1 AS (
  SELECT p.query_id, MIN(a.addr_idx) AS addr_idx
  FROM parsed p JOIN addr a ON a.city = p.q_city
  WHERE p.q_street IS NULL
  GROUP BY p.query_id, a.city
),
run AS (
  SELECT p.query_id, p.q_hn, p.q_hnum, a.city, a.street,
    MIN(a.addr_idx) AS aindex,
    MAX(a.addr_idx) AS run_last,
    MIN(a.addr_idx) FILTER (WHERE a.housenumeric = p.q_hnum
      AND replace(a.housenumber, ' ', '') = replace(p.q_hn, ' ', ''))
      AS str_first,
    MIN(a.addr_idx) FILTER (WHERE a.housenumeric = p.q_hnum)
      AS exact_first,
    MAX(a.addr_idx) FILTER (WHERE a.housenumeric <= p.q_hnum)
      AS floor_idx,
    MAX(a.housenumeric) FILTER (WHERE a.housenumeric <= p.q_hnum)
      AS floor_h,
    MIN(a.housenumeric) AS min_h
  FROM parsed p
  JOIN addr a ON a.city = p.q_city AND a.street = p.q_street
  WHERE p.q_street IS NOT NULL
  GROUP BY 1, 2, 3, 4, 5
),
run2 AS (
  SELECT r.*,
    COALESCE(r.floor_idx, r.aindex) AS ap_idx,
    COALESCE(r.floor_h, r.min_h) AS ap_h
  FROM run r
),
run3 AS (
  SELECT r.*, n.addr_idx AS anp_idx, n.housenumeric AS anp_h
  FROM run2 r LEFT JOIN addr n ON n.addr_idx = r.ap_idx + 1
),
r2 AS (
  SELECT query_id,
    CASE
      WHEN q_hn IS NULL THEN aindex
      WHEN str_first IS NOT NULL THEN str_first
      WHEN exact_first IS NOT NULL THEN exact_first
      WHEN anp_idx IS NOT NULL AND anp_idx <= run_last
        AND ((anp_h - q_hnum) % {_U32} + {_U32}) % {_U32}
          < ((q_hnum - ap_h) % {_U32} + {_U32}) % {_U32}
      THEN anp_idx
      ELSE ap_idx
    END AS addr_idx
  FROM run3
),
results AS (
  SELECT query_id, addr_idx FROM r1
  UNION ALL
  SELECT query_id, addr_idx FROM r2
),
ok AS (
  SELECT query_id FROM results GROUP BY 1 HAVING COUNT(*) <= 25
),
ranked AS (
  SELECT r.query_id, r.addr_idx, a.x, a.y,
    ROW_NUMBER() OVER (
      PARTITION BY r.query_id
      ORDER BY (255 - (a.weight & 63)) * {_U32} + r.addr_idx
    ) AS rank
  FROM results r
  JOIN ok USING (query_id)
  JOIN addr a ON a.addr_idx = r.addr_idx
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, addr_idx, x, y
FROM ranked
"""


def q48_author_columns(spark, sf_dir):
    """P7 column drops/fakes over a synthesized authored table:
    mode = doc_id % 4 selects pass-through / --drop-author /
    --drop-version / --fake-author, applied as four filtered
    projections unioned back (the flags are table-level in the
    reference; per-mode slices make one oracle-checkable query)."""
    from .suite import load
    from .operators.authors import author_columns

    docs = load(spark, sf_dir, "documents").select("doc_id")
    base = docs.select(
        "doc_id",
        (F.col("doc_id") % 9 + 1).alias("version"),
        F.when(
            F.col("doc_id") % 5 == 0, F.lit(0)
        ).otherwise(1500000000 + F.col("doc_id")).alias("ts"),
        (F.col("doc_id") * 3 % 1000).alias("changeset"),
        (F.col("doc_id") % 7).alias("uid"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("")).otherwise(
            F.concat(F.lit("user"), (F.col("doc_id") % 7).cast("string"))
        ).alias("user"),
    )
    mode = F.col("doc_id") % 4
    parts = [
        author_columns(base.filter(mode == 0)),
        author_columns(base.filter(mode == 1), drop_author=True),
        author_columns(base.filter(mode == 2), drop_version=True),
        author_columns(base.filter(mode == 3), fake_author=True),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_Q48_ORACLE = """
WITH base AS (
  SELECT doc_id,
    doc_id % 9 + 1 AS version,
    CASE WHEN doc_id % 5 = 0 THEN 0
         ELSE 1500000000 + doc_id END AS ts,
    doc_id * 3 % 1000 AS changeset,
    doc_id % 7 AS uid,
    CASE WHEN doc_id % 7 = 0 THEN ''
         ELSE 'user' || CAST(doc_id % 7 AS VARCHAR) END AS "user"
  FROM documents
)
SELECT doc_id,
  CASE doc_id % 4 WHEN 2 THEN 0 WHEN 3 THEN 1
       ELSE version END AS version,
  CASE doc_id % 4 WHEN 0 THEN ts WHEN 3 THEN 1
       ELSE 0 END AS ts,
  CASE doc_id % 4 WHEN 0 THEN changeset WHEN 3 THEN 1
       ELSE 0 END AS changeset,
  CASE WHEN doc_id % 4 = 0 AND uid <> 0 AND "user" <> ''
       THEN uid ELSE 0 END AS uid,
  CASE WHEN doc_id % 4 = 0 AND uid <> 0 AND "user" <> ''
       THEN "user" ELSE '' END AS "user"
FROM base
"""


ADDR_QUERIES = {
    "q46_address_geocode": q46_address_geocode,
    "q48_author_columns": q48_author_columns,
}


def addr_oracle_sqls() -> dict[str, str]:
    return {
        "q46_address_geocode": addr_oracle_sql(),
        "q48_author_columns": _Q48_ORACLE,
    }
