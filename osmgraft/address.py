"""Free-text address geocoding parity (osmposition geoc_main):

Parse (osmposition.c:1045-1101), three syntaxes:
  1. <city>
  2. <street>, <city>
  3. <street> <housenumber>, <city>
     or <street>, <housenumber>, <city>
with the reference's exact heuristics:
  - no comma -> everything is the city;
  - one comma -> street before it; the housenumber, if any, is the
    LAST blank-then-digit run inside the street string (everything
    after that blank, not just the number);
  - two commas -> street, housenumber, city in order (city keeps
    any further commas);
  - city: leading spaces AND digits stripped (swallows postcodes);
  - housenumber: "//" remarks cut (only when not at the start),
    trailing spaces removed; dropped entirely when no street;
  - subdivided-city hack: street queries against "Berlin"/"Köln"
    become prefix searches (osmposition.c:1117-1123).

Search + ranking (osmposition.c:1126-1256):
  - city-only queries resolve to each matching city's MAIN dataset
    (first address index of the city run);
  - street queries resolve each (city, street) run to ONE dataset via
    housenumber refinement (dat_addrhousenumber,
    osmposition.c:1951-2052): first-occurrence exact string match
    (blank-insensitive) within the equal-numeric run, else
    first-occurrence exact numeric match, else the floor/ceiling
    neighbor decided by UNSIGNED 32-bit distance — which makes a
    query below the whole run pick the run's SECOND entry (the
    reference's de-facto wrap behavior, reproduced bit-for-bit);
  - results ranked by (255 - weight) << 32 | addr_idx ascending,
    and a query with more than 25 valid results returns NOTHING
    ("Too many valid results", osmposition.c:1213-1216).

All pure Catalyst expressions + one aggregation per stage; the
query side is broadcast (queries are human-typed strings — tiny
next to the address base)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_U32 = 1 << 32


def parse_address(addr: Column):
    """-> (street, housenumber, city) Columns (null = absent)."""
    n_commas = F.size(F.split(addr, ",")) - 1

    street1 = F.trim(F.regexp_extract(addr, r"^([^,]*),", 1))
    rest1 = F.regexp_extract(addr, r"^[^,]*,(.*)$", 1)
    rest2 = F.regexp_extract(addr, r"^[^,]*,[^,]*,(.*)$", 1)
    hn_mid = F.trim(F.regexp_extract(addr, r"^[^,]*,([^,]*),", 1))

    # one comma: split the street on the LAST " <digit>" boundary
    has_num = street1.rlike(r"^(.*) (\d.*)$")
    street_nohn = F.regexp_extract(street1, r"^(.*) (\d.*)$", 1)
    hn_from_street = F.regexp_extract(street1, r"^(.*) (\d.*)$", 2)

    street = F.when(n_commas == 0, F.lit(None)).otherwise(
        F.when(
            (n_commas == 1) & has_num, street_nohn
        ).otherwise(street1)
    )
    street = F.when(street == "", None).otherwise(street)

    hn_raw = F.when(n_commas == 0, F.lit(None)).when(
        n_commas == 1,
        F.when(has_num, hn_from_street).otherwise(F.lit(None)),
    ).otherwise(F.when(hn_mid == "", None).otherwise(hn_mid))
    # "//" remark cut (only when the delimiter is not at the start)
    hn = F.when(
        hn_raw.isNotNull() & (F.instr(hn_raw, "//") > 1),
        F.rtrim(F.regexp_extract(hn_raw, r"^(.*?)//", 1)),
    ).otherwise(hn_raw)
    # no street -> housenumber ignored
    hn = F.when(street.isNull(), None).otherwise(hn)

    city_src = F.when(n_commas == 0, addr).when(
        n_commas == 1, rest1
    ).otherwise(rest2)
    city = F.regexp_replace(city_src, r"^[ 0-9]*", "")
    city = F.when(city == "", None).otherwise(city)
    # subdivided-city prefix hack
    city = F.when(
        street.isNotNull() & city.isin("Berlin", "Köln"),
        F.concat(city, F.lit("*")),
    ).otherwise(city)
    return street, hn, city


def _hnumeric(hn: Column) -> Column:
    """strtouint32 semantics: leading digits, 0 if none, capped to
    16 bit (osmposition.c:198-212, 1968-1970)."""
    digits = F.regexp_extract(hn, r"^([0-9]+)", 1)
    v = F.when(digits == "", F.lit(0)).otherwise(
        digits.cast("long")
    )
    return F.least(v, F.lit(65535))


def _match_names(
    q: DataFrame, names: DataFrame, name_col: str, q_col: str,
    cap: int,
) -> DataFrame:
    """dat_indexrange semantics (osmposition.c:2199-2242): a '*'
    wildcard truncates the query and matches by prefix; otherwise
    an EXACT string match wins, and only if none exists does the
    query fall back to the prefix range (the sorted-string-table
    [s, s+0xff) interval). More than `cap` matching strings fails
    the whole query (cresultM/sresultM = 500,
    osmposition.c:983-984).

    De-facto quirk reproduced exactly: dat_indexafter clamps its
    binary search to the LAST table entry (osmposition.c:2160-2162),
    so a search string sorting after every stored name "matches"
    the alphabetically last name. Verified against the real binary
    in tests/test_ogb_position.py."""
    is_wild = F.col(q_col).contains("*")
    prefix = F.when(
        is_wild, F.substring_index(F.col(q_col), "*", 1)
    ).otherwise(F.col(q_col))
    mx = names.agg(F.max(name_col).alias("_mx"))
    joined = F.broadcast(q.crossJoin(F.broadcast(mx))).join(
        names,
        F.col(name_col).startswith(prefix)
        | ((prefix > F.col("_mx")) & (F.col(name_col) == F.col("_mx"))),
    ).drop("_mx")
    w = Window.partitionBy("query_id")
    exact = (~is_wild) & (F.col(name_col) == F.col(q_col))
    return (
        joined.withColumn("_ex", exact)
        .withColumn("_hasex", F.max("_ex").over(w))
        .filter(F.col("_ex") | ~F.col("_hasex"))
        .withColumn("_n", F.count("*").over(w))
        .filter(F.col("_n") <= cap)
        .drop("_ex", "_hasex", "_n")
    )


def address_geocode(
    addresses: DataFrame,
    queries: DataFrame,
    max_results: int = 25,
) -> DataFrame:
    """addresses: (addr_idx long — contiguous, ordered by
    (city, street, housenumeric, insertion), city, street,
    housenumber, housenumeric, x, y, weight).
    queries: (query_id, addr) free-text.

    Returns (query_id, rank, addr_idx, x, y) — ranked matches, or
    no rows for a query with zero or > max_results results."""
    # collapse barrier: the parse references `addr` ~30 times, and
    # ProjectCollapse would inline whatever expression BUILT addr
    # into every reference — synthesized query tables then blow the
    # 64KB whole-stage-codegen limit and fall back to interpreted
    # eval. The query side is tiny; pinning it costs one no-op job.
    queries = queries.select("query_id", "addr").localCheckpoint(
        eager=False
    )
    st, hn, ct = parse_address(F.col("addr"))
    q = queries.select(
        "query_id",
        st.alias("q_street"),
        hn.alias("q_hn"),
        ct.alias("q_city"),
    ).filter(F.col("q_city").isNotNull() | F.col("q_street").isNotNull())

    a = addresses.alias("a")

    # ---- syntax 1: city only -> main dataset per matching city
    city_first = addresses.groupBy("city").agg(
        F.min("addr_idx").alias("addr_idx")
    )
    r1 = _match_names(
        q.filter(F.col("q_street").isNull()),
        city_first,
        "city",
        "q_city",
        500,
    ).select("query_id", "addr_idx")

    # ---- street syntaxes: one dataset per (city, street) run
    qs = q.filter(F.col("q_street").isNotNull()).withColumn(
        "q_hnum",
        F.when(
            F.col("q_hn").isNotNull(), _hnumeric(F.col("q_hn"))
        ),
    )
    city_m = _match_names(
        qs, city_first.select("city"), "city", "q_city", 500
    ).select("query_id", F.col("city").alias("_mc"))
    street_m = _match_names(
        qs.select("query_id", "q_street"),
        addresses.select("street").distinct(),
        "street",
        "q_street",
        500,
    ).select("query_id", F.col("street").alias("_ms"))
    matches = city_m.join(street_m, "query_id")
    j = F.broadcast(
        qs.join(matches, "query_id")
    ).join(
        a,
        (F.col("a.city") == F.col("_mc"))
        & (F.col("a.street") == F.col("_ms")),
    )
    hnum = F.col("q_hnum")
    h = F.col("a.housenumeric")
    str_eq = F.replace(
        F.col("a.housenumber"), F.lit(" "), F.lit("")
    ) == F.replace(F.col("q_hn"), F.lit(" "), F.lit(""))
    run = j.groupBy(
        "query_id", "q_hn", "q_hnum", F.col("a.city"), F.col("a.street")
    ).agg(
        F.min("addr_idx").alias("aindex"),
        F.max("addr_idx").alias("run_last"),
        F.min(F.when((h == hnum) & str_eq, F.col("addr_idx"))).alias(
            "str_first"
        ),
        F.min(F.when(h == hnum, F.col("addr_idx"))).alias(
            "exact_first"
        ),
        F.max(F.when(h <= hnum, F.col("addr_idx"))).alias(
            "floor_idx"
        ),
        F.max(F.when(h <= hnum, h)).alias("floor_h"),
        F.min(h).alias("min_h"),
    )
    ap_idx = F.coalesce("floor_idx", "aindex")
    ap_h = F.coalesce("floor_h", "min_h")
    run = run.withColumn("ap_idx", ap_idx).withColumn("ap_h", ap_h)
    nxt = addresses.select(
        F.col("addr_idx").alias("anp_idx"),
        F.col("housenumeric").alias("anp_h"),
    )
    run = run.join(
        nxt, F.col("ap_idx") + 1 == F.col("anp_idx"), "left"
    )
    take_next = (
        (F.col("anp_idx") <= F.col("run_last"))
        & (
            F.pmod(F.col("anp_h") - F.col("q_hnum"), F.lit(_U32))
            < F.pmod(F.col("q_hnum") - F.col("ap_h"), F.lit(_U32))
        )
    )
    chosen = (
        F.when(F.col("q_hn").isNull(), F.col("aindex"))
        .when(F.col("str_first").isNotNull(), F.col("str_first"))
        .when(F.col("exact_first").isNotNull(), F.col("exact_first"))
        .when(
            F.coalesce(take_next, F.lit(False)), F.col("anp_idx")
        )
        .otherwise(F.col("ap_idx"))
    )
    r2 = run.select("query_id", chosen.alias("addr_idx"))

    results = r1.unionByName(r2)

    # "Too many valid results" -> the query yields nothing
    w_all = Window.partitionBy("query_id")
    results = (
        results.withColumn("_n", F.count("*").over(w_all))
        .filter(F.col("_n") <= max_results)
        .drop("_n")
    )

    withw = results.join(
        addresses.select("addr_idx", "x", "y", "weight"), "addr_idx"
    )
    # dat_weight masks to 6 bits (osmposition.c:2093-2097)
    order = Window.partitionBy("query_id").orderBy(
        (
            (
                F.lit(255) - F.col("weight").bitwiseAND(F.lit(63))
            ).cast("long")
            * F.lit(_U32)
            + F.col("addr_idx")
        ).asc()
    )
    return withw.select(
        "query_id",
        F.row_number().over(order).cast("long").alias("rank"),
        "addr_idx",
        "x",
        "y",
    )
