"""URL canonicalization + crawl dedup — the web-corpus front door.

A Common-Crawl-style pages table arrives with the SAME logical page
under many raw spellings (scheme/host case, default ports, fragment
anchors, query-parameter order, trailing slashes) and under many
crawl timestamps. `canonicalize_url` folds the spelling variance as
a single pure-Catalyst expression (RFC 3986 §6 normalizations that
never change dereference semantics); `url_dedup_latest` keeps the
newest crawl per canonical URL.

Scale: canonicalization is stringops inside whole-stage codegen —
no UDF, no shuffle. The dedup is one hash-shuffle groupBy on the
canonical URL whose map-side partial aggregation collapses each
partition's re-crawls before the exchange; hot hosts don't skew it
because the key is the full URL, not the host.

Role parity: the reference engine's last-version-wins object merge
(osmconvert.c o5m merge, SURVEY.md A5) applied to the web-page key
space instead of OSM object ids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*):"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def canonicalize_url(url: Column) -> Column:
    """RFC 3986 §6.2 semantics-preserving normal form:

    - scheme and host lowercased
    - default port dropped (https:443, http:80); other ports kept
    - fragment dropped (never sent to the server)
    - query parameters sorted bytewise (order is not semantic for
      the overwhelming majority of endpoints; this is the standard
      crawler normalization)
    - empty path -> "/", trailing slashes stripped off non-root
      paths

    Pure Catalyst (regexp_extract / array_sort / concat) — stays in
    codegen, usable in filters and groupBy keys with pushdown.
    """
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    auth = F.regexp_extract(url, _AUTH_RE, 1)
    host = F.lower(F.regexp_extract(auth, r"^([^:]*)", 1))
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    default_port = (
        F.when(scheme == "https", F.lit("443"))
        .when(scheme == "http", F.lit("80"))
        .otherwise(F.lit(""))
    )
    port_part = F.when(
        (port == "") | (port == default_port), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    raw_path = F.regexp_extract(url, _PATH_RE, 1)
    stripped = F.regexp_replace(raw_path, "/+$", "")
    path = F.when(stripped == "", F.lit("/")).otherwise(stripped)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    q_part = F.when(query == "", F.lit("")).otherwise(
        F.concat(
            F.lit("?"),
            F.array_join(F.array_sort(F.split(query, "&")), "&"),
        )
    )
    return F.concat(scheme, F.lit("://"), host, port_part, path, q_part)


# PSL-lite: multi-label public suffixes an engine must recognize so
# "a.co.uk" and "b.co.uk" are DIFFERENT registered domains. The real
# Public Suffix List is ~9k rules and would ship as a broadcast
# lookup table; semantics (longest-matching suffix + one label) are
# identical. Kept as a literal so the whole expression stays in
# codegen.
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "co.in", "co.kr", "com.mx",
)


def registered_domain(host: Column) -> Column:
    """eTLD+1 of a lowercase hostname: the last label plus its
    public suffix (PSL-lite, MULTI_SUFFIXES). Pure Catalyst —
    split/slice/concat_ws; IPs and single-label hosts pass through
    unchanged."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.slice(parts, F.greatest(n - 1, F.lit(1)), 2))
    multi = F.array(*[F.lit(s) for s in MULTI_SUFFIXES])
    return (
        F.when(host.rlike(r"^[0-9.]+$"), host)  # dotted IPv4
        .when(n <= 2, host)
        .when(
            F.array_contains(multi, last2),
            F.concat_ws(".", F.slice(parts, n - 2, 3)),
        )
        .otherwise(last2)
    )


_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#:]*)"


def with_registered_domain(
    df: DataFrame,
    url_col: str = "url",
    out: str = "reg_domain",
    host_col: str = "host",
) -> DataFrame:
    """df + host + eTLD+1 columns via STAGED projections.

    Building registered_domain(host) as one Column inlines the
    split(lower(regexp_extract(url))) subtree ~15x into a single
    giant expression; the generated whole-stage-codegen unit then
    takes ~10 s to Janino-compile — paid on EVERY run once the
    generated-class cache rotates (measured: q66 9.97 s min-of-3 in
    the 72-query bench vs 1.1 s after this split). Materializing
    host/parts/last2 as their own columns keeps each non-cheap
    subexpression evaluated once AND keeps codegen units small:
    CollapseProject preserves a projection boundary rather than
    duplicate a non-cheap expression referenced more than once
    (same mechanism as the HOF-lambda staging in
    operators/text._with_word_grams)."""
    host = F.lower(F.regexp_extract(F.col(url_col), _HOST_RE, 1))
    staged = (
        df.withColumn(host_col, host)
        .withColumn("_rd_parts", F.split(F.col(host_col), r"\."))
        .withColumn("_rd_n", F.size(F.col("_rd_parts")))
    )
    h, p, n = F.col(host_col), F.col("_rd_parts"), F.col("_rd_n")
    staged = staged.withColumn(
        "_rd_last2",
        F.concat_ws(
            ".", F.slice(p, F.greatest(n - 1, F.lit(1)), 2)
        ),
    )
    multi = F.array(*[F.lit(s) for s in MULTI_SUFFIXES])
    rd = (
        F.when(h.rlike(r"^[0-9.]+$"), h)
        .when(n <= 2, h)
        .when(
            F.array_contains(multi, F.col("_rd_last2")),
            F.concat_ws(".", F.slice(p, n - 2, 3)),
        )
        .otherwise(F.col("_rd_last2"))
    )
    return staged.withColumn(out, rd).drop(
        "_rd_parts", "_rd_n", "_rd_last2"
    )


def host_stats(
    df: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Per-registered-domain corpus profile: page count, distinct
    host count, id span — the crawl-frontier/politeness view every
    web pipeline maintains. Host extraction + eTLD+1 are codegen
    expressions; the aggregate is one partial-agg shuffle on
    reg_domain (count_distinct(host) partial-aggregates its expand
    map-side, so megadomain skew costs O(#partitions x #hosts),
    not O(#pages))."""
    with_host = with_registered_domain(df, url_col, "reg_domain")
    return with_host.groupBy("reg_domain").agg(
        F.count("*").cast("long").alias("n_pages"),
        F.countDistinct("host").cast("long").alias("n_hosts"),
    )


def url_dedup_latest(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    out_url: str = "url_canon",
) -> DataFrame:
    """Latest-crawl-wins per canonical URL: one partial-aggregating
    groupBy. Keeps every non-key column of the winning row via a
    single max_by struct (one pass, no self-join back)."""
    payload = [c for c in df.columns if c != url_col]
    canon = df.withColumn(out_url, canonicalize_url(F.col(url_col)))
    winner = F.max_by(
        F.struct(*[F.col(c) for c in payload]), F.col(ts_col)
    ).alias("_w")
    agg = canon.groupBy(out_url).agg(
        winner,
        F.count("*").cast("long").alias("n_crawls"),
        F.max(ts_col).alias("last_ts"),
    )
    return agg.select(
        out_url,
        *[F.col(f"_w.{c}").alias(c) for c in payload if c != ts_col],
        "n_crawls",
        "last_ts",
    )


def blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
) -> DataFrame:
    """Domain-blocklist filtering (the crawl-hygiene front gate:
    spam/adult/malware domain lists): drop every page whose
    registered domain (eTLD+1) appears in the blocklist table.

    The blocklist is a TABLE, not a literal — real lists run to
    millions of rows and are maintained independently of the job.
    Even at that size they are megabytes, so the plan is a
    broadcast LEFT ANTI hash join: pages never shuffle, the list
    ships once per executor, and the probe runs inside the scan
    stage. Host extraction + eTLD+1 are the same STAGED codegen
    expressions as host_stats (with_registered_domain — see its
    docstring for the giant-codegen-unit trap), so the whole
    filter is map-only over the pages side."""
    with_rd = with_registered_domain(
        df, url_col, "_reg_domain", host_col="_rd_host"
    )
    bl = F.broadcast(
        blocklist.select(
            F.lower(F.col(domain_col)).alias("_reg_domain")
        ).distinct()
    )
    return with_rd.join(bl, "_reg_domain", "left_anti").drop(
        "_reg_domain", "_rd_host"
    )


def mirror_hosts(
    pages: DataFrame,
    host_col: str = "host",
    fp_col: str = "fp",
    max_hosts_per_fp: int = 64,
    min_shared: int = 2,
) -> DataFrame:
    """Mirror/syndication detection: host pairs whose page sets
    overlap on >= min_shared identical content fingerprints, with
    the exact overlap and both hosts' distinct-fingerprint counts
    so containment = shared / min(n1, n2) is a caller-side exact
    rational. The host-level twin of doc-level dedup — what a crawl
    pipeline runs to stop re-fetching example.org AND its CDN
    mirror (the reference dedups objects, osmconvert.c:61; hosts
    are the web corpus' analogous unit).

    Scale shape: everything is keyed by fingerprint. Fingerprints
    on > max_hosts_per_fp hosts are dropped BEFORE the self-join —
    they are boilerplate (empty pages, soft-404 templates) and the
    classic quadratic skew key; with the cap, pairs per fingerprint
    are <= cap^2 and the join is an ordinary bucketed equi-join, no
    all-pairs anywhere. Output is host x host, bounded by the host
    vocabulary, orders of magnitude below page count.
    """
    hf = pages.select(
        F.col(host_col).alias("host"), F.col(fp_col).alias("fp")
    ).distinct()
    sizes = hf.groupBy("host").agg(
        F.count("*").cast("long").alias("n")
    )
    shared_fp = (
        hf.groupBy("fp")
        .agg(F.count("*").alias("nh"))
        .where(
            (F.col("nh") >= 2) & (F.col("nh") <= max_hosts_per_fp)
        )
        .select("fp")
    )
    gated = hf.join(shared_fp, "fp")
    pairs = (
        gated.select("fp", F.col("host").alias("h1"))
        .join(gated.select("fp", F.col("host").alias("h2")), "fp")
        .where(F.col("h1") < F.col("h2"))
        .groupBy("h1", "h2")
        .agg(F.count("*").cast("long").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
    return (
        pairs.join(
            sizes.select(
                F.col("host").alias("h1"), F.col("n").alias("n1")
            ),
            "h1",
        )
        .join(
            sizes.select(
                F.col("host").alias("h2"), F.col("n").alias("n2")
            ),
            "h2",
        )
        .select("h1", "h2", "shared", "n1", "n2")
    )


def crawl_plan(
    df: DataFrame,
    per_round: int,
    url_col: str = "url",
    host_col: str | None = None,
) -> DataFrame:
    """Politeness-bounded crawl schedule: assign every URL a fetch
    round such that no host is hit more than per_round times in any
    round — the frontier planner a crawler runs after host_stats
    tells it the per-domain volumes. Deterministic: URLs order
    lexicographically within their host, slot = that rank, round =
    (slot - 1) div per_round, and n_rounds carries each host's
    total so the scheduler can see its makespan driver (the global
    round count is max(n_rounds), a 1-row agg the caller can take).

    Shape: one host-keyed window sort + one host-keyed count — the
    whole plan is a single shuffle on host; megahosts are exactly
    the rows a politeness planner MUST colocate, so that key skew
    is semantic, not accidental (a host's partition holds its URL
    list, bounded by the crawl frontier per host, not the corpus).
    """
    from pyspark.sql import Window

    host = (
        F.col(host_col)
        if host_col
        else F.regexp_extract(F.col(url_col), _HOST_RE, 1)
    )
    base = df.select(F.col(url_col).alias("url"), host.alias("host"))
    w = Window.partitionBy("host").orderBy("url")
    wc = Window.partitionBy("host")
    ranked = base.select(
        "url",
        "host",
        F.row_number().over(w).cast("long").alias("slot"),
        F.count("*").over(wc).cast("long").alias("_n"),
    )
    # integer div: slots/counts are positive, div == floor
    return ranked.select(
        "url",
        "host",
        "slot",
        F.expr(f"(slot - 1) div {int(per_round)}").alias("round"),
        F.expr(
            f"(_n + {int(per_round)} - 1) div {int(per_round)}"
        ).alias("n_rounds"),
    )


def robots_gate(
    df: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Robots-style longest-prefix-match gating: decide every URL
    against a per-host table of (path_prefix, allow) rules under
    the public robots.txt precedence — the MOST SPECIFIC (longest)
    matching prefix wins, equal-length ties go to allow, and a URL
    whose host has no matching rule is allowed. The crawl
    front-gate that runs right before crawl_plan.

    Output: (url, host, path, matched_prefix NULL when no rule
    fired, allow 1/0).

    Shape: rules are the contractually-small side (robots rules per
    host are tens, the corpus is pages) — one broadcast hash join
    on host, a startswith filter, then a per-url max_by over the
    handful of matched rules: pages never shuffle. Exact prefix
    semantics via startswith (no LIKE wildcard injection).
    """
    from pyspark.sql import Window

    base = df.select(
        F.col(url_col).alias("url"),
        F.regexp_extract(F.col(url_col), _HOST_RE, 1).alias("host"),
        F.coalesce(
            F.nullif(
                F.regexp_extract(F.col(url_col), _PATH_RE, 1),
                F.lit(""),
            ),
            F.lit("/"),
        ).alias("path"),
    )
    r = F.broadcast(
        rules.select(
            F.col("host"),
            F.col("path_prefix"),
            F.col("allow").cast("long").alias("allow"),
        )
    )
    cand = base.join(r, "host", "left").where(
        F.col("path_prefix").isNull()
        | F.col("path").startswith(F.col("path_prefix"))
    )
    w = Window.partitionBy("url").orderBy(
        F.desc(F.length(F.coalesce("path_prefix", F.lit("")))),
        F.desc("allow"),
        F.asc("path_prefix"),
    )
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "url",
            "host",
            "path",
            F.col("path_prefix").alias("matched_prefix"),
            F.coalesce("allow", F.lit(1)).cast("long").alias("allow"),
        )
    )


def url_templates(
    df: DataFrame,
    url_col: str = "url",
    trap_threshold: int = 1000,
) -> DataFrame:
    """URL template mining: collapse every digit run in the path to
    '{n}' and profile each (host, template) — the pattern view that
    exposes crawler traps (calendar pages, session-id paths,
    faceted-search explosions) as templates whose URL count dwarfs
    their distinct-template population.  A template with n_urls >=
    trap_threshold is flagged; the caller feeds flagged templates
    to robots_gate/crawl_plan as deny rules.

    Output: (host, template, n_urls, n_slots, is_trap) with n_slots
    = the template's '{n}' count (how many independent axes the
    trap enumerates).

    Shape: pure-Catalyst regexp projection + one (host, template)
    groupBy with map-side combine — template cardinality is
    orders below URL cardinality, which is the entire point.
    """
    host = F.regexp_extract(F.col(url_col), _HOST_RE, 1)
    path = F.coalesce(
        F.nullif(
            F.regexp_extract(F.col(url_col), _PATH_RE, 1), F.lit("")
        ),
        F.lit("/"),
    )
    template = F.regexp_replace(path, r"[0-9]+", "{n}")
    base = df.select(
        host.alias("host"), template.alias("template")
    )
    return base.groupBy("host", "template").agg(
        F.count("*").cast("long").alias("n_urls"),
    ).select(
        "host",
        "template",
        "n_urls",
        (
            F.size(F.split(F.col("template"), r"\{n\}")) - 1
        )
        .cast("long")
        .alias("n_slots"),
        (F.col("n_urls") >= F.lit(trap_threshold)).alias("is_trap"),
    )


def recrawl_estimate(
    crawls: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    fp_col: str = "fp",
) -> DataFrame:
    """Change-rate estimation for recrawl scheduling (the Cho &
    Garcia-Molina freshness-policy primitive): per URL, order its
    crawl observations by timestamp and count fingerprint CHANGES
    between consecutive crawls; the exact rational change rate
    n_changes / (n_obs - 1) drives the revisit tier —
    2 = hot (changes at least every other crawl), 0 = static
    (never changed), 1 = everything between.  URLs crawled once
    have no interval evidence: rate 0/0 reported as (0, 0), tier 1
    (unknown defaults to the middle, never to static).

    Shape: one url-keyed window (lag) + one url-keyed groupBy —
    the same single shuffle; per-url state is its crawl history,
    bounded by recrawl policy, not corpus size.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(url_col).orderBy(ts_col)
    marked = crawls.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("_ts"),
        F.col(fp_col).alias("_fp"),
    ).withColumn(
        "_chg",
        F.when(
            F.lag("_fp").over(
                Window.partitionBy("url").orderBy("_ts")
            ).isNull(),
            F.lit(0),
        )
        .when(
            F.lag("_fp").over(
                Window.partitionBy("url").orderBy("_ts")
            )
            != F.col("_fp"),
            F.lit(1),
        )
        .otherwise(F.lit(0)),
    )
    agg = marked.groupBy("url").agg(
        F.count("*").cast("long").alias("n_obs"),
        F.sum("_chg").cast("long").alias("n_changes"),
    )
    intervals = (F.col("n_obs") - 1).cast("long")
    return agg.select(
        "url",
        "n_obs",
        "n_changes",
        F.when(intervals > 0, intervals)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_intervals"),
        F.when(intervals <= 0, F.lit(1))
        .when(F.col("n_changes") * 2 >= intervals, F.lit(2))
        .when(F.col("n_changes") == 0, F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("tier"),
    )
