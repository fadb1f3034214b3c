"""Common-Crawl-style pages table: synthesis, text extraction,
geocoding (BASELINE.json input_hint shape).

    pages(url string, warc_ts timestamp, html binary,
          text string, lang string)

`extract_text` is the FROZEN pure function whose per-url
byte-identity is a hard invariant (input_hint). It plays the role of
the reference's deterministic text handling; tests re-extract from
`html` and compare byte-for-byte with the stored `text` column.

Geocoding plays the osmgeobase/osmposition role (SURVEY.md G12):
recognize a gazetteer term in the text and resolve it to fixed-point
coordinates. Implemented as Arrow-vectorized pandas string ops + a
broadcast term dictionary — no per-row Python, no shuffle.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from .fixtures import (
    N_CITIES,
    gazetteer_arrays,
    place_for_doc,
)

_LANGS = ["en", "de", "fr", "ja", "pt"]

_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(rb"\s+")


def extract_text(html: bytes) -> bytes:
    """FROZEN deterministic extractor: strip tags, collapse
    whitespace. Do not change — byte-identity per url is the
    correctness invariant (BASELINE.json input_hint)."""
    no_tags = _TAG_RE.sub(b" ", html)
    return _WS_RE.sub(b" ", no_tags).strip()


def make_html(doc_id: int, place: str | None, lang: str) -> bytes:
    """Deterministic page template embedding the place string."""
    body = f"Document {doc_id} corpus page."
    if place is not None:
        body += f" The office is located near {place} downtown."
    body += f" Contact {doc_id % 97} Alpha Street."
    return (
        f"<html><head><title>Page {doc_id}</title>"
        f'<meta lang="{lang}"/></head>'
        f"<body><h1>Page {doc_id}</h1><p>{body}</p></body></html>"
    ).encode("utf-8")


PAGES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
    ]
)

_BASE_TS = np.datetime64("2024-01-01T00:00:00")


def _pages_pdf(ids: np.ndarray) -> pd.DataFrame:
    terms, _, _, _ = gazetteer_arrays()
    city = place_for_doc(ids)
    rows = {
        "doc_id": ids,
        "url": [f"https://host{i % 23}.example/{i}" for i in ids],
        "warc_ts": _BASE_TS + (ids * 17).astype("timedelta64[s]"),
    }
    htmls = []
    texts = []
    langs = []
    for i, c in zip(ids.tolist(), city.tolist()):
        lang = _LANGS[i % len(_LANGS)]
        h = make_html(i, terms[c] if c >= 0 else None, lang)
        htmls.append(h)
        texts.append(extract_text(h).decode("utf-8"))
        langs.append(lang)
    rows["html"] = htmls
    rows["text"] = texts
    rows["lang"] = langs
    return pd.DataFrame(rows)


def synth_pages(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic pages synthesis via mapInPandas over
    spark.range — scales to any n without driver materialization."""
    rng_df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for b in batches:
            yield _pages_pdf(b["id"].to_numpy("int64"))

    return rng_df.mapInPandas(gen, PAGES_SCHEMA)


def geocode(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """Resolve each page to fixed-point coords via the gazetteer
    (SURVEY.md G12). Adds lat_i/lon_i (null when no term found).

    One combined regex over the term list; first (leftmost) match
    wins (the reference geocoder also ranks and takes the top
    candidate, osmposition.c:1229-1247).

    Entirely JVM-side: `regexp_extract` + map-literal lookups stay
    inside whole-stage codegen — ~10x faster than the equivalent
    pandas `.str.extract` UDF (row-at-a-time Python regex) and no
    Arrow transfer at all. Java and Python regex alternation agree
    here: leftmost match, earlier alternative preferred on ties.
    """
    terms, lat_i, lon_i, _w = gazetteer_arrays()
    pattern = "(" + "|".join(re.escape(t) for t in terms) + ")"

    lat_pairs = []
    lon_pairs = []
    for t, la, lo in zip(terms, lat_i.tolist(), lon_i.tolist()):
        lat_pairs += [F.lit(t), F.lit(int(la))]
        lon_pairs += [F.lit(t), F.lit(int(lo))]
    lat_map = F.create_map(*lat_pairs)
    lon_map = F.create_map(*lon_pairs)

    # try_element_at: missing key (no match -> "") yields NULL even
    # under ANSI mode, where element_at would throw
    term = F.regexp_extract(F.col(text_col), pattern, 1)
    return pages.withColumn(
        "lat_i", F.try_element_at(lat_map, term).cast("long")
    ).withColumn("lon_i", F.try_element_at(lon_map, term).cast("long"))
