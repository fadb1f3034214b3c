"""S1: OSM XML (.osm/.osc) ingestion into nodes/ways/relations
DataFrames.

The reference streams XML byte-wise (oo__xmltag osmconvert.c:9428+).
Our ingest path parallelizes PER FILE: `spark.read.text(wholetext)`
distributes whole files to executors, and an Arrow-batched
mapInPandas parses each with ElementTree into typed rows. This is
the fixture/extract ingest path — planet-scale OSM arrives as PBF
and is converted to parquet offline once; per-file parallelism is
exactly how multi-extract ingestion (one file per region) scales.

Output schemas (SURVEY.md §1.1):
  nodes(id long, lat_i long, lon_i long, tags map<string,string>)
  ways(id long, refs array<long>, tags map<string,string>)
  rels(id long, members array<struct<ref long, mtype string,
       role string>>, tags map<string,string>)
Coordinates become 1e-7 fixed-point exactly as the reference's XML
parser does (oo__strtodeg osmconvert.c:9264+: exact digit
accumulation, digits beyond the 7th ignored — i.e. truncation
toward zero, NOT rounding).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

NODES_SCHEMA = (
    "id long, lat_i long, lon_i long, tags map<string,string>"
)
WAYS_SCHEMA = "id long, refs array<long>, tags map<string,string>"
RELS_SCHEMA = (
    "id long, members array<struct<ref:long,mtype:string,"
    "role:string>>, tags map<string,string>"
)

# optional author metadata columns (SURVEY §1.1: version,
# timestamp epoch-seconds, changeset, uid, user; 0/None = absent,
# matching the reference's hisver==0 convention)
META_COLS = (
    "version int, timestamp long, changeset long, uid long, "
    "user string"
)
NODES_META_SCHEMA = NODES_SCHEMA + ", " + META_COLS
WAYS_META_SCHEMA = WAYS_SCHEMA + ", " + META_COLS
RELS_META_SCHEMA = RELS_SCHEMA + ", " + META_COLS


def _fix(s: str) -> int:
    """oo__strtodeg semantics: exact decimal scaling, extra digits
    truncated toward zero (no float in the path)."""
    from decimal import ROUND_DOWN, Decimal

    return int(
        (Decimal(s) * 10_000_000).to_integral_value(rounding=ROUND_DOWN)
    )


def parse_timestamp(s: str | None) -> int | None:
    """pb__strtimetosint64 (osmconvert.c:3411-3443): ISO
    YYYY-MM-DDThh:mm:ssZ -> unix seconds."""
    if not s:
        return None
    from datetime import datetime, timezone

    try:
        return int(
            datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ")
            .replace(tzinfo=timezone.utc)
            .timestamp()
        )
    except ValueError:
        return None


def _meta(el) -> dict:
    """Author attributes (version timestamp changeset uid user);
    None where absent, matching hisver==0 semantics."""
    v = el.get("version")
    return {
        "version": int(v) if v else None,
        "timestamp": parse_timestamp(el.get("timestamp")),
        "changeset": (
            int(el.get("changeset")) if el.get("changeset") else None
        ),
        "uid": int(el.get("uid")) if el.get("uid") else None,
        "user": el.get("user"),
    }


def _parse(xml_text: str, with_meta: bool = False):
    import xml.etree.ElementTree as ET

    root = ET.fromstring(xml_text)
    nodes, ways, rels = [], [], []
    for el in root:
        tags = {
            t.get("k"): t.get("v") for t in el if t.tag == "tag"
        }
        meta = _meta(el) if with_meta else {}
        if el.tag == "node":
            nodes.append(
                {
                    "id": int(el.get("id")),
                    "lat_i": _fix(el.get("lat")),
                    "lon_i": _fix(el.get("lon")),
                    "tags": tags,
                    **meta,
                }
            )
        elif el.tag == "way":
            refs = [
                int(nd.get("ref")) for nd in el if nd.tag == "nd"
            ]
            ways.append(
                {"id": int(el.get("id")), "refs": refs,
                 "tags": tags, **meta}
            )
        elif el.tag == "relation":
            members = [
                {
                    "ref": int(m.get("ref")),
                    "mtype": m.get("type"),
                    "role": m.get("role") or "",
                }
                for m in el
                if m.tag == "member"
            ]
            rels.append(
                {
                    "id": int(el.get("id")),
                    "members": members,
                    "tags": tags,
                    **meta,
                }
            )
    return nodes, ways, rels


def _reader(kind: int, with_meta: bool = False):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for text in b["value"]:
                rows = _parse(text, with_meta)[kind]
                if rows:
                    yield pd.DataFrame(rows)

    return gen


def read_osm_xml(
    spark: SparkSession, path: str, with_meta: bool = False
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """path: file, directory, or glob of .osm files. Returns
    (nodes, ways, rels) DataFrames; parallelism = one task per
    file. with_meta=True adds the author columns (version,
    timestamp, changeset, uid, user)."""
    raw = spark.read.text(path, wholetext=True)
    ns, ws, rs = (
        (NODES_META_SCHEMA, WAYS_META_SCHEMA, RELS_META_SCHEMA)
        if with_meta
        else (NODES_SCHEMA, WAYS_SCHEMA, RELS_SCHEMA)
    )
    nodes = raw.mapInPandas(_reader(0, with_meta), ns)
    ways = raw.mapInPandas(_reader(1, with_meta), ws)
    rels = raw.mapInPandas(_reader(2, with_meta), rs)
    return nodes, ways, rels


# ----------------------------------------------------------------
# .osc change files (osmChange XML): create/modify/delete sections
# ----------------------------------------------------------------

OSC_NODES_SCHEMA = (
    "id long, lat_i long, lon_i long, tags map<string,string>, "
    "deleted boolean"
)


def _parse_osc_nodes(xml_text: str):
    import xml.etree.ElementTree as ET

    root = ET.fromstring(xml_text)
    rows = []
    for section in root:
        if section.tag not in ("create", "modify", "delete"):
            continue
        deleted = section.tag == "delete"
        for el in section:
            if el.tag != "node":
                continue
            tags = {
                t.get("k"): t.get("v") for t in el if t.tag == "tag"
            }
            rows.append(
                {
                    "id": int(el.get("id")),
                    "lat_i": _fix(el.get("lat")) if el.get("lat") else None,
                    "lon_i": _fix(el.get("lon")) if el.get("lon") else None,
                    "tags": tags,
                    "deleted": deleted,
                }
            )
    return rows


def read_osc_nodes(spark: SparkSession, path: str) -> DataFrame:
    """C1 ingest: .osc change files -> node change rows with a
    tombstone flag (osmchange.c:1485-1659 semantics: create/modify
    are upserts, delete removes by id). Feed the result straight to
    operators/merge.change_apply or streaming/changes."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for text in b["value"]:
                rows = _parse_osc_nodes(text)
                if rows:
                    yield pd.DataFrame(rows)

    raw = spark.read.text(path, wholetext=True)
    return raw.mapInPandas(gen, OSC_NODES_SCHEMA)
