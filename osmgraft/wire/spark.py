"""Distributed wire-format sink.

Two paths, mirroring how Parquet sinks behave:

- write_wire_dir: the scale path. Each type's DataFrame is
  range-partitioned on id and sorted within partitions, then every
  partition encodes ONE standalone wire file (executor-side, no
  driver traffic) — the distributed analogue of Parquet part files.
  All three readers (and osmconvert itself) accept a directory of
  such parts. Returns the collected manifest (path, rows per part);
  the manifest collect is one tiny row per part, not data.

- write_wire_single: the extract path (differential tests, small
  regional extracts — the reference's own use case). Streams
  ordered rows through the encoder on the driver via
  toLocalIterator; memory is O(1 partition), but the write itself
  is single-stream by definition of "one file".
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .o5m import encode_o5m
from .osmxml import encode_osm_xml
from .pbf import encode_pbf

_EXT = {"o5m": "o5m", "osm": "osm", "pbf": "pbf"}


def _encode(fmt: str, nodes, ways, rels) -> bytes:
    if fmt == "o5m":
        return encode_o5m(nodes, ways, rels)
    if fmt == "osm":
        return encode_osm_xml(nodes, ways, rels).encode("utf-8")
    if fmt == "pbf":
        return encode_pbf(nodes, ways, rels)
    raise ValueError(f"unknown wire format {fmt!r}")


def _rows(pdf: pd.DataFrame) -> list[dict]:
    recs = pdf.to_dict("records")
    for r in recs:
        t = r.get("tags")
        if t is not None and not isinstance(t, dict):
            r["tags"] = dict(t)
        if "members" in r and r["members"] is not None:
            r["members"] = [dict(m) for m in r["members"]]
        if "refs" in r and r["refs"] is not None:
            r["refs"] = list(r["refs"])
    return recs


def _part_writer(fmt: str, kind: str, out_dir: str):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rows: list[dict] = []
        for b in batches:
            rows.extend(_rows(b))
        if not rows:
            return
        args = {"nodes": [], "ways": [], "rels": []}
        args[kind] = rows
        data = _encode(fmt, args["nodes"], args["ways"], args["rels"])
        path = os.path.join(
            out_dir, f"part-{kind}-{pid:05d}.{_EXT[fmt]}"
        )
        with open(path, "wb") as f:
            f.write(data)
        yield pd.DataFrame(
            [{"path": path, "kind": kind, "n_rows": len(rows)}]
        )

    return gen


def write_wire_dir(
    nodes: DataFrame,
    ways: DataFrame,
    rels: DataFrame,
    out_dir: str,
    fmt: str = "o5m",
    parts: int = 8,
) -> list[dict]:
    """Write (nodes, ways, rels) as a directory of standalone wire
    part files; returns the manifest rows. Range partitioning keeps
    each part id-sorted AND the id ranges disjoint, so any part is
    a valid extract on its own."""
    os.makedirs(out_dir, exist_ok=True)
    manifest = []
    for kind, df in (
        ("nodes", nodes), ("ways", ways), ("rels", rels)
    ):
        if df is None:
            continue
        part = (
            df.repartitionByRange(parts, "id")
            .sortWithinPartitions("id")
            .mapInPandas(
                _part_writer(fmt, kind, out_dir),
                "path string, kind string, n_rows long",
            )
        )
        manifest.extend(r.asDict() for r in part.collect())
    return manifest


def _iter_rows(df: DataFrame) -> list[dict]:
    out = []
    for r in df.orderBy("id").toLocalIterator():
        d = r.asDict(recursive=True)
        out.append(d)
    return out


def write_wire_single(
    nodes: DataFrame,
    ways: DataFrame,
    rels: DataFrame,
    path: str,
    fmt: str = "o5m",
) -> None:
    """One complete wire file, globally id-ordered (extract path)."""
    data = _encode(
        fmt,
        _iter_rows(nodes) if nodes is not None else [],
        _iter_rows(ways) if ways is not None else [],
        _iter_rows(rels) if rels is not None else [],
    )
    with open(path, "wb") as f:
        f.write(data)
