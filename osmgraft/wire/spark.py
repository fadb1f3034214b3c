"""Distributed wire-format sink.

Two paths, mirroring how Parquet sinks behave:

- write_wire_dir: the scale path. Each type's DataFrame is
  range-partitioned on id and sorted within partitions, then every
  partition encodes ONE standalone wire file (executor-side, no
  driver traffic) — the distributed analogue of Parquet part files.
  All three readers (and osmconvert itself) accept a directory of
  such parts. Returns the collected manifest (path, rows per part);
  the manifest collect is one tiny row per part, not data.

- write_wire_single: one complete, globally id-ordered file. Also
  parallel: body chunks are encoded on the EXECUTORS (o5m resets
  state at 0xff, PBF blobs are independent, XML objects are
  self-contained, so per-range chunks concatenate byte-identically
  to a serial render); the driver only streams header + chunks +
  footer, so its memory is O(1 chunk) and its CPU is I/O-bound.
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


_META_INT = ("version", "timestamp", "changeset", "uid")


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
        # pandas turns nullable int meta columns into float NaN,
        # which is truthy — normalize back to None / int
        for c in _META_INT:
            if c in r:
                v = r[c]
                r[c] = None if pd.isna(v) else int(v)
        if "user" in r and pd.isna(r.get("user")):
            r["user"] = None
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
    """Ordered row dicts via Arrow. The Row/collect path must NOT
    be used here: JVM-side Map -> Row conversion does not preserve
    tag insertion order (scala Map iteration), while the Arrow path
    carries map entries in stored order — which the wire formats
    expose (tag order is part of the reference's byte output)."""
    rows = df.orderBy("id").toArrow().to_pylist()
    for r in rows:
        t = r.get("tags")
        if t is not None and not isinstance(t, dict):
            r["tags"] = dict(t)
    return rows


def _encode_body(fmt: str, nodes, ways, rels) -> bytes:
    from .o5m import encode_o5m_body
    from .osmxml import encode_osm_xml_body
    from .pbf import encode_pbf_body

    if fmt == "o5m":
        # 0xff reset makes each chunk's fresh delta/string-table
        # state legal at any concatenation point
        return b"\xff" + encode_o5m_body(nodes, ways, rels)
    if fmt in ("osm", "osh", "osh-fakell"):
        body = encode_osm_xml_body(
            nodes,
            ways,
            rels,
            osh=fmt.startswith("osh"),
            fake_lonlat=fmt.endswith("-fakell"),
        )
        return (body + "\n").encode("utf-8") if body else b""
    if fmt == "pbf":
        return encode_pbf_body(nodes, ways, rels)
    raise ValueError(f"unknown wire format {fmt!r}")


def _body_writer(fmt: str, kind: str, out_dir: str):
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
        data = _encode_body(
            fmt, args["nodes"], args["ways"], args["rels"]
        )
        path = os.path.join(out_dir, f"chunk-{kind}-{pid:05d}.bin")
        with open(path, "wb") as f:
            f.write(data)
        yield pd.DataFrame(
            [{"path": path, "kind": kind, "n_rows": len(rows)}]
        )

    return gen


_XML_HEADER = (
    "<?xml version='1.0' encoding='UTF-8'?>\n"
    '<osm version="0.6" generator="osmgraft">\n'
).encode("utf-8")
_HEADERS = {
    # trailing 0xff keeps zero-chunk (empty) files well-formed;
    # chunk-leading 0xff resets are idempotent after it
    "o5m": b"\xff\xe0\x04o5m2\xff",
    "osm": _XML_HEADER,
    "osh": _XML_HEADER,
    "osh-fakell": _XML_HEADER,
}
_FOOTERS = {
    "o5m": b"\xfe",
    "osm": b"</osm>\n",
    "osh": b"</osm>\n",
    "osh-fakell": b"</osm>\n",
    "pbf": b"",
}


def _pbf_header() -> bytes:
    from .pbf import _blob, _field_bytes

    out = bytearray()
    hdr = bytearray()
    _field_bytes(hdr, 4, b"OsmSchema-V0.6")
    _field_bytes(hdr, 4, b"DenseNodes")
    _blob(out, "OSMHeader", bytes(hdr))
    return bytes(out)


def write_wire_single(
    nodes: DataFrame,
    ways: DataFrame,
    rels: DataFrame,
    path: str,
    fmt: str = "o5m",
    dialect: str | None = None,
    parts: int = 8,
    file_timestamp: int | None = None,
) -> None:
    """One complete wire file, globally id-ordered.

    Parallel by default: each type's DataFrame is range-partitioned
    on id and encoded to standalone body chunks ON THE EXECUTORS
    (>1 encode task per file — the round-2 serial-driver-encode
    bottleneck is gone); the driver only streams header + chunks +
    footer into the output file. Chunk concatenation is format-
    legal: o5m resets state at 0xff (each chunk leads with one),
    PBF blobs are independent, XML objects are self-contained (and
    concatenate byte-identically to the serial render).

    dialect (XML emulation variants) still uses the serial driver
    encoder — dialect files exist for byte-diff differentials on
    small extracts, not scale."""
    if dialect is not None:
        from .osmxml import encode_osm_xml

        data = encode_osm_xml(
            _iter_rows(nodes) if nodes is not None else [],
            _iter_rows(ways) if ways is not None else [],
            _iter_rows(rels) if rels is not None else [],
            dialect=dialect,
        ).encode("utf-8")
        with open(path, "wb") as f:
            f.write(data)
        return

    import shutil
    import tempfile

    tmp_dir = tempfile.mkdtemp(
        prefix=os.path.basename(path) + ".parts-",
        dir=os.path.dirname(os.path.abspath(path)) or ".",
    )
    try:
        chunks: dict[str, list[str]] = {
            "nodes": [], "ways": [], "rels": []
        }
        for kind, df in (
            ("nodes", nodes), ("ways", ways), ("rels", rels)
        ):
            if df is None:
                continue
            part = (
                df.repartitionByRange(parts, "id")
                .sortWithinPartitions("id")
                .mapInPandas(
                    _body_writer(fmt, kind, tmp_dir),
                    "path string, kind string, n_rows long",
                )
            )
            chunks[kind] = sorted(
                r["path"] for r in part.collect()
            )
        header = _pbf_header() if fmt == "pbf" else _HEADERS[fmt]
        if file_timestamp is not None and fmt == "o5m":
            # --timestamp=: the 0xdc timestamp dataset sits BETWEEN
            # the header record and the 0xff reset (reference
            # layout, byte-checked) — splice it in
            from .o5m import _sv, _uv

            body = bytearray()
            _sv(body, int(file_timestamp))
            rec = bytearray(b"\xdc")
            _uv(rec, len(body))
            rec.extend(body)
            assert header.endswith(b"\xff")
            header = header[:-1] + bytes(rec) + b"\xff"
        elif file_timestamp is not None and fmt in (
            "osm", "osh", "osh-fakell"
        ):
            import datetime as _dt

            iso = _dt.datetime.fromtimestamp(
                file_timestamp, _dt.timezone.utc
            ).strftime("%Y-%m-%dT%H:%M:%SZ")
            header = header.replace(
                b'generator="osmgraft">',
                b'generator="osmgraft" timestamp="%s">'
                % iso.encode(),
            )
        with open(path, "wb") as f:
            f.write(header)
            for kind in ("nodes", "ways", "rels"):
                for chunk in chunks[kind]:
                    with open(chunk, "rb") as c:
                        shutil.copyfileobj(c, f)
            f.write(_FOOTERS[fmt])
    finally:
        shutil.rmtree(tmp_dir, ignore_errors=True)
