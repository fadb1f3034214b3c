"""osmgraft-convert: the reference tools' command line over the
engine, so an osmconvert/osmfilter user can run their existing
invocations against the Spark implementation unchanged:

    python tools/osmgraft_convert.py in.pbf -o=out.o5m
    python tools/osmgraft_convert.py a.osm b.osm -o=merged.o5m
    python tools/osmgraft_convert.py in.o5m -b=10,47,14,51 \\
        --drop-broken-refs -o=clip.o5m
    python tools/osmgraft_convert.py in.osm -B=region.poly -o=r.osm
    python tools/osmgraft_convert.py in.o5m --out-csv \\
        "--csv=@id @lat @lon name" "--csv-separator=|"
    python tools/osmgraft_convert.py in.osm \\
        "--keep=place=city or population>=10000" -o=cities.o5m

Semantics composed from the differentially-tested operators:
  - inputs sniffed by magic bytes (S5), multiple inputs merged with
    last-wins override (J3, osmconvert.c:11158-11164);
  - -b / -B keep nodes inside (P1/P2), ways with >= 1 kept node
    (G3 clip decision), relations with >= 1 kept member;
  - --drop-broken-refs removes refs/members pointing at dropped
    objects and empties vanish (P8);
  - --keep compiles the osmfilter predicate language to Catalyst
    (P3) over the tag map;
  - output format chosen by -o extension (.osm/.o5m/.o5c/.osc/
    .pbf) through the wire writers, or --out-csv through the K4
    sink with reference separator-collision handling.

The CSV path emits node rows (coordinate columns); object-type
column spreads over ways/relations follow the library operators.
Differentially tested against the compiled binaries in
tests/test_cli_convert.py (format conversion, -b and -B clipping,
--drop-broken-refs, --keep vs osmfilter, byte-exact CSV, merge)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _parse_args(argv: list[str]) -> dict:
    opts = {
        "inputs": [],
        "bbox": None,
        "poly": None,
        "keep": None,
        "drop_broken_refs": False,
        "out": None,
        "out_csv": False,
        "csv_cols": "@id @lon @lat",
        "csv_sep": "\t",
    }
    for a in argv:
        if a.startswith("-b="):
            opts["bbox"] = [float(v) for v in a[3:].split(",")]
        elif a.startswith("-B="):
            opts["poly"] = a[3:]
        elif a.startswith("--keep="):
            opts["keep"] = a[7:]
        elif a == "--drop-broken-refs":
            opts["drop_broken_refs"] = True
        elif a.startswith("-o="):
            opts["out"] = a[3:]
        elif a == "--out-csv":
            opts["out_csv"] = True
        elif a.startswith("--csv="):
            opts["csv_cols"] = a[6:]
        elif a.startswith("--csv-separator="):
            opts["csv_sep"] = a[16:]
        elif a.startswith("-"):
            raise SystemExit(f"unknown option: {a}")
        else:
            opts["inputs"].append(a)
    if not opts["inputs"]:
        raise SystemExit("no input files")
    return opts


def _apply_spatial(nodes, ways, rels, opts):
    from .geo.fixedpoint import deg_to_fix_trunc
    from .operators.spatial import bbox_contains, filter_border

    if opts["bbox"] is not None:
        x1, y1, x2, y2 = (
            int(deg_to_fix_trunc(v)) for v in opts["bbox"]
        )
        nodes = nodes.filter(
            bbox_contains(F.col("lon_i"), F.col("lat_i"), x1, y1, x2, y2)
        )
    if opts["poly"] is not None:
        from .geo.polyfile import parse_border

        with open(opts["poly"]) as f:
            es = parse_border(f.read())
        nodes = filter_border(nodes, es)
    if opts["bbox"] is None and opts["poly"] is None:
        return nodes, ways, rels

    # ways with >= 1 kept node (G3); relations with >= 1 kept member
    kept_ids = nodes.select(F.col("id").alias("ref"))
    wref = ways.select("id", F.explode("refs").alias("ref"))
    kept_way_ids = (
        wref.join(kept_ids, "ref", "left_semi").select("id").distinct()
    )
    ways = ways.join(kept_way_ids, "id", "left_semi")
    mref = rels.select(
        "id",
        F.explode("members").alias("m"),
    ).select("id", F.col("m.ref").alias("ref"), F.col("m.mtype").alias("t"))
    kept_rel_ids = (
        mref.filter(F.col("t") == "node")
        .join(kept_ids, "ref", "left_semi")
        .select("id")
        .unionByName(
            mref.filter(F.col("t") == "way")
            .join(
                kept_way_ids.select(F.col("id").alias("ref")),
                "ref",
                "left_semi",
            )
            .select("id")
        )
        .distinct()
    )
    rels = rels.join(kept_rel_ids, "id", "left_semi")

    if opts["drop_broken_refs"]:
        # P8 on ways...
        ex = ways.select("id", F.posexplode("refs").alias("j", "ref"))
        kept = ex.join(kept_ids, "ref", "left_semi")
        ways = (
            kept.groupBy("id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "ref"))),
                    lambda s: s.ref,
                ).alias("refs")
            )
            .filter(F.size("refs") > 0)
            .join(ways.select("id", "tags"), "id")
            .select("id", "refs", "tags")
        )
        # ...and relation members (node/way members only here; the
        # rel->rel closure lives in graph.rel_closure_*)
        mex = rels.select(
            "id", F.posexplode("members").alias("j", "m")
        )
        mkept = mex.filter(F.col("m.mtype") == "node").join(
            kept_ids.select(F.col("ref").alias("_r")),
            F.col("m.ref") == F.col("_r"),
            "left_semi",
        ).unionByName(
            mex.filter(F.col("m.mtype") == "way").join(
                ways.select(F.col("id").alias("_r")),
                F.col("m.ref") == F.col("_r"),
                "left_semi",
            )
        ).unionByName(mex.filter(F.col("m.mtype") == "relation"))
        rels = (
            mkept.groupBy("id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "m"))),
                    lambda s: s.m,
                ).alias("members")
            )
            .filter(F.size("members") > 0)
            .join(rels.select("id", "tags"), "id")
            .select("id", "members", "tags")
        )
    return nodes, ways, rels


def convert(spark: SparkSession, argv: list[str]) -> str | None:
    """Run one conversion; returns the output path (None for csv to
    stdout)."""
    from .filterlang.ast import parse as parse_keep
    from .filterlang.spark import keep_column
    from .operators.merge import union_dedup
    from .sources.auto import read_osm_auto

    opts = _parse_args(argv)
    parts = [read_osm_auto(spark, p) for p in opts["inputs"]]
    if len(parts) == 1:
        nodes, ways, rels = parts[0]
    else:
        nodes = union_dedup([p[0] for p in parts], ["id"])
        ways = union_dedup([p[1] for p in parts], ["id"])
        rels = union_dedup([p[2] for p in parts], ["id"])

    if opts["keep"]:
        pred = parse_keep(opts["keep"])
        nodes = nodes.filter(keep_column(F.col("tags"), pred))
        ways = ways.filter(keep_column(F.col("tags"), pred))
        rels = rels.filter(keep_column(F.col("tags"), pred))

    nodes, ways, rels = _apply_spatial(nodes, ways, rels, opts)

    if opts["out_csv"]:
        from .operators.sinks import csv_lines

        cols = opts["csv_cols"].split(" ")
        sel = []
        for c in cols:
            if c == "@id":
                sel.append(F.col("id").cast("string").alias(c))
            elif c == "@lat":
                from .geo.bboxtags import fix7_col

                sel.append(fix7_col(F.col("lat_i")).alias(c))
            elif c == "@lon":
                from .geo.bboxtags import fix7_col

                sel.append(fix7_col(F.col("lon_i")).alias(c))
            else:
                sel.append(
                    F.try_element_at(F.col("tags"), F.lit(c)).alias(c)
                )
        lines = csv_lines(
            nodes.orderBy("id").select(*sel),
            cols,
            sep=opts["csv_sep"],
        )
        for r in lines.toLocalIterator():
            print(r.value)
        return None

    out = opts["out"]
    if not out:
        raise SystemExit("missing -o= output (or --out-csv)")
    from .wire import (
        encode_o5m,
        encode_osc,
        encode_osm_xml,
        encode_pbf,
        write_wire_single,
    )

    ext = out.rsplit(".", 1)[-1]
    if ext in ("o5m", "o5c"):
        from .wire.spark import _iter_rows

        data = encode_o5m(
            _iter_rows(nodes),
            _iter_rows(ways),
            _iter_rows(rels),
            change=(ext == "o5c"),
        )
        with open(out, "wb") as f:
            f.write(data)
    elif ext == "osm":
        write_wire_single(nodes, ways, rels, out, fmt="osm")
    elif ext == "osc":
        from .wire.spark import _iter_rows

        with open(out, "w") as f:
            f.write(
                encode_osc(
                    _iter_rows(nodes), _iter_rows(ways), _iter_rows(rels)
                )
            )
    elif ext == "pbf":
        write_wire_single(nodes, ways, rels, out, fmt="pbf")
    else:
        raise SystemExit(f"unknown output extension .{ext}")
    return out
