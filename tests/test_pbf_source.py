"""S3 PBF source differential: osmconvert-generated .pbf parsed by
our decoder must equal the known world (dense nodes, zigzag deltas,
string tables, ways, relations with roles)."""

from __future__ import annotations

import os
import subprocess

import pytest

from osmgraft.sources.pbf import parse_pbf

from .test_o5m_source import _world_xml

REFBIN = "/root/repo/.refbin"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REFBIN}/osmconvert"),
    reason="reference binaries not built",
)


def _make_pbf(tmp_path) -> bytes:
    osm = tmp_path / "w.osm"
    osm.write_text(_world_xml())
    pbf = tmp_path / "w.pbf"
    subprocess.run(
        [f"{REFBIN}/osmconvert", str(osm), f"-o={pbf}"], check=True
    )
    return pbf.read_bytes()


def test_pbf_decoder_matches_world(tmp_path):
    nodes, ways, rels = parse_pbf(_make_pbf(tmp_path))

    assert len(nodes) == 300
    by_id = {n["id"]: n for n in nodes}
    for i in range(300):
        nd = by_id[i + 1]
        assert nd["lat_i"] == -300000 + i * 77777, f"node {i + 1}"
        assert nd["lon_i"] == 500000 - i * 33333
        assert nd["tags"]["amenity"] == f"kind{i % 4}"
        if i % 3 == 0:
            assert nd["tags"]["name"] == "shared name"
        if i == 42:
            assert nd["tags"]["long"] == "x" * 260

    assert len(ways) == 20
    for w, wy in enumerate(sorted(ways, key=lambda x: x["id"])):
        assert wy["id"] == w + 1000
        assert wy["refs"] == [
            (w * 13 + j * 7) % 300 + 1 for j in range(3 + w % 4)
        ]
        assert wy["tags"]["highway"] == f"h{w % 3}"

    assert len(rels) == 8
    for r, rl in enumerate(sorted(rels, key=lambda x: x["id"])):
        assert rl["id"] == r + 5000
        ms = [(m["ref"], m["mtype"], m["role"]) for m in rl["members"]]
        expect = [
            (r % 20 + 1000, "way", "outer"),
            (r * 31 % 300 + 1, "node", ""),
        ]
        if r > 0:
            expect.append((r + 4999, "relation", "sub"))
        assert ms == expect


def test_pbf_o5m_xml_sources_agree(spark, tmp_path):
    """All three sources produce identical DataFrames from the same
    logical world."""
    from osmgraft.sources.o5m import read_o5m
    from osmgraft.sources.osmxml import read_osm_xml
    from osmgraft.sources.pbf import read_pbf

    osm = tmp_path / "w.osm"
    osm.write_text(_world_xml())
    o5m = tmp_path / "w.o5m"
    pbf = tmp_path / "w.pbf"
    subprocess.run([f"{REFBIN}/osmconvert", str(osm), f"-o={o5m}"],
                   check=True)
    subprocess.run([f"{REFBIN}/osmconvert", str(osm), f"-o={pbf}"],
                   check=True)

    def canon(dfs):
        nodes, ways, rels = dfs
        return (
            sorted(
                (r.id, r.lat_i, r.lon_i, tuple(sorted(r.tags.items())))
                for r in nodes.collect()
            ),
            sorted(
                (r.id, tuple(r.refs), tuple(sorted(r.tags.items())))
                for r in ways.collect()
            ),
            sorted(
                (
                    r.id,
                    tuple((m.ref, m.mtype, m.role) for m in r.members),
                    tuple(sorted(r.tags.items())),
                )
                for r in rels.collect()
            ),
        )

    a = canon(read_osm_xml(spark, str(osm)))
    b = canon(read_o5m(spark, str(o5m)))
    c = canon(read_pbf(spark, str(pbf)))
    assert a == b == c


def _concat_blobs(paths, out):
    """Multi-blob .pbf: header blob from the first file + every
    OSMData blob from all files, concatenated on blob boundaries
    (blobs are independent by design — osmconvert.c:3356-3409)."""
    from osmgraft.sources.pbf import index_blobs

    with open(out, "wb") as w:
        first = True
        for p in paths:
            data = open(p, "rb").read()
            for off, end, btype in index_blobs(p):
                if btype == "OSMHeader":
                    if first:
                        w.write(data[off:end])
                        first = False
                elif btype == "OSMData":
                    w.write(data[off:end])


def test_pbf_intrafile_parallel_split(spark, tmp_path):
    """round-2: one .pbf file decodes across MULTIPLE tasks (blob-
    boundary splits), and the rows differentially match what the
    reference binary reads from the very same file."""
    from osmgraft.sources.pbf import plan_splits, read_pbf

    chunks = []
    for c in range(3):
        lines = ['<?xml version="1.0"?>', '<osm version="0.6">']
        for i in range(c * 1000 + 1, c * 1000 + 1001):
            lat = (-300000 + i * 777) / 1e7
            lon = (500000 + i * 333) / 1e7
            lines.append(
                f'<node id="{i}" lat="{lat:.7f}" lon="{lon:.7f}"'
                f' version="1"><tag k="chunk" v="c{c}"/></node>'
            )
        lines.append("</osm>")
        osm = tmp_path / f"c{c}.osm"
        osm.write_text("\n".join(lines))
        pbf = tmp_path / f"c{c}.pbf"
        subprocess.run(
            [f"{REFBIN}/osmconvert", str(osm), f"-o={pbf}"],
            check=True,
        )
        chunks.append(str(pbf))

    multi = tmp_path / "multi.pbf"
    _concat_blobs(chunks, str(multi))

    # the split planner must fan one file out to >1 task
    splits = plan_splits([str(multi)], target_split_bytes=1)
    assert len(splits) == 3, splits

    nodes, _w, _r = read_pbf(
        spark, str(multi), target_split_bytes=1
    )
    assert nodes.rdd.getNumPartitions() >= 3
    got = sorted(
        (r.id, r.lat_i, r.lon_i, r.tags["chunk"])
        for r in nodes.collect()
    )

    # differential: the reference binary reads the same file
    csv = subprocess.run(
        [
            f"{REFBIN}/osmconvert",
            str(multi),
            "--out-csv",
            "--csv=@id @lat @lon chunk",
            "--csv-separator=|",
        ],
        check=True,
        capture_output=True,
        text=True,
    ).stdout
    want = sorted(
        (
            int(a),
            round(float(b) * 1e7),
            round(float(c_) * 1e7),
            d,
        )
        for a, b, c_, d in (
            ln.split("|") for ln in csv.strip().splitlines()
        )
    )
    assert got == want
    assert len(got) == 3000
