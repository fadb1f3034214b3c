"""S2 o5m source differential: osmconvert-generated .o5m parsed by
our decoder must equal the XML view of the same data (delta chains,
string-table references, negative coords, roles, authors)."""

from __future__ import annotations

import os
import subprocess

import pytest

from osmgraft.sources.o5m import parse_o5m

REFBIN = "/root/repo/.refbin"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REFBIN}/osmconvert"),
    reason="reference binaries not built",
)


def _world_xml() -> str:
    lines = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<osm version="0.6">']
    # 300 nodes with repeating tag pairs (forces string references),
    # negative + jittered coords (delta coding both signs)
    for i in range(300):
        lat = (-300000 + i * 77777) / 10**7
        lon = (500000 - i * 33333) / 10**7
        attrs = f'id="{i + 1}" lat="{lat:.7f}" lon="{lon:.7f}" version="1"'
        if i % 5 == 0:
            attrs += (f' timestamp="2020-01-0{i % 9 + 1}T00:00:0'
                      f'{i % 10}Z" changeset="{100 + i % 7}"'
                      f' uid="{i % 13 + 1}" user="user{i % 13}"')
        lines.append(f"  <node {attrs}>")
        lines.append(f'    <tag k="amenity" v="kind{i % 4}"/>')
        if i % 3 == 0:
            lines.append('    <tag k="name" v="shared name"/>')
        if i == 42:
            lines.append(f'    <tag k="long" v="{"x" * 260}"/>')
        lines.append("  </node>")
    for w in range(20):
        lines.append(f'  <way id="{w + 1000}" version="1">')
        for j in range(3 + w % 4):
            lines.append(f'    <nd ref="{(w * 13 + j * 7) % 300 + 1}"/>')
        lines.append(f'    <tag k="highway" v="h{w % 3}"/>')
        lines.append("  </way>")
    for r in range(8):
        lines.append(f'  <relation id="{r + 5000}" version="1">')
        lines.append(
            f'    <member type="way" ref="{r % 20 + 1000}" role="outer"/>'
        )
        lines.append(
            f'    <member type="node" ref="{r * 31 % 300 + 1}" role=""/>'
        )
        if r > 0:
            lines.append(
                f'    <member type="relation" ref="{r + 4999}"'
                ' role="sub"/>'
            )
        lines.append('    <tag k="type" v="multipolygon"/>')
        lines.append("  </relation>")
    lines.append("</osm>")
    return "\n".join(lines)


def test_o5m_decoder_matches_reference(tmp_path):
    osm = tmp_path / "w.osm"
    osm.write_text(_world_xml())
    o5m = tmp_path / "w.o5m"
    subprocess.run(
        [f"{REFBIN}/osmconvert", str(osm), f"-o={o5m}"], check=True
    )
    nodes, ways, rels = parse_o5m(o5m.read_bytes())

    assert len(nodes) == 300
    for i, nd in enumerate(nodes):
        assert nd["id"] == i + 1
        assert nd["lat_i"] == -300000 + i * 77777
        assert nd["lon_i"] == 500000 - i * 33333
        assert nd["tags"]["amenity"] == f"kind{i % 4}"
        if i % 3 == 0:
            assert nd["tags"]["name"] == "shared name"
        if i == 42:
            assert nd["tags"]["long"] == "x" * 260

    assert len(ways) == 20
    for w, wy in enumerate(ways):
        assert wy["id"] == w + 1000
        assert wy["refs"] == [
            (w * 13 + j * 7) % 300 + 1 for j in range(3 + w % 4)
        ]
        assert wy["tags"]["highway"] == f"h{w % 3}"

    assert len(rels) == 8
    for r, rl in enumerate(rels):
        assert rl["id"] == r + 5000
        ms = [(m["ref"], m["mtype"], m["role"]) for m in rl["members"]]
        expect = [
            (r % 20 + 1000, "way", "outer"),
            (r * 31 % 300 + 1, "node", ""),
        ]
        if r > 0:
            expect.append((r + 4999, "relation", "sub"))
        assert ms == expect
        assert rl["tags"]["type"] == "multipolygon"


def test_read_o5m_spark(spark, tmp_path):
    osm = tmp_path / "w.osm"
    osm.write_text(_world_xml())
    o5m = tmp_path / "w.o5m"
    subprocess.run(
        [f"{REFBIN}/osmconvert", str(osm), f"-o={o5m}"], check=True
    )
    from osmgraft.sources.o5m import read_o5m

    nodes, ways, rels = read_o5m(spark, str(o5m))
    assert nodes.count() == 300
    assert ways.count() == 20
    assert rels.count() == 8
    row = nodes.filter("id = 43").collect()[0]
    assert row.tags["long"] == "x" * 260
