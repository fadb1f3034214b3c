"""S1 OSM XML source: round-trip vs the reference binary's own view
of the same file (osmconvert --out-csv as the node oracle), plus
way/relation structure and multi-file parallel ingest."""

from __future__ import annotations

import os
import subprocess

import pytest

from osmgraft.sources.osmxml import read_osm_xml

REFBIN = "/root/repo/.refbin"

XML1 = """<?xml version="1.0" encoding="UTF-8"?>
<osm version="0.6">
  <node id="1" lat="47.1234567" lon="10.7654321" version="1"/>
  <node id="2" lat="-0.0000001" lon="-179.9999999" version="1">
    <tag k="name" v="A &amp; B"/>
    <tag k="place" v="city"/>
  </node>
  <node id="3" lat="47.12345678" lon="10.0" version="1"/>
  <way id="10" version="1">
    <nd ref="1"/>
    <nd ref="2"/>
    <nd ref="1"/>
    <tag k="highway" v="primary"/>
  </way>
  <relation id="20" version="1">
    <member type="way" ref="10" role="outer"/>
    <member type="node" ref="2" role=""/>
    <tag k="type" v="multipolygon"/>
  </relation>
</osm>
"""

XML2 = """<?xml version="1.0" encoding="UTF-8"?>
<osm version="0.6">
  <node id="5" lat="1.5" lon="2.5" version="1"/>
</osm>
"""


def test_read_osm_xml(spark, tmp_path):
    (tmp_path / "a.osm").write_text(XML1)
    (tmp_path / "b.osm").write_text(XML2)
    nodes, ways, rels = read_osm_xml(spark, str(tmp_path) + "/*.osm")

    n = {r.id: r for r in nodes.collect()}
    assert set(n) == {1, 2, 3, 5}
    assert (n[1].lat_i, n[1].lon_i) == (471234567, 107654321)
    # negative truncation toward zero + XML entity unescape
    assert (n[2].lat_i, n[2].lon_i) == (-1, -1799999999)
    assert n[2].tags["name"] == "A & B"
    # 8th decimal digit ignored (oo__strtodeg truncation)
    assert n[3].lat_i == 471234567
    assert (n[5].lat_i, n[5].lon_i) == (15000000, 25000000)

    w = {r.id: r for r in ways.collect()}
    assert w[10].refs == [1, 2, 1]
    assert w[10].tags["highway"] == "primary"

    r = {x.id: x for x in rels.collect()}
    ms = [(m.ref, m.mtype, m.role) for m in r[20].members]
    assert ms == [(10, "way", "outer"), (2, "node", "")]


@pytest.mark.skipif(
    not os.path.exists(f"{REFBIN}/osmconvert"),
    reason="reference binaries not built",
)
def test_node_coords_match_osmconvert_csv(spark, tmp_path):
    """The reference's own CSV of (@id @lon @lat) is the oracle for
    our fixed-point parse of the SAME xml bytes."""
    p = tmp_path / "a.osm"
    p.write_text(XML1)
    out = subprocess.run(
        [f"{REFBIN}/osmconvert", str(p), "--out-csv",
         "--csv=@id @lon @lat"],
        check=True, capture_output=True,
    ).stdout.decode()
    ref = {}
    for line in out.splitlines():
        i, lon, lat = line.split("\t")
        if lon:  # ways/relations appear with empty coord fields
            ref[int(i)] = (_pf(lon), _pf(lat))
    nodes, _, _ = read_osm_xml(spark, str(p))
    for r in nodes.collect():
        assert ref[r.id] == (r.lon_i, r.lat_i), f"node {r.id}"


def test_gzip_xml_input(spark, tmp_path):
    """S4: gzip-compressed .osm.gz reads transparently (codec by
    extension), matching the reference's transparent gz read
    (osmconvert.c:2185-2291)."""
    import gzip

    (tmp_path / "a.osm.gz").write_bytes(
        gzip.compress(XML1.encode())
    )
    nodes, ways, rels = read_osm_xml(
        spark, str(tmp_path / "a.osm.gz")
    )
    assert nodes.count() == 3
    assert ways.count() == 1
    assert rels.count() == 1


def _pf(s: str) -> int:
    sign = -1 if s.startswith("-") else 1
    s = s.lstrip("-")
    whole, _, frac = s.partition(".")
    return sign * (int(whole) * 10**7 + int(frac.ljust(7, "0")))


def test_read_osm_auto_sniffs_all_formats(spark, tmp_path):
    """S5: one entry dispatches .osm/.osm.gz/.o5m/.pbf by magic
    bytes (oo__getformat osmconvert.c:9882-9950)."""
    import gzip
    import subprocess

    from osmgraft.sources.auto import read_osm_auto, sniff_format
    from tests.test_o5m_source import _world_xml

    osm = tmp_path / "w.osm"
    osm.write_text(_world_xml())
    gz = tmp_path / "w.osm.gz"
    gz.write_bytes(gzip.compress(osm.read_bytes()))
    o5m = tmp_path / "w.o5m"
    pbf = tmp_path / "w.pbf"
    refbin = "/root/repo/.refbin/osmconvert"
    import os

    if os.path.exists(refbin):
        subprocess.run([refbin, str(osm), f"-o={o5m}"], check=True)
        subprocess.run([refbin, str(osm), f"-o={pbf}"], check=True)
    else:
        from osmgraft.sources.osmxml import _parse
        from osmgraft.wire import encode_o5m, encode_pbf

        n, w, r = _parse(_world_xml())
        o5m.write_bytes(encode_o5m(n, w, r))
        pbf.write_bytes(encode_pbf(n, w, r))

    assert sniff_format(str(osm)) == "xml"
    assert sniff_format(str(gz)) == "xml-gz"
    assert sniff_format(str(o5m)) == "o5m"
    assert sniff_format(str(pbf)) == "pbf"

    def n_ids(path):
        nodes, _w, _r = read_osm_auto(spark, path)
        return sorted(r.id for r in nodes.select("id").collect())

    want = list(range(1, 301))
    assert n_ids(str(osm)) == want
    assert n_ids(str(gz)) == want
    assert n_ids(str(o5m)) == want
    assert n_ids(str(pbf)) == want
