"""Differential test: ring assembly (G9) vs the compiled osmrelpoly
binary — closed/open/reversed/shuffled member ways, holes, and the
skip-inners-on-unclosed-outers rule."""

from __future__ import annotations

import os
import subprocess

import pytest

from osmgraft.geo.fixedpoint import format_fix7
from osmgraft.geo.rings import assemble_rings

REFBIN = "/root/repo/.refbin"

from .refdiff import build_refbin, have_refbin

pytestmark = pytest.mark.skipif(
    not (
        (have_refbin() and os.path.exists(f"{REFBIN}/osmrelpoly"))
        or build_refbin()
    ),
    reason="reference binaries not built",
)


def _fix(v: float) -> int:
    return int(round(v * 10**7))


# node grid: id -> (lon_i, lat_i)
NODES = {}


def N(nid, lon, lat):
    NODES[nid] = (_fix(lon), _fix(lat))
    return nid


# ---- world ----
# square ring nodes
N(1, 10.0, 47.0); N(2, 11.0, 47.0); N(3, 11.0, 48.0); N(4, 10.0, 48.0)
# hole nodes
N(5, 10.3, 47.3); N(6, 10.6, 47.3); N(7, 10.6, 47.6); N(8, 10.3, 47.6)
# second area
N(9, 12.0, 47.0); N(10, 13.0, 47.1); N(11, 12.9, 48.2); N(12, 12.1, 48.1)
# dangling
N(13, 14.0, 47.0); N(14, 14.5, 47.5); N(15, 14.6, 48.0)

WAYS = {
    # closed square
    100: [1, 2, 3, 4, 1],
    # open halves of the square (to be chained)
    101: [1, 2, 3],
    102: [3, 4, 1],
    # reversed second half
    103: [1, 4, 3],
    # closed hole
    110: [5, 6, 7, 8, 5],
    # open hole halves
    111: [5, 6, 7],
    112: [5, 8, 7],
    # second area open thirds, shuffled/reversed
    120: [9, 10],
    121: [11, 10],
    122: [11, 12],
    123: [9, 12],
    # dangling chains (unclosed)
    130: [13, 14],
    131: [14, 15],
    132: [13, 15],  # would close it; used selectively
    140: [2, 3],
}

RELS = [
    ("closed_outer", [(100, "outer")]),
    ("chained_outer", [(101, "outer"), (102, "outer")]),
    ("reversed_chain", [(101, "outer"), (103, "outer")]),
    ("with_hole", [(100, "outer"), (110, "inner")]),
    ("open_hole", [(100, "outer"), (111, "inner"), (112, "inner")]),
    ("shuffled", [(121, "outer"), (123, "outer"), (120, "outer"),
                  (122, "outer")]),
    ("unclosed_one", [(130, "outer"), (131, "outer"), (100, "outer")]),
    ("two_rings", [(100, "outer"), (120, "outer"), (121, "outer"),
                   (122, "outer"), (123, "outer")]),
    # MUST BE LAST: the reference has a state-leak bug — inner ways
    # skipped by the unclosedn>=2 rule stay in its container and are
    # emitted under the NEXT relation (observed: way 110 appearing
    # as '!3' in the following polygon). Our per-relation kernel is
    # stateless and intentionally does not replicate the leak, so
    # this relation sits at the end where the leak has no successor.
    ("unclosed_two_skips_inner",
     [(130, "outer"), (140, "outer"), (110, "inner")]),
]


def _write_osm(path):
    with open(path, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n<osm version="0.6">\n')
        for nid, (lon, lat) in sorted(NODES.items()):
            f.write(
                f'  <node id="{nid}" lat="{format_fix7(lat)}"'
                f' lon="{format_fix7(lon)}" version="1"/>\n'
            )
        for wid, refs in sorted(WAYS.items()):
            f.write(f'  <way id="{wid}" version="1">\n')
            for r in refs:
                f.write(f'    <nd ref="{r}"/>\n')
            f.write("  </way>\n")
        for i, (name, members) in enumerate(RELS):
            f.write(f'  <relation id="{i + 1}" version="1">\n')
            for wid, role in members:
                f.write(
                    f'    <member type="way" ref="{wid}" role="{role}"/>\n'
                )
            f.write(f'    <tag k="name" v="{name}"/>\n  </relation>\n')
        f.write("</osm>\n")


def _parse_poly(text):
    """-> {name: [(signed_subn, [(x_i, y_i), ...])]}"""
    out = {}
    lines = iter(text.splitlines())
    for line in lines:
        if not line.strip() or line.strip() == "END":
            continue
        name = line.strip()
        sections = []
        for line in lines:
            s = line.strip()
            if s == "END":  # end of polygon
                break
            inner = s.startswith("!")
            subn = int(s.lstrip("!"))
            verts = []
            for line in lines:
                s2 = line.strip()
                if s2 == "END":
                    break
                xs, ys = s2.split()
                verts.append((_pf(xs), _pf(ys)))
            sections.append((-subn if inner else subn, verts))
        out[name] = sections
    return out


def _pf(s: str) -> int:
    sign = -1 if s.startswith("-") else 1
    s = s.lstrip("-")
    whole, _, frac = s.partition(".")
    return sign * (int(whole) * 10**7 + int(frac.ljust(7, "0")))


def test_poly_sink_byte_exact(tmp_path):
    """K5: our .poly serialization is byte-identical to osmrelpoly's
    stdout for the whole fixture world."""
    from osmgraft.geo.rings import assemble_rings, poly_text

    osm = tmp_path / "in.osm"
    _write_osm(osm)
    o5m = tmp_path / "in.o5m"
    subprocess.run(
        [f"{REFBIN}/osmconvert", str(osm), f"-o={o5m}"], check=True
    )
    ref_out = subprocess.run(
        [f"{REFBIN}/osmrelpoly", str(o5m), "--out-poly"],
        check=True,
        capture_output=True,
    ).stdout.decode()
    ours = []
    for name, members in RELS:
        mem = [
            (WAYS[w][0], WAYS[w][-1], [NODES[r] for r in WAYS[w]],
             role == "inner")
            for w, role in members
        ]
        ours.append(poly_text(name, assemble_rings(mem)))
    assert "".join(ours) == ref_out


def test_ring_assembly_matches_osmrelpoly(tmp_path):
    osm = tmp_path / "in.osm"
    _write_osm(osm)
    o5m = tmp_path / "in.o5m"
    subprocess.run(
        [f"{REFBIN}/osmconvert", str(osm), f"-o={o5m}"], check=True
    )
    if not os.path.exists(f"{REFBIN}/osmrelpoly"):
        subprocess.run(
            ["gcc", "/root/reference/src/osmrelpoly.c", "-O2", "-lz",
             "-lm", "-o", f"{REFBIN}/osmrelpoly"],
            check=True,
        )
    ref_out = subprocess.run(
        [f"{REFBIN}/osmrelpoly", str(o5m), "--out-poly"],
        check=True,
        capture_output=True,
    ).stdout.decode()
    ref = _parse_poly(ref_out)

    checked = 0
    for name, members in RELS:
        mem = []
        for wid, role in members:
            refs = WAYS[wid]
            coords = [NODES[r] for r in refs]
            mem.append((refs[0], refs[-1], coords, role == "inner"))
        ours = assemble_rings(mem)
        assert name in ref, f"relation {name} missing from reference output"
        assert ours == ref[name], (
            f"{name}:\n  engine={ours}\n  reference={ref[name]}"
        )
        checked += 1
    assert checked == len(RELS)
