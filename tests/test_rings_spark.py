"""Spark operator test for relation_rings + simplification
differential vs osmrelpoly --simplify."""

from __future__ import annotations

import os
import subprocess

import pytest

from osmgraft.geo.rings import simplify_coords

REFBIN = "/root/repo/.refbin"


def test_relation_rings_spark(spark):
    # square via two open ways + a closed inner hole
    rows = [
        (1, 0, False, 1, 3, [100, 110, 110], [470, 470, 480]),
        (1, 1, False, 3, 1, [110, 100, 100], [480, 480, 470]),
        (1, 2, True, 5, 5, [103, 106, 106, 103, 103],
         [473, 473, 476, 476, 473]),
    ]
    df = spark.createDataFrame(
        rows,
        "rel_id long, member_idx int, is_inner boolean, "
        "first_node long, last_node long, "
        "xs array<long>, ys array<long>",
    )
    from osmgraft.operators.rings_op import relation_rings

    out = {
        r.subn: [(v.x, v.y) for v in r.vertices]
        for r in relation_rings(df).collect()
    }
    # the two open outer ways chain into ONE ring; hole is -2
    assert set(out) == {1, -2}
    assert len(out[1]) >= 4
    assert out[-2][0] == (103, 473)


@pytest.mark.skipif(
    not os.path.exists(f"{REFBIN}/osmrelpoly"),
    reason="reference binaries not built",
)
def test_simplify_matches_osmrelpoly(tmp_path):
    from osmgraft.geo.fixedpoint import format_fix7

    # a wiggly closed way: simplification should drop near-collinear
    # vertices identically to the reference
    import numpy as np

    k = np.arange(24)
    lon = (110_000_000 + k * 1_000_000 + (k % 3) * 900).astype("int64")
    lat = (470_000_000 + (k % 7) * 2_000_000 + (k % 2) * 1100).astype(
        "int64"
    )
    coords = list(zip(lon.tolist(), lat.tolist()))
    coords.append(coords[0])

    osm = tmp_path / "in.osm"
    with open(osm, "w") as f:
        f.write('<?xml version="1.0"?>\n<osm version="0.6">\n')
        for i, (x, y) in enumerate(coords[:-1]):
            f.write(
                f'  <node id="{i + 1}" lat="{format_fix7(y)}"'
                f' lon="{format_fix7(x)}" version="1"/>\n'
            )
        f.write('  <way id="1" version="1">\n')
        for i in range(len(coords) - 1):
            f.write(f'    <nd ref="{i + 1}"/>\n')
        f.write('    <nd ref="1"/>\n  </way>\n')
        f.write('  <relation id="1" version="1">\n')
        f.write('    <member type="way" ref="1" role="outer"/>\n')
        f.write('    <tag k="name" v="wiggle"/>\n  </relation>\n')
        f.write("</osm>\n")
    o5m = tmp_path / "in.o5m"
    subprocess.run(
        [f"{REFBIN}/osmconvert", str(osm), f"-o={o5m}"], check=True
    )
    for meters in (2000, 20000):
        ref_out = subprocess.run(
            [f"{REFBIN}/osmrelpoly", str(o5m), f"--simplify={meters}",
             "--out-poly"],
            check=True,
            capture_output=True,
        ).stdout.decode()
        ref_verts = []
        for line in ref_out.splitlines():
            s = line.strip()
            if s and s[0] in "-0123456789" and " " in s:
                xs, ys = s.split()
                ref_verts.append((_pf(xs), _pf(ys)))
        ours = simplify_coords(coords, meters * meters)
        assert ours == ref_verts, (
            f"simplify={meters}: engine {len(ours)} verts vs "
            f"reference {len(ref_verts)}\n{ours}\n{ref_verts}"
        )


def _pf(s: str) -> int:
    sign = -1 if s.startswith("-") else 1
    s = s.lstrip("-")
    whole, _, frac = s.partition(".")
    return sign * (int(whole) * 10**7 + int(frac.ljust(7, "0")))
