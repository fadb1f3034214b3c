"""CLI differentials: the osmgraft-convert command line must agree
with the reference binaries invocation-for-invocation."""

from __future__ import annotations

import os
import subprocess

import pytest

from osmgraft.cli import convert

from .test_o5m_source import _world_xml

REFBIN = "/root/repo/.refbin"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REFBIN}/osmconvert"),
    reason="reference binaries not built",
)

_CSV = ["--out-csv", "--csv=@otype @id @lat @lon amenity highway",
        "--csv-separator=|"]


def _ref_csv(*args) -> str:
    return subprocess.run(
        [f"{REFBIN}/osmconvert", *args],
        check=True, capture_output=True, text=True,
    ).stdout


def test_cli_format_conversion(spark, tmp_path):
    osm = tmp_path / "w.osm"
    osm.write_text(_world_xml())
    out = tmp_path / "w.o5m"
    convert(spark, [str(osm), f"-o={out}"])
    assert _ref_csv(str(out), *_CSV) == _ref_csv(str(osm), *_CSV)

    pbf = tmp_path / "w2.pbf"
    convert(spark, [str(osm), f"-o={pbf}"])
    assert _ref_csv(str(pbf), *_CSV) == _ref_csv(str(osm), *_CSV)


def test_cli_bbox_clip_matches_osmconvert(spark, tmp_path):
    """-b + --drop-broken-refs on a nodes+ways world must match the
    reference exactly (node set, kept ways, pruned refs)."""
    lines = ['<?xml version="1.0"?>', '<osm version="0.6">']
    for i in range(1, 201):
        lat = (-100000 + i * 3777) / 1e7
        lon = (50000 + i * 5333) / 1e7
        lines.append(
            f'<node id="{i}" lat="{lat:.7f}" lon="{lon:.7f}"'
            ' version="1"/>'
        )
    for w in range(40):
        lines.append(f'<way id="{w + 1000}" version="1">')
        for j in range(4):
            lines.append(f'<nd ref="{(w * 11 + j * 3) % 200 + 1}"/>')
        lines.append(f'<tag k="highway" v="h{w % 3}"/>')
        lines.append("</way>")
    lines.append("</osm>")
    osm = tmp_path / "bb.osm"
    osm.write_text("\n".join(lines))

    bbox = "0.01,-0.005,0.09,0.06"
    ours = tmp_path / "ours.o5m"
    convert(
        spark,
        [str(osm), f"-b={bbox}", "--drop-broken-refs", f"-o={ours}"],
    )
    theirs = tmp_path / "theirs.o5m"
    subprocess.run(
        [
            f"{REFBIN}/osmconvert", str(osm), f"-b={bbox}",
            "--drop-broken-refs", f"-o={theirs}",
        ],
        check=True,
    )
    cols = ["--out-csv", "--csv=@otype @id @lat @lon highway",
            "--csv-separator=|"]
    assert _ref_csv(str(ours), *cols) == _ref_csv(str(theirs), *cols)


def test_cli_keep_filter_matches_osmfilter(spark, tmp_path, capsys):
    """--keep on a nodes world must match osmfilter --keep."""
    lines = ['<?xml version="1.0"?>', '<osm version="0.6">']
    for i in range(1, 301):
        lat = (i * 1000) / 1e7
        lon = (-i * 500) / 1e7
        place = ["city", "town", "village"][i % 3]
        pop = i * 997 % 40000
        lines.append(
            f'<node id="{i}" lat="{lat:.7f}" lon="{lon:.7f}"'
            ' version="1">'
            f'<tag k="place" v="{place}"/>'
            f'<tag k="population" v="{pop}"/>'
            "</node>"
        )
    lines.append("</osm>")
    osm = tmp_path / "kp.osm"
    osm.write_text("\n".join(lines))

    expr = "place=city or ( place=town and population>=10000 )"
    ours = tmp_path / "ours.o5m"
    convert(spark, [str(osm), f"--keep={expr}", f"-o={ours}"])

    theirs = tmp_path / "theirs.o5m"
    o5m_in = tmp_path / "kp.o5m"
    subprocess.run(
        [f"{REFBIN}/osmconvert", str(osm), f"-o={o5m_in}"],
        check=True,
    )
    subprocess.run(
        [
            f"{REFBIN}/osmfilter", str(o5m_in),
            f"--keep={expr}", "--ignore-dependencies",
            f"-o={theirs}",
        ],
        check=True,
    )
    cols = ["--out-csv", "--csv=@id @lat @lon place population",
            "--csv-separator=|"]
    assert _ref_csv(str(ours), *cols) == _ref_csv(str(theirs), *cols)


def test_cli_out_csv_byte_exact(spark, tmp_path, capsys):
    """--out-csv must byte-match osmconvert's CSV on a nodes world
    (K4 separator-collision semantics included)."""
    lines = ['<?xml version="1.0"?>', '<osm version="0.6">']
    for i in range(1, 101):
        lat = (i * 77) / 1e7
        lon = (-i * 33) / 1e7
        name = f"n|ame {i}" if i % 5 == 0 else f"name{i}"
        lines.append(
            f'<node id="{i}" lat="{lat:.7f}" lon="{lon:.7f}"'
            f' version="1"><tag k="name" v="{name}"/></node>'
        )
    lines.append("</osm>")
    osm = tmp_path / "c.osm"
    osm.write_text("\n".join(lines))

    convert(
        spark,
        [str(osm), "--out-csv", "--csv=@id @lat @lon name",
         "--csv-separator=|"],
    )
    ours = capsys.readouterr().out
    want = _ref_csv(
        str(osm), "--out-csv", "--csv=@id @lat @lon name",
        "--csv-separator=|",
    )
    assert ours == want


def test_cli_merge_multiple_inputs(spark, tmp_path):
    """two inputs, later overrides earlier for equal ids (J3)."""
    a = tmp_path / "a.osm"
    a.write_text(
        '<?xml version="1.0"?><osm version="0.6">'
        '<node id="1" lat="0.0000001" lon="0.0000002" version="1">'
        '<tag k="amenity" v="old"/></node>'
        '<node id="2" lat="0.0000003" lon="0.0000004" version="1"/>'
        "</osm>"
    )
    b = tmp_path / "b.osm"
    b.write_text(
        '<?xml version="1.0"?><osm version="0.6">'
        '<node id="1" lat="0.0000009" lon="0.0000008" version="1">'
        '<tag k="amenity" v="new"/></node>'
        "</osm>"
    )
    out = tmp_path / "m.o5m"
    convert(spark, [str(a), str(b), f"-o={out}"])
    got = _ref_csv(
        str(out), "--out-csv", "--csv=@id @lat @lon amenity",
        "--csv-separator=|",
    )
    assert "1|0.0000009|0.0000008|new" in got
    assert "2|" in got


def test_cli_poly_clip_matches_osmconvert(spark, tmp_path):
    """-B= border clipping through the CLI vs osmconvert -B."""
    lines = ['<?xml version="1.0"?>', '<osm version="0.6">']
    for i in range(1, 301):
        lat = (-400000 + i * 3337) / 1e7
        lon = (-200000 + i * 2221) / 1e7
        lines.append(
            f'<node id="{i}" lat="{lat:.7f}" lon="{lon:.7f}"'
            ' version="1"/>'
        )
    lines.append("</osm>")
    osm = tmp_path / "p.osm"
    osm.write_text("\n".join(lines))
    poly = tmp_path / "m.poly"
    poly.write_text(
        "m\n1\n   -0.01  -0.02\n   0.05  -0.02\n   0.05  0.04\n"
        "   -0.01  0.04\nEND\nEND\n"
    )

    ours = tmp_path / "ours.o5m"
    convert(spark, [str(osm), f"-B={poly}", f"-o={ours}"])
    theirs = tmp_path / "theirs.o5m"
    subprocess.run(
        [
            f"{REFBIN}/osmconvert", str(osm), f"-B={poly}",
            f"-o={theirs}",
        ],
        check=True,
    )
    cols = ["--out-csv", "--csv=@id @lat @lon", "--csv-separator=|"]
    assert _ref_csv(str(ours), *cols) == _ref_csv(str(theirs), *cols)
