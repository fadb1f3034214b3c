"""K4 CSV sink differential vs osmconvert --csv: pseudo-columns,
missing tags, separator-collision replacement."""

from __future__ import annotations

import os
import subprocess

import pytest
from pyspark.sql import functions as F

from osmgraft.geo.fixedpoint import format_fix7

REFBIN = "/root/repo/.refbin"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REFBIN}/osmconvert"),
    reason="reference binaries not built",
)

NODES = [
    # (id, lon_i, lat_i, tags)
    (1, 101000000, 471000000, {"name": "Plain", "place": "city"}),
    (2, 102000000, 472000000, {"name": "Tab\there", "place": "town"}),
    (3, 103000000, 473000000, {"place": "village"}),  # no name
    (4, 104000000, 474000000, {}),  # no requested tag at all
    (5, 105000000, 475000000, {"name": "semi;colon"}),
]


def _run_reference(tmp_path, sep: str, csv_arg: str):
    osm = tmp_path / "in.osm"
    with open(osm, "w") as f:
        f.write('<?xml version="1.0"?>\n<osm version="0.6">\n')
        for nid, lon, lat, tags in NODES:
            f.write(
                f'  <node id="{nid}" lat="{format_fix7(lat)}"'
                f' lon="{format_fix7(lon)}" version="1"'
            )
            if tags:
                f.write(">\n")
                for k, v in tags.items():
                    v = v.replace("\t", "&#9;")
                    f.write(f'    <tag k="{k}" v="{v}"/>\n')
                f.write("  </node>\n")
            else:
                f.write("/>\n")
        f.write("</osm>\n")
    args = [
        f"{REFBIN}/osmconvert", str(osm), "--out-csv",
        f"--csv={csv_arg}",
    ]
    if sep != "\t":
        args.append(f"--csv-separator={sep}")
    return subprocess.run(
        args, check=True, capture_output=True
    ).stdout.decode()


@pytest.mark.parametrize("sep", ["\t", ";", " "])
def test_csv_sink_matches_osmconvert(spark, tmp_path, sep):
    from osmgraft.operators.sinks import csv_lines

    ref = _run_reference(tmp_path, sep, "@id @lon @lat name place")
    # CSV pseudo-cols @lon/@lat keep the full 7 decimals
    # (write_createsfix7o, not the zero-stripping XML-attr writer)
    rows = [
        (nid, format_fix7(lon), format_fix7(lat),
         tags.get("name"), tags.get("place"))
        for nid, lon, lat, tags in NODES
    ]
    df = spark.createDataFrame(
        rows, "id long, lon string, lat string, name string, "
              "place string",
    )
    ours = csv_lines(df, ["id", "lon", "lat", "name", "place"], sep)
    got = "".join(r.value + "\n" for r in ours.collect())
    assert got == ref, f"sep={sep!r}:\n{got!r}\nvs\n{ref!r}"
