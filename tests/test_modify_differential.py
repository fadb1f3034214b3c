"""Differential test: --modify-tags semantics vs the compiled
osmfilter binary (modi_ module, osmfilter.c:3029-3727)."""

from __future__ import annotations

import os
import re
import subprocess

import pytest
from pyspark.sql import functions as F

from osmgraft.filterlang.modify import modify_entries, parse_modify

REFBIN = "/root/repo/.refbin"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REFBIN}/osmfilter"),
    reason="reference binaries not built",
)

MODIFY_ARG = (
    "place=city to =metropolis population>100000 add big=yes "
    "name=Name1* to label= highway=prim* to =secondary"
)

# tag worlds exercising rewrite / numeric add / wildcard rename /
# first-match-wins / untouched tags / leading-zero numerics
WORLDS = [
    {"place": "city", "name": "Name12"},
    {"place": "town", "population": "200000"},
    {"population": "0999999"},
    {"population": "100000"},
    {"population": "100000.5"},
    {"name": "Name1"},
    {"name": "XName1"},
    {"highway": "primary", "place": "city"},
    {"highway": "primrose"},
    {"amenity": "cafe"},
    {"place": "city", "population": "5000000", "name": "Name1x",
     "highway": "prim"},
]


def _run_reference(tmp_path):
    osm = tmp_path / "in.osm"
    with open(osm, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n<osm version="0.6">\n')
        for i, tags in enumerate(WORLDS):
            f.write(
                f'  <node id="{i + 1}" lat="1.0000000" lon="1.0000000"'
                ' version="1">\n'
            )
            for k, v in tags.items():
                f.write(f'    <tag k="{k}" v="{v}"/>\n')
            f.write("  </node>\n")
        f.write("</osm>\n")
    o5m = tmp_path / "in.o5m"
    subprocess.run(
        [f"{REFBIN}/osmconvert", str(osm), f"-o={o5m}"], check=True
    )
    out = subprocess.run(
        [
            f"{REFBIN}/osmfilter",
            str(o5m),
            f"--modify-tags={MODIFY_ARG}",
            "--out-osm",
        ],
        check=True,
        capture_output=True,
    ).stdout.decode()
    result = {}
    for m in re.finditer(
        r'<node id="(\d+)"[^/>]*(?:/>|>(.*?)</node>)', out, re.S
    ):
        nid = int(m.group(1))
        body = m.group(2) or ""
        # ordered tag list (duplicates possible after renames)
        result[nid] = re.findall(r'k="([^"]+)" v="([^"]*)"', body)
    return result


def test_modify_tags_matches_osmfilter(spark, tmp_path):
    ref = _run_reference(tmp_path)
    rules = parse_modify(MODIFY_ARG)
    rows = [
        (i + 1, tags) for i, tags in enumerate(WORLDS)
    ]
    df = spark.createDataFrame(
        rows, "nid long, tags map<string,string>"
    )
    out = df.select(
        "nid", modify_entries(F.col("tags"), rules).alias("ents")
    ).collect()
    ours = {
        r.nid: sorted((e.key, e.val) for e in r.ents) for r in out
    }
    for i in range(len(WORLDS)):
        nid = i + 1
        expected = sorted(ref[nid])
        assert ours[nid] == expected, (
            f"node {nid} tags {WORLDS[i]}: engine={ours[nid]} "
            f"reference={expected}"
        )
