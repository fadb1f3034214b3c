"""C1 end-to-end differential: .osc change application vs the
reference (osmconvert base.osm change.osc)."""

from __future__ import annotations

import os
import subprocess

import pytest
from pyspark.sql import functions as F

REFBIN = "/root/repo/.refbin"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REFBIN}/osmconvert"),
    reason="reference binaries not built",
)

BASE = """<?xml version="1.0" encoding="UTF-8"?>
<osm version="0.6">
  <node id="1" lat="47.0000001" lon="10.0000001" version="1"/>
  <node id="2" lat="47.2000000" lon="10.2000000" version="1">
    <tag k="name" v="old"/>
  </node>
  <node id="3" lat="47.3000000" lon="10.3000000" version="1"/>
  <node id="4" lat="47.4000000" lon="10.4000000" version="1"/>
</osm>
"""

# NB: the reference merges change files as sorted streams — ids
# must ascend across the whole file (osmconvert.c:440-450)
OSC = """<?xml version="1.0" encoding="UTF-8"?>
<osmChange version="0.6">
  <modify>
    <node id="2" lat="47.2500000" lon="10.2500000" version="2">
      <tag k="name" v="new"/>
    </node>
  </modify>
  <delete>
    <node id="3" lat="47.3000000" lon="10.3000000" version="2"/>
  </delete>
  <create>
    <node id="9" lat="48.9000000" lon="11.9000000" version="1"/>
  </create>
</osmChange>
"""


def test_osc_apply_matches_osmconvert(spark, tmp_path):
    from osmgraft.operators.merge import change_apply
    from osmgraft.sources.osmxml import read_osc_nodes, read_osm_xml

    base_p = tmp_path / "base.osm"
    base_p.write_text(BASE)
    osc_p = tmp_path / "change.osc"
    osc_p.write_text(OSC)

    # reference application
    out = subprocess.run(
        [f"{REFBIN}/osmconvert", str(base_p), str(osc_p), "--out-csv",
         "--csv=@id @lon @lat name"],
        check=True, capture_output=True,
    ).stdout.decode()
    ref = {}
    for line in out.splitlines():
        i, lon, lat, name = line.split("\t")
        if lon:
            ref[int(i)] = (_pf(lon), _pf(lat), name or None)

    # our application
    nodes, _, _ = read_osm_xml(spark, str(base_p))
    changes = read_osc_nodes(spark, str(osc_p))
    merged = change_apply(
        nodes,
        changes.select("id", "lat_i", "lon_i", "tags", "deleted"),
        ["id"],
    )
    ours = {
        r.id: (
            r.lon_i,
            r.lat_i,
            r.tags.get("name") if r.tags else None,
        )
        for r in merged.collect()
    }
    assert ours == ref
    assert 3 not in ours and ours[9][0] == 119000000
    assert ours[2] == (102500000, 472500000, "new")


def _pf(s: str) -> int:
    sign = -1 if s.startswith("-") else 1
    s = s.lstrip("-")
    whole, _, frac = s.partition(".")
    return sign * (int(whole) * 10**7 + int(frac.ljust(7, "0")))


def test_asof_join_semantics_and_plan(spark):
    """Boundary inclusivity (vts == ts matches), no-prior ->
    NULL, latest-wins, and the single-shuffle plan."""
    import datetime as dt

    from pyspark.sql import functions as F

    from osmgraft.operators.merge import asof_join

    t = lambda h: dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)
    left = spark.createDataFrame(
        [
            (1, "u", t(0)),   # before any version -> NULL
            (2, "u", t(5)),   # == v5 exactly -> 5
            (3, "u", t(7)),   # between v5 and v10 -> 5
            (4, "u", t(12)),  # after v10 -> 10
            (5, "w", t(9)),   # other key, no versions -> NULL
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", t(5), 5), ("u", t(10), 10)],
        "user_id string, vts timestamp, version long",
    )
    out = asof_join(
        left, right, "user_id", "ts", "vts", ["version"]
    )
    got = {r.event_id: r.version for r in out.collect()}
    assert got == {1: None, 2: 5, 3: 5, 4: 10, 5: None}
    plan = out._jdf.queryExecution().executedPlan().toString()
    # AQE prints Final + Initial sections; count the final only
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 1  # one keyed shuffle-sort
