"""K1-K3 wire-sink differentials: our writers' output must be
readable BY THE REFERENCE BINARY with byte-identical results to the
reference's own view of the same world, and must round-trip through
our own readers."""

from __future__ import annotations

import os
import subprocess

import pytest

from osmgraft.sources.o5m import parse_o5m
from osmgraft.sources.osmxml import _parse as parse_xml
from osmgraft.sources.pbf import parse_pbf
from osmgraft.wire import encode_o5m, encode_osm_xml, encode_pbf

from .test_o5m_source import _world_xml

REFBIN = "/root/repo/.refbin"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REFBIN}/osmconvert"),
    reason="reference binaries not built",
)

# NB: tag columns must be named explicitly — @keys/@values are not
# osmconvert CSV pseudo-columns (they print empty), which would make
# the tag comparison vacuous.
_CSV_ARGS = [
    "--out-csv",
    "--csv=@otype @id @lat @lon amenity name highway long",
    "--csv-separator=|",
]


def _world_rows(tmp_path):
    """The canonical world as row-dict lists, via the XML kernel."""
    return parse_xml(_world_xml())


def _ref_csv(path) -> str:
    return subprocess.run(
        [f"{REFBIN}/osmconvert", str(path), *_CSV_ARGS],
        check=True,
        capture_output=True,
        text=True,
    ).stdout


def test_o5m_writer_roundtrips_through_own_reader(tmp_path):
    nodes, ways, rels = _world_rows(tmp_path)
    data = encode_o5m(nodes, ways, rels)
    n2, w2, r2 = parse_o5m(data)
    assert n2 == nodes
    assert w2 == ways
    assert r2 == rels


def test_pbf_writer_roundtrips_through_own_reader(tmp_path):
    nodes, ways, rels = _world_rows(tmp_path)
    # small block size forces multiple blobs
    data = encode_pbf(nodes, ways, rels, block_objects=100)
    n2, w2, r2 = parse_pbf(data)
    assert n2 == nodes
    assert w2 == ways
    assert r2 == rels


def test_xml_writer_roundtrips_through_own_reader(tmp_path):
    nodes, ways, rels = _world_rows(tmp_path)
    n2, w2, r2 = parse_xml(encode_osm_xml(nodes, ways, rels))
    assert n2 == nodes
    assert w2 == ways
    assert r2 == rels


def test_reference_binary_reads_our_wire_files(tmp_path):
    """THE differential: osmconvert's CSV view of our .o5m, .pbf,
    and .osm files must be byte-identical to its CSV view of the
    reference-made .o5m of the same world."""
    osm = tmp_path / "w.osm"
    osm.write_text(_world_xml())
    ref_o5m = tmp_path / "ref.o5m"
    subprocess.run(
        [f"{REFBIN}/osmconvert", str(osm), f"-o={ref_o5m}"],
        check=True,
    )
    want = _ref_csv(ref_o5m)
    assert want.strip()

    nodes, ways, rels = _world_rows(tmp_path)
    ours_o5m = tmp_path / "ours.o5m"
    ours_o5m.write_bytes(encode_o5m(nodes, ways, rels))
    assert _ref_csv(ours_o5m) == want

    ours_pbf = tmp_path / "ours.pbf"
    ours_pbf.write_bytes(
        encode_pbf(nodes, ways, rels, block_objects=100)
    )
    assert _ref_csv(ours_pbf) == want

    ours_xml = tmp_path / "ours.osm"
    ours_xml.write_text(encode_osm_xml(nodes, ways, rels))
    assert _ref_csv(ours_xml) == want


def test_o5m_string_table_references_are_emitted(tmp_path):
    """the writer must actually use back-references (the format's
    core compression): a world with repeated tags must encode
    smaller than the same world with inline-only strings, and the
    reference binary must still read it (covered above). Proxy: the
    repeated pair appears exactly once in the byte stream."""
    nodes = [
        {"id": i + 1, "lat_i": i, "lon_i": -i,
         "tags": {"amenity": "bench"}}
        for i in range(50)
    ]
    data = encode_o5m(nodes, [], [])
    assert data.count(b"amenity\x00bench\x00") == 1


def test_wire_dir_distributed_roundtrip(spark, tmp_path):
    """scale path: multi-part directory written by executors reads
    back identically through the matching source."""
    from osmgraft.sources.o5m import read_o5m
    from osmgraft.sources.osmxml import read_osm_xml
    from osmgraft.wire import write_wire_dir

    osm = tmp_path / "w.osm"
    osm.write_text(_world_xml())
    nodes, ways, rels = read_osm_xml(spark, str(osm))

    def canon(dfs):
        n, w, r = dfs
        return (
            sorted(
                (x.id, x.lat_i, x.lon_i, tuple(sorted(x.tags.items())))
                for x in n.collect()
            ),
            sorted(
                (x.id, tuple(x.refs), tuple(sorted(x.tags.items())))
                for x in w.collect()
            ),
            sorted(
                (
                    x.id,
                    tuple((m.ref, m.mtype, m.role) for m in x.members),
                    tuple(sorted(x.tags.items())),
                )
                for x in r.collect()
            ),
        )

    want = canon((nodes, ways, rels))

    out = tmp_path / "parts_o5m"
    manifest = write_wire_dir(
        nodes, ways, rels, str(out), fmt="o5m", parts=3
    )
    assert len(manifest) >= 3
    assert sum(m["n_rows"] for m in manifest) == 300 + 20 + 8
    got = canon(read_o5m(spark, str(out)))
    assert got == want

    out2 = tmp_path / "parts_osm"
    write_wire_dir(nodes, ways, rels, str(out2), fmt="osm", parts=3)
    got2 = canon(read_osm_xml(spark, str(out2)))
    assert got2 == want

    from osmgraft.sources.pbf import read_pbf

    out3 = tmp_path / "parts_pbf"
    write_wire_dir(nodes, ways, rels, str(out3), fmt="pbf", parts=3)
    got3 = canon(read_pbf(spark, str(out3)))
    assert got3 == want


def test_changefile_sinks_apply_identically(spark, tmp_path):
    """Change-file writers (.o5c and .osc): osmconvert applying OUR
    base .o5m + OUR changefile must produce exactly what the
    engine's change_apply computes on the same DataFrames."""
    from osmgraft.operators.merge import change_apply
    from osmgraft.wire.osmxml import encode_osc

    base_nodes = [
        {"id": i, "lat_i": i * 1000, "lon_i": -i * 500,
         "tags": {"name": f"n{i}"}}
        for i in range(1, 21)
    ]
    # modify 5 and 7, add 100, delete 3 and 12
    chg_nodes = [
        {"id": 3, "lat_i": None, "lon_i": None, "tags": None},
        {"id": 5, "lat_i": 555555, "lon_i": -55, "tags":
            {"name": "five", "fixme": "yes"}},
        {"id": 7, "lat_i": 777, "lon_i": 77, "tags": {}},
        {"id": 12, "lat_i": None, "lon_i": None, "tags": None},
        {"id": 100, "lat_i": 1, "lon_i": 2, "tags": {"name": "new"}},
    ]

    base_p = tmp_path / "base.o5m"
    base_p.write_bytes(encode_o5m(base_nodes, [], []))

    # engine-side apply
    bdf = spark.createDataFrame(
        [(n["id"], n["lat_i"], n["lon_i"], n["tags"])
         for n in base_nodes],
        "id long, lat_i long, lon_i long, tags map<string,string>",
    )
    cdf = spark.createDataFrame(
        [(n["id"], n["lat_i"], n["lon_i"], n["tags"],
          n["tags"] is None) for n in chg_nodes],
        "id long, lat_i long, lon_i long, "
        "tags map<string,string>, deleted boolean",
    )
    want = sorted(
        (r.id, r.lat_i, r.lon_i, tuple(sorted(r.tags.items())))
        for r in change_apply(bdf, cdf, ["id"]).collect()
    )

    def ref_apply(chg_path) -> list:
        out = subprocess.run(
            [
                f"{REFBIN}/osmconvert", str(base_p), str(chg_path),
                "--out-csv", "--csv=@id @lat @lon name fixme",
                "--csv-separator=;",
            ],
            check=True, capture_output=True, text=True,
        ).stdout
        rows = []
        for ln in out.strip().splitlines():
            i, la, lo, nm, fx = (ln.split(";") + [""] * 5)[:5]
            tags = tuple(
                kv for kv in (("fixme", fx), ("name", nm)) if kv[1]
            )
            rows.append(
                (int(i), round(float(la) * 1e7),
                 round(float(lo) * 1e7), tags)
            )
        return sorted(rows)

    o5c = tmp_path / "chg.o5c"
    o5c.write_bytes(encode_o5m(chg_nodes, [], [], change=True))
    assert ref_apply(o5c) == want

    osc = tmp_path / "chg.osc"
    osc.write_text(encode_osc(chg_nodes, [], []))
    assert ref_apply(osc) == want


def test_o5m_timestamp_and_bbox_datasets(tmp_path):
    """K8: the reference's --out-timestamp must read back the 0xdc
    dataset our writer emits, objects still byte-identical, and our
    own probes decode both header datasets."""
    from osmgraft.sources.o5m import o5m_bbox, o5m_file_timestamp

    nodes, ways, rels = parse_xml(_world_xml())
    ts = 1500000000  # 2017-07-14T02:40:00Z
    data = encode_o5m(
        nodes, ways, rels,
        file_timestamp=ts,
        bbox=(-300000, 500000 - 299 * 33333, 500000, -300000 + 299 * 77777),
    )
    p = tmp_path / "ts.o5m"
    p.write_bytes(data)

    out = subprocess.run(
        [f"{REFBIN}/osmconvert", str(p), "--out-timestamp"],
        check=True, capture_output=True, text=True,
    ).stdout.strip()
    assert out == "2017-07-14T02:40:00Z"

    # header datasets don't perturb the object stream
    plain = encode_o5m(nodes, ways, rels)
    q = tmp_path / "plain.o5m"
    q.write_bytes(plain)
    assert _ref_csv(p) == _ref_csv(q)

    assert o5m_file_timestamp(data) == ts
    assert o5m_bbox(data) is not None
    assert o5m_file_timestamp(plain) is None


def _random_world(seed: int):
    """Seeded random world: unicode strings, XML-escape characters,
    string-table boundary lengths (around the 250-byte storable
    limit, incl. multibyte boundaries), both-sign coords, random
    roles — the hard cases of every wire encoder at once."""
    import random

    rng = random.Random(seed)
    pool = [
        "café", "улица", "日本橋", 'quo"te', "amp&lt",
        "a<b>c", "apos'x", "x" * 248, "y" * 250, "ß" * 125,
        "plain", "", "trail ",
    ]
    keys = ["amenity", "name", "ref:née", "k4"]

    def tags():
        return {
            rng.choice(keys): rng.choice(pool)
            for _ in range(rng.randint(0, 4))
        }

    nodes = []
    nid = 0
    for _ in range(rng.randint(150, 250)):
        nid += rng.randint(1, 1000)
        nodes.append(
            {
                "id": nid,
                "lat_i": rng.randint(-850000000, 850000000),
                "lon_i": rng.randint(-1799999999, 1799999999),
                "tags": tags(),
            }
        )
    node_ids = [n["id"] for n in nodes]
    ways = []
    wid = nid + 1000
    for _ in range(rng.randint(20, 40)):
        wid += rng.randint(1, 50)
        ways.append(
            {
                "id": wid,
                "refs": [
                    rng.choice(node_ids)
                    for _ in range(rng.randint(2, 8))
                ],
                "tags": tags(),
            }
        )
    way_ids = [w["id"] for w in ways]
    rels = []
    rid = wid + 1000
    for _ in range(rng.randint(5, 15)):
        rid += rng.randint(1, 20)
        members = []
        for _ in range(rng.randint(1, 6)):
            t = rng.choice(["node", "way", "relation"])
            ref = rng.choice(
                node_ids if t == "node"
                else way_ids if t == "way"
                else [rid - 1] if rels else way_ids
            )
            if t == "relation" and not rels:
                t, ref = "way", rng.choice(way_ids)
            members.append(
                {
                    "ref": ref,
                    "mtype": t,
                    "role": rng.choice(["outer", "", "rôle", "sub"]),
                }
            )
        rels.append({"id": rid, "members": members, "tags": tags()})
    return nodes, ways, rels


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_wire_fuzz_roundtrip_vs_reference(tmp_path, seed):
    """Randomized differential: our XML writer's world, converted
    by osmconvert to its own .o5m, must read back identically (CSV
    with real tag columns) to our .o5m and our .pbf of the same
    world — and everything round-trips through our readers."""
    nodes, ways, rels = _random_world(seed)

    # own-reader round trips
    assert parse_o5m(encode_o5m(nodes, ways, rels)) == (
        nodes, ways, rels,
    )
    assert parse_pbf(
        encode_pbf(nodes, ways, rels, block_objects=64)
    ) == (nodes, ways, rels)
    assert parse_xml(encode_osm_xml(nodes, ways, rels)) == (
        nodes, ways, rels,
    )

    xml_p = tmp_path / "w.osm"
    xml_p.write_text(encode_osm_xml(nodes, ways, rels))
    ref_o5m = tmp_path / "ref.o5m"
    subprocess.run(
        [f"{REFBIN}/osmconvert", str(xml_p), f"-o={ref_o5m}"],
        check=True,
    )
    cols = "--csv=@otype @id @lat @lon amenity name ref:née k4"
    args = ["--out-csv", cols, "--csv-separator=|"]

    def csv_of(p):
        return subprocess.run(
            [f"{REFBIN}/osmconvert", str(p), *args],
            check=True, capture_output=True, text=True,
        ).stdout

    want = csv_of(ref_o5m)
    assert want.strip()

    ours_o5m = tmp_path / "ours.o5m"
    ours_o5m.write_bytes(encode_o5m(nodes, ways, rels))
    assert csv_of(ours_o5m) == want

    ours_pbf = tmp_path / "ours.pbf"
    ours_pbf.write_bytes(
        encode_pbf(nodes, ways, rels, block_objects=64)
    )
    assert csv_of(ours_pbf) == want


def test_diff_changefile_roundtrip(spark, tmp_path):
    """snapshot-to-snapshot replication through the reference:
    diff(old, new) -> our .o5c changefile -> osmconvert applies it
    to our old.o5m -> result must equal our new.o5m, byte-for-byte
    in osmconvert's own CSV view."""
    from pyspark.sql import functions as F

    from osmgraft.operators.merge import diff_changefile

    old_nodes = [
        {"id": i, "lat_i": i * 100, "lon_i": -i * 50,
         "tags": {"name": f"n{i}"}}
        for i in range(1, 31)
    ]
    new_nodes = [
        dict(n, tags=dict(n["tags"])) for n in old_nodes
        if n["id"] % 7 != 0          # delete every 7th
    ]
    for n in new_nodes:
        if n["id"] % 5 == 0:         # modify every 5th survivor
            n["tags"]["name"] = f"renamed{n['id']}"
            n["lat_i"] += 11
    new_nodes.append(
        {"id": 99, "lat_i": 1, "lon_i": 2, "tags": {"name": "new"}}
    )
    new_nodes.sort(key=lambda n: n["id"])

    schema = (
        "id long, lat_i long, lon_i long, tags map<string,string>"
    )
    odf = spark.createDataFrame(
        [(n["id"], n["lat_i"], n["lon_i"], n["tags"])
         for n in old_nodes], schema
    )
    ndf = spark.createDataFrame(
        [(n["id"], n["lat_i"], n["lon_i"], n["tags"])
         for n in new_nodes], schema
    )
    canon_tags = F.array_sort(F.map_entries("tags")).cast("string")
    chg = diff_changefile(
        odf.withColumn("_t", canon_tags),
        ndf.withColumn("_t", canon_tags),
        ["id"],
        ["lat_i", "lon_i", "tags"],
        compare_cols=["lat_i", "lon_i", "_t"],
    )
    rows = sorted(
        (
            {"id": r.id, "lat_i": r.lat_i, "lon_i": r.lon_i,
             "tags": None if r.deleted else dict(r.tags)}
            for r in chg.collect()
        ),
        key=lambda n: n["id"],
    )
    assert any(r["tags"] is None for r in rows)

    old_p = tmp_path / "old.o5m"
    old_p.write_bytes(encode_o5m(old_nodes, [], []))
    new_p = tmp_path / "new.o5m"
    new_p.write_bytes(encode_o5m(new_nodes, [], []))
    chg_p = tmp_path / "chg.o5c"
    chg_p.write_bytes(encode_o5m(rows, [], [], change=True))

    args = ["--out-csv", "--csv=@id @lat @lon name",
            "--csv-separator=|"]
    applied = subprocess.run(
        [f"{REFBIN}/osmconvert", str(old_p), str(chg_p), *args],
        check=True, capture_output=True, text=True,
    ).stdout
    want = subprocess.run(
        [f"{REFBIN}/osmconvert", str(new_p), *args],
        check=True, capture_output=True, text=True,
    ).stdout
    assert applied == want


def test_single_file_sink_encodes_on_executors(spark, tmp_path):
    """Round-3: write_wire_single encodes body chunks in >1 task
    per format (the round-2 serial-driver bottleneck is gone) and
    the result is equivalent to the serial driver encode — byte-
    identical for XML, reference-binary-view-identical for o5m/pbf
    (chunk boundaries reset delta/string state, so bytes may
    differ while the object stream is identical)."""
    from osmgraft.sources.auto import read_osm_auto
    from osmgraft.wire import encode_osm_xml
    from osmgraft.wire.spark import _iter_rows, write_wire_single

    osm = tmp_path / "w.osm"
    osm.write_text(_world_xml())
    nodes, ways, rels = read_osm_auto(spark, str(osm))

    for fmt in ("o5m", "pbf", "osm"):
        path = tmp_path / f"par.{fmt}"
        write_wire_single(
            nodes, ways, rels, str(path), fmt=fmt, parts=4
        )
        assert path.exists()
    # >1 encode task: with parts=4 and 300 nodes, the node frame
    # range-partitions into 4 non-empty chunks, each leading with a
    # 0xff reset — count the mid-stream chunk boundaries
    data = (tmp_path / "par.o5m").read_bytes()
    resets_mid = data[7:-1].count(b"\xff\x10") + data[7:-1].count(
        b"\xff\x11"
    ) + data[7:-1].count(b"\xff\x12")
    assert resets_mid >= 3, "expected >1 encoded chunk per kind"

    # equivalence with the serial driver encode
    serial_xml = encode_osm_xml(
        _iter_rows(nodes), _iter_rows(ways), _iter_rows(rels)
    ).encode("utf-8")
    assert (tmp_path / "par.osm").read_bytes() == serial_xml

    for fmt in ("o5m", "pbf"):
        got = _ref_csv(tmp_path / f"par.{fmt}")
        want = _ref_csv(osm)
        assert got == want, fmt
