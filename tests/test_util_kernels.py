"""Round-trip / parity tests for the small kernel utilities that
the larger operators build on: cell encode/decode/pack, the
reference coco key, fixed-point degrees, the .poly fixture writer,
tile rollup + range-ordered tile writes, and media feature
projection."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from osmgraft.geo.cells import (
    DEFAULT_SHIFT,
    LAT_OFFSET,
    LON_OFFSET,
    cell_decode,
    cell_encode,
    cell_pack,
    coco_key,
)
from osmgraft.geo.fixedpoint import fix_to_deg
from osmgraft.geo.polyfile import parse_multipoly, write_multipoly


def test_cell_encode_decode_pack_roundtrip():
    rng = np.random.default_rng(7)
    lat = rng.integers(-900000000, 900000000, 5000)
    lon = rng.integers(-1800000000, 1800000000, 5000)
    cells = cell_encode(lat, lon)
    lat_b, lon_b = cell_decode(cells)
    assert (cell_pack(lat_b, lon_b) == cells).all()
    # bands really are the shifted offsets
    assert (lat_b == (lat + LAT_OFFSET) >> DEFAULT_SHIFT).all()
    assert (lon_b == (lon + LON_OFFSET) >> DEFAULT_SHIFT).all()


def test_coco_key_matches_reference_formula():
    """bit-exact data__coco_calc (osmgeobase.c:2547-2560):
    yx = ((900000000+lat) & ~0x3fff) << 32) + (1800000000+lon)."""
    rng = np.random.default_rng(8)
    lat = rng.integers(-900000000, 900000000, 2000)
    lon = rng.integers(-1800000000, 1800000000, 2000)
    got = coco_key(lat, lon)
    for la, lo, k in zip(lat[:200], lon[:200], got[:200]):
        want = (
            ((900000000 + int(la)) & ~0x3FFF) << 32
        ) + (1800000000 + int(lo))
        assert int(k) == want
    # prefix-sortable: same 16384-unit band sorts by lon, the next
    # band sorts strictly above regardless of lon
    band0 = 16384 * 54932 - 900000000  # start of a band
    a = coco_key([band0], [5000])[0]
    b = coco_key([band0 + 1000], [6000])[0]  # same band
    c = coco_key([band0 + 16384], [-1800000000])[0]  # next band
    assert a < b < c


def test_fix_to_deg_roundtrip():
    from osmgraft.geo.fixedpoint import format_fix7

    for v in (0, 1, -1, 123456789, -900000000, 1799999999):
        assert abs(fix_to_deg(v) - v / 1e7) < 1e-12
        assert format_fix7(v) == f"{v / 1e7:.7f}"


def test_write_multipoly_roundtrip_through_parser():
    spec = [
        ("alpha", 2, [([1.0, 5.0, 5.0, 1.0], [1.0, 1.0, 4.0, 4.0])]),
        (
            "bravo",
            4,
            [
                ([10.0, 20.0, 20.0, 10.0], [0.0, 0.0, 9.0, 9.0]),
                ([12.0, 15.0, 15.0, 12.0], [2.0, 2.0, 5.0, 5.0]),
            ],
        ),
    ]
    text = write_multipoly(spec)
    ps = parse_multipoly(text)
    assert ps.names == ["alpha", "bravo"]
    assert list(ps.admin_levels) == [2, 4]
    # the hole ring contributes edges to bravo's even-odd set
    assert len(ps.polys[1].x1) > len(ps.polys[0].x1)


def test_tile_rollup_and_range_ordered_writes(spark, tmp_path):
    from osmgraft.operators.spatial import with_cell
    from osmgraft.operators.tiles import tile_rollup, write_tiles

    pts = with_cell(
        spark.range(0, 2000).select(
            F.col("id").alias("doc_id"),
            (470000000 + (F.col("id") * 2246822519) % 40000000)
            .cast("long").alias("lat_i"),
            (100000000 + (F.col("id") * 2654435761) % 40000000)
            .cast("long").alias("lon_i"),
        )
    )
    roll = tile_rollup(pts)
    r = {x.cell: (x.n_docs, x.min_doc, x.max_doc) for x in roll.collect()}
    assert sum(n for n, _mi, _ma in r.values()) == 2000

    out = str(tmp_path / "tiles")
    write_tiles(roll, out, n_files=4)
    back = spark.read.parquet(out)
    assert back.count() == len(r)
    # range write: per-file cell ranges must be disjoint (spatial
    # locality — file-level pruning works)
    import pyarrow.parquet as pq
    import glob as g

    ranges = []
    for f in sorted(g.glob(out + "/part-*")):
        t = pq.read_table(f, columns=["cell"])
        if t.num_rows:
            c = t.column("cell").to_pylist()
            ranges.append((min(c), max(c)))
    ranges.sort()
    for (a1, a2), (b1, b2) in zip(ranges, ranges[1:]):
        assert a2 < b1


def test_media_features_projection(spark):
    from osmgraft.operators.multimodal import media_features

    meta = spark.createDataFrame(
        [
            (1, "image", 1920, 1080, None, None, 100),
            (2, "audio", None, None, 44100, 88200, 200),
        ],
        "doc_id long, kind string, width long, height long, "
        "sample_rate long, n_samples long, n_bytes long",
    )
    out = {r.doc_id: r for r in media_features(meta).collect()}
    assert out[1].aspect_e4 == 1920 * 10000 / 1080
    assert out[2].duration_s == 2.0
