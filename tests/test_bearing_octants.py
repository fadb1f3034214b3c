"""Bearing octants (linecover.bearing_octants): the integer
sign/diagonal rule must agree with the atan2 definition of sector
[k*45, (k+1)*45) clockwise from north, including exact boundaries."""

from __future__ import annotations

import datetime as dt
import math

from osmgraft.operators.linecover import bearing_octants


def _atan2_octant(dx, dy):
    if dx == 0 and dy == 0:
        return -1
    ang = math.degrees(math.atan2(dx, dy)) % 360.0  # clockwise from N
    return int(ang // 45) % 8


def test_octant_rule_matches_atan2():
    # sweep every direction on a coarse integer circle, plus the
    # exact axis/diagonal boundary vectors at several magnitudes
    dirs = set()
    for a in range(0, 3600):
        r = 1000
        dirs.add(
            (
                round(r * math.sin(math.radians(a / 10))),
                round(r * math.cos(math.radians(a / 10))),
            )
        )
    for m in (1, 7, 1000):
        for sx in (-1, 0, 1):
            for sy in (-1, 0, 1):
                dirs.add((sx * m, sy * m))

    # pure-python replay of the operator's CASE cascade
    def rule(dx, dy):
        if dx == 0 and dy == 0:
            return -1
        if dx >= 0 and dy > 0 and dx < dy:
            return 0
        if dx > 0 and dy > 0 and dx >= dy:
            return 1
        if dx > 0 and dy <= 0 and -dy < dx:
            return 2
        if dx > 0 and dy < 0 and -dy >= dx:
            return 3
        if dx <= 0 and dy < 0 and -dx < -dy:
            return 4
        if dx < 0 and dy < 0 and -dx >= -dy:
            return 5
        if dx < 0 and dy >= 0 and dy < -dx:
            return 6
        return 7

    for dx, dy in dirs:
        assert rule(dx, dy) == _atan2_octant(dx, dy), (dx, dy)


def test_operator_output(spark):
    # two-step traces in known directions
    rows = [
        (1, 0, 100, 100),
        (1, 1, 200, 100),   # due north  -> octant 0
        (1, 2, 200, 300),   # due east   -> octant 2
        (2, 0, 0, 0),
        (2, 1, -50, -50),   # southwest exact diagonal -> octant 5
        (3, 0, 10, 10),
        (3, 1, 10, 10),     # stationary -> -1
    ]
    df = spark.createDataFrame(
        rows, "trace_id long, step long, lat_i long, lon_i long"
    )
    got = {
        (r["trace_id"], r["step"]): (r["octant"], r["d2"])
        for r in bearing_octants(df).collect()
    }
    assert got[(1, 0)] == (0, 100 * 100)
    assert got[(1, 1)] == (2, 200 * 200)
    assert got[(2, 0)] == (5, 2 * 50 * 50)
    assert got[(3, 0)] == (-1, 0)
