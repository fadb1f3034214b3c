"""THE address-stack differential: build the geobase with Spark
rows, write a .ogb with wire/ogb.py, and let the REAL osmposition
binary answer free-text queries over it — results must match
address.address_geocode on the same addresses DataFrame, query for
query, rank for rank, including the parse heuristics, prefix
fallback, the Berlin wildcard hack, housenumber refinement (with
the unsigned-wrap below-run quirk), the 6-bit weight ranking, and
the 25-result cutoff."""

from __future__ import annotations

import os
import re
import subprocess

import pytest
from pyspark.sql import functions as F

from osmgraft.address import address_geocode
from osmgraft.wire.ogb import encode_ogb

REFBIN = "/root/repo/.refbin"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REFBIN}/osmposition"),
    reason="reference binaries not built",
)

SENTINEL = "!!!PING"


def _addresses():
    """city-major ordered datasets; (city, street) runs carry the
    refinement-exercising housenumbers [2, 4, 4a, 4 a, 8]."""
    rows = []
    cities = [f"City{i:02d}" for i in range(30)] + [
        "Berlin-Mitte",
        "Berlin-Pankow",
    ]
    hn = [("2", 2), ("4", 4), ("4a", 4), ("4 a", 4), ("8", 8)]
    i = 0
    for city in sorted(cities):
        for street in [f"Street{s}" for s in range(3)]:
            for hs, hv in hn:
                rows.append(
                    {
                        "x": 100000 + i * 137,
                        "y": -50000 + i * 91,
                        "region": "Testland",
                        "subregion": "SubA" if i % 3 == 0 else "",
                        "city": city,
                        "street": street,
                        "housenumber": hs,
                        "housenumeric": hv,
                        "weight": (i * 37) % 200,
                    }
                )
                i += 1
    return rows


QUERIES = [
    "City03",
    "City0",             # prefix fallback -> 10 cities
    "Cit*",              # explicit wildcard... 30 matches -> >25
    "City",              # prefix, 30 matches -> too many results
    "Street2, City03",
    "Street2 4a, City03",
    "Street2 4 a, City03",
    "Street2 5, City03",
    "Street2 7, City03",
    "Street2 1, City03",   # below-run unsigned-wrap quirk
    "Street2, 6, City03",  # tie -> floor
    "Street1, Berlin",     # subdivided-city hack -> Berlin-*
    "Street2 17 // floor 3, 12345 City03",
    "Nowhere, City03",
    "NoCityZZ",            # sorts after all names -> clamps to last
    "Zzz",                 # same clamp quirk, city-only
    "Street0, Zz*",        # clamp quirk through a wildcard
    "Street0, City1",      # prefix city x street, 10 runs ranked
]


def _run_osmposition(ogb_path: str) -> list[list[tuple]]:
    lines = []
    for qline in QUERIES:
        lines.append(qline)
        lines.append(SENTINEL)
    proc = subprocess.run(
        [f"{REFBIN}/osmposition", ogb_path],
        input="\n".join(lines) + "\n",
        capture_output=True,
        text=True,
    )
    # osmposition exits 1 at EOF; a load failure prints to stderr
    assert "ready for input" in proc.stdout, proc.stderr
    out = proc.stdout
    blocks: list[list[tuple]] = [[]]
    for ln in out.splitlines():
        if f"No result for city {SENTINEL}" in ln:
            blocks.append([])
            continue
        m = re.match(
            r"^\s+(\d+)\s\s(.*) \[([0-9.-]+),([0-9.-]+),(\d+),"
            r"([^\]]*)\]$",
            ln,
        )
        if not m:
            continue
        rank = int(m.group(1))
        name = m.group(2)
        x = round(float(m.group(3)) * 1e7)
        y = round(float(m.group(4)) * 1e7)
        w = int(m.group(5))
        blocks[-1].append((rank, name, x, y, w))
    assert len(blocks) == len(QUERIES) + 1
    return blocks[: len(QUERIES)]


def _fmt_name(street, hn, city) -> str:
    out = street or ""
    if hn:
        out += " " + hn
    if street:
        out += ", "
    return out + city


def test_osmposition_answers_match_spark_operator(spark, tmp_path):
    rows = _addresses()
    ogb = tmp_path / "adr.ogb"
    ogb.write_bytes(encode_ogb(rows))

    want_blocks = _run_osmposition(str(ogb))

    adf = spark.createDataFrame(
        [
            (
                i + 1,
                r["city"],
                r["street"],
                r["housenumber"],
                r["housenumeric"],
                r["x"],
                r["y"],
                r["weight"],
            )
            for i, r in enumerate(rows)
        ],
        "addr_idx long, city string, street string, "
        "housenumber string, housenumeric long, x long, y long, "
        "weight long",
    )
    qdf = spark.createDataFrame(
        list(enumerate(QUERIES)), "query_id long, addr string"
    )
    got = address_geocode(adf, qdf)
    by_idx = {i + 1: r for i, r in enumerate(rows)}
    got_blocks: list[list[tuple]] = [[] for _ in QUERIES]
    for r in got.orderBy("query_id", "rank").collect():
        src = by_idx[r.addr_idx]
        got_blocks[r.query_id].append(
            (
                r.rank,
                _fmt_name(
                    src["street"], src["housenumber"], src["city"]
                ),
                r.x,
                r.y,
                src["weight"] & 63,
            )
        )

    for qi, (qtext, want) in enumerate(zip(QUERIES, want_blocks)):
        assert got_blocks[qi] == want, (
            f"query {qi} {qtext!r}:\n got {got_blocks[qi]}\n "
            f"want {want}"
        )
    # sanity: the interesting queries actually produced results
    assert want_blocks[0] and want_blocks[1] and want_blocks[4]
    assert want_blocks[11], "Berlin wildcard hack must match"
    assert not want_blocks[3], "30 matches -> too many -> empty"
    assert want_blocks[14] and want_blocks[15], (
        "clamp-to-last quirk must reproduce"
    )


def test_osmposition_fuzz_queries(spark, tmp_path):
    """Seeded random free-text queries (exact names, prefixes,
    wildcards, wrong case, housenumbers in both syntaxes, garbage)
    against the real binary — every block must match the Spark
    operator exactly."""
    import random

    rng = random.Random(42)
    rows = _addresses()
    ogb = tmp_path / "adr.ogb"
    ogb.write_bytes(encode_ogb(rows))

    cities = sorted({r["city"] for r in rows})
    streets = sorted({r["street"] for r in rows})
    queries = []
    for _ in range(80):
        kind = rng.randint(0, 6)
        city = rng.choice(
            [
                rng.choice(cities),
                rng.choice(cities)[: rng.randint(2, 6)],
                rng.choice(cities) + "*",
                rng.choice(cities).lower(),
                "Berlin",
                "Xyzzy",
            ]
        )
        street = rng.choice(
            [rng.choice(streets), "Street9", "Str*", "street2"]
        )
        hn = str(rng.randint(0, 12))
        if kind == 0:
            q = city
        elif kind == 1:
            q = f"{street}, {city}"
        elif kind == 2:
            q = f"{street} {hn}, {city}"
        elif kind == 3:
            q = f"{street}, {hn}, {city}"
        elif kind == 4:
            q = f"{street} {hn} // apt {rng.randint(1,9)}, {city}"
        elif kind == 5:
            q = f"  {rng.randint(10000, 99999)} {city}"
        else:
            q = f"{street} {hn}a, {city}"
        # avoid the interactive digit-selection branch
        if q.strip().isdigit() and len(q.strip()) <= 2:
            q = "City00"
        queries.append(q)

    # swap the module-level QUERIES for this run
    global QUERIES
    saved = QUERIES
    QUERIES = queries
    try:
        want_blocks = _run_osmposition(str(ogb))
    finally:
        QUERIES = saved

    adf = spark.createDataFrame(
        [
            (
                i + 1,
                r["city"],
                r["street"],
                r["housenumber"],
                r["housenumeric"],
                r["x"],
                r["y"],
                r["weight"],
            )
            for i, r in enumerate(rows)
        ],
        "addr_idx long, city string, street string, "
        "housenumber string, housenumeric long, x long, y long, "
        "weight long",
    )
    qdf = spark.createDataFrame(
        list(enumerate(queries)), "query_id long, addr string"
    )
    got = address_geocode(adf, qdf)
    by_idx = {i + 1: r for i, r in enumerate(rows)}
    got_blocks = [[] for _ in queries]
    for r in got.orderBy("query_id", "rank").collect():
        src = by_idx[r.addr_idx]
        got_blocks[r.query_id].append(
            (
                r.rank,
                _fmt_name(
                    src["street"], src["housenumber"], src["city"]
                ),
                r.x,
                r.y,
                src["weight"] & 63,
            )
        )
    mismatches = [
        (qi, queries[qi], got_blocks[qi], want)
        for qi, want in enumerate(want_blocks)
        if got_blocks[qi] != want
    ]
    assert not mismatches, mismatches[:3]
    assert sum(1 for b in want_blocks if b) > 20


def test_write_ogb_dataframe_sink_matches_list_encoder(
    spark, tmp_path
):
    """the DataFrame .ogb sink must produce byte-identical output
    to the list encoder on the same rows, and the binary must load
    it."""
    from osmgraft.wire.ogb import write_ogb

    rows = _addresses()
    want = encode_ogb(rows)
    adf = spark.createDataFrame(
        [
            (
                i + 1, r["region"], r["subregion"], r["city"],
                r["street"], r["housenumber"], r["housenumeric"],
                r["x"], r["y"], r["weight"],
            )
            for i, r in enumerate(rows)
        ],
        "addr_idx long, region string, subregion string, "
        "city string, street string, housenumber string, "
        "housenumeric long, x long, y long, weight long",
    )
    p = tmp_path / "df.ogb"
    n = write_ogb(adf, str(p))
    assert n == len(rows)
    assert p.read_bytes() == want

    proc = subprocess.run(
        [f"{REFBIN}/osmposition", str(p)],
        input="City03\n",
        capture_output=True,
        text=True,
    )
    assert "City03" in proc.stdout


def test_write_ogb_multipartition_byte_exact(spark, tmp_path):
    """Round-4 executor-side dictionary build: a 600-address frame
    across 8 range partitions (>1 encode task per section) must
    still be byte-identical to the serial list encoder, and load in
    the binary."""
    import random

    from osmgraft.wire.ogb import write_ogb

    rng = random.Random(7)
    rows = []
    for i in range(600):
        rows.append(
            {
                "region": f"Reg{rng.randrange(3)}",
                "subregion": "",
                "city": f"City{rng.randrange(40):02d}",
                "street": f"Street {rng.randrange(120):03d}",
                "housenumber": str(rng.randrange(1, 99)),
                "housenumeric": rng.randrange(1, 99),
                "x": rng.randrange(-1800000000, 1800000000),
                "y": rng.randrange(-850000000, 850000000),
                "weight": rng.randrange(0, 64),
            }
        )
    # final order: city-major, street, housenumeric (the dat_addr
    # contract) — same ordering for both encoders
    rows.sort(
        key=lambda r: (r["city"], r["street"], r["housenumeric"])
    )
    want = encode_ogb(rows)
    adf = spark.createDataFrame(
        [
            (
                i + 1, r["region"], r["subregion"], r["city"],
                r["street"], r["housenumber"], r["housenumeric"],
                r["x"], r["y"], r["weight"],
            )
            for i, r in enumerate(rows)
        ],
        "addr_idx long, region string, subregion string, "
        "city string, street string, housenumber string, "
        "housenumeric long, x long, y long, weight long",
    )
    p = tmp_path / "big.ogb"
    n = write_ogb(adf, str(p), parts=8)
    assert n == len(rows)
    assert p.read_bytes() == want

    proc = subprocess.run(
        [f"{REFBIN}/osmposition", str(p)],
        input="City07\n",
        capture_output=True,
        text=True,
    )
    assert "City07" in proc.stdout
